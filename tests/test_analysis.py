"""Analysis-layer property tests (vortex criteria, budgets, sensitivity)."""

import jax.numpy as jnp
import numpy as np
import pytest

from nekstab_tpu.analysis import (bf_sensitivity, biorthogonalize,
                                  delta_criterion, enstrophy, kinetic_energy,
                                  omega_criterion, q_criterion,
                                  swirling_strength, vorticity, wavemaker,
                                  energy_budget, RunningStats, ZeroCrossing,
                                  drag_lift)
from nekstab_tpu.mesh import box_mesh, surface_weights
from nekstab_tpu.ops import glsc3, make_context


@pytest.fixture(scope="module")
def ctx():
    m = box_mesh(7, 5, 5, 0.0, 2 * np.pi, 0.0, 2 * np.pi,
                 bc_fn=lambda x, y, n: "W")
    return make_context(m)


def _tg(ctx):
    x, y = np.asarray(ctx.xcoord), np.asarray(ctx.ycoord)
    return jnp.asarray(np.stack([-np.cos(x) * np.sin(y),
                                 np.sin(x) * np.cos(y)]))


def test_vorticity_taylor_green(ctx):
    u = _tg(ctx)
    x, y = np.asarray(ctx.xcoord), np.asarray(ctx.ycoord)
    om_exact = 2 * np.cos(x) * np.cos(y)
    assert np.allclose(np.asarray(vorticity(ctx, u)), om_exact, atol=1e-5)


def test_energy_enstrophy(ctx):
    u = _tg(ctx)
    # E = 0.5 * int |u|^2 = 0.5 * (2 pi^2) = pi^2 over [0,2pi]^2
    assert float(kinetic_energy(ctx, u)) == pytest.approx(np.pi ** 2,
                                                          rel=1e-7)
    # omega = 2 cos x cos y -> 0.5 int omega^2 = 0.5*4*pi^2 = 2 pi^2
    assert float(enstrophy(ctx, u)) == pytest.approx(2 * np.pi ** 2,
                                                     rel=1e-7)


def test_vortex_criteria_signs(ctx):
    u = _tg(ctx)
    q = np.asarray(q_criterion(ctx, u))
    # TG vortex cores (centers of cells) have Q > 0
    x, y = np.asarray(ctx.xcoord), np.asarray(ctx.ycoord)
    # TG vorticity extrema (vortex centres) are at (pi, pi) etc.;
    # (pi/2, pi/2) is a pure-strain saddle
    core = (np.abs(x - np.pi) < 0.3) & (np.abs(y - np.pi) < 0.3)
    assert np.all(q[core] > 0)
    om = np.asarray(omega_criterion(ctx, u))
    assert np.all((om >= 0) & (om <= 1))
    sw = np.asarray(swirling_strength(ctx, u))
    assert np.all(sw >= 0)
    assert np.any(np.asarray(delta_criterion(ctx, u)) > 0)


def test_biorthogonalize_normalization(ctx):
    rng = np.random.default_rng(0)
    shp = (2,) + ctx.bm.shape
    d_re, d_im, a_re, a_im = (jnp.asarray(rng.normal(size=shp))
                              for _ in range(4))
    d_re, d_im, a_re, a_im = biorthogonalize(ctx, d_re, d_im, a_re, a_im)
    # direct mode unit norm
    nrm = float(glsc3(ctx, d_re, ctx.bm, d_re)
                + glsc3(ctx, d_im, ctx.bm, d_im))
    assert nrm == pytest.approx(1.0, rel=1e-12)
    # complex <adj, dir> = 1
    re = float(glsc3(ctx, a_re, ctx.bm, d_re)
               + glsc3(ctx, a_im, ctx.bm, d_im))
    im = float(glsc3(ctx, a_re, ctx.bm, d_im)
               - glsc3(ctx, a_im, ctx.bm, d_re))
    assert re == pytest.approx(1.0, rel=1e-12)
    assert im == pytest.approx(0.0, abs=1e-12)


def test_wavemaker_and_bfs_shapes(ctx):
    rng = np.random.default_rng(1)
    shp = (2,) + ctx.bm.shape
    args = [jnp.asarray(rng.normal(size=shp)) for _ in range(4)]
    wm = wavemaker(ctx, *args)
    assert wm.shape == ctx.bm.shape
    assert np.all(np.asarray(wm) >= 0)
    s = bf_sensitivity(ctx, *args)
    assert set(s) == {"transport_re", "transport_im", "production_re",
                      "production_im", "total_re", "total_im"}
    for v in s.values():
        assert v.shape == shp
    assert np.allclose(np.asarray(s["total_re"]),
                       np.asarray(s["transport_re"] + s["production_re"]))


def test_energy_budget_dissipation_negative(ctx):
    rng = np.random.default_rng(2)
    shp = (2,) + ctx.bm.shape
    base = jnp.asarray(rng.normal(size=shp))
    mr = jnp.asarray(rng.normal(size=shp))
    mi = jnp.asarray(rng.normal(size=shp))
    out = energy_budget(ctx, base, mr, mi, nu=0.01)
    assert out["dissipation"][1] < 0
    total = sum(v[1] for k, v in out.items()
                if v[0] is not None)
    assert out["total"][1] == pytest.approx(total)


def test_running_stats(ctx):
    rs = RunningStats()
    rng = np.random.default_rng(3)
    shp = (2,) + ctx.bm.shape
    samples = [jnp.asarray(rng.normal(size=shp)) for _ in range(5)]
    for s in samples:
        rs.update(s)
    mean = sum(np.asarray(s) for s in samples) / 5
    assert np.allclose(np.asarray(rs.mean), mean, atol=1e-12)
    assert np.all(np.asarray(rs.rms) >= 0)


def test_zero_crossing_period():
    zc = ZeroCrossing()
    t = np.linspace(0, 10, 2000)
    for ti in t:
        zc.update(ti, np.sin(2 * np.pi * ti / 2.5))
    assert np.allclose(zc.periods, 2.5, atol=1e-3)


def test_drag_on_quiescent_pressure_field(ctx):
    # pure hydrostatic-like pressure p = x with u = 0 on a unit-ish box:
    # drag = -int p n_x over the boundary = -(volume integral of dp/dx) = -area
    import jax.numpy as jnp
    from nekstab_tpu.mesh import box_mesh
    m = box_mesh(6, 2, 2, 0.0, 1.0, 0.0, 1.0, bc_fn=lambda x, y, n: "W")
    c = make_context(m)
    wn = jnp.asarray(surface_weights(m, ("W",)))
    u = jnp.zeros((2,) + c.bm.shape)
    p = c.xcoord
    fx, fy = drag_lift(c, wn, u, p, nu=0.01)
    assert float(fx) == pytest.approx(-1.0, rel=1e-10)
    assert float(fy) == pytest.approx(0.0, abs=1e-10)
