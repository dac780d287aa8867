"""Chunked propagator composition (driver.linear_propagator(chunk)) must be
bit-equivalent in exact arithmetic to the monolithic scan: same step ops in
the same order, only split across executables. Checks forward, block, and
the reverse-composed adjoint (including the adjoint identity)."""

import jax.numpy as jnp
import numpy as np
import pytest

from nekstab_tpu.models.cylinder import cylinder_system, freestream_ic
from nekstab_tpu.utils import add_noise


@pytest.fixture(scope="module")
def sys_small():
    s = cylinder_system(n=5, dt=2e-2, re=50.0, xmin=-6.0, xmax=14.0,
                        ymin=-6.0, ymax=6.0, nq=4, n_ring=2, nx_left=2,
                        nx_right=4, ny_side=2, vtol=1e-12, ptol=1e-11)
    return s


NSTEPS = 7


def _props(s, chunk):
    s.chunk_steps = chunk
    s._cache.clear()
    return s.linear_propagator(NSTEPS), s.adjoint_propagator(NSTEPS)


def test_chunked_forward_matches_monolithic(sys_small):
    s = sys_small
    base = freestream_ic(s)
    v = add_noise(s.ctx, seed=3)
    prop_m, _ = _props(s, None)
    um, _ = prop_m(base, s.sponge_fun, v)
    prop_c, _ = _props(s, 3)
    uc, _ = prop_c(base, s.sponge_fun, v)
    assert np.allclose(np.asarray(um), np.asarray(uc), rtol=1e-12, atol=1e-13)


def test_chunked_block_matches_sequential(sys_small):
    s = sys_small
    base = freestream_ic(s)
    s.chunk_steps = 3
    s._cache.clear()
    V = jnp.stack([add_noise(s.ctx, seed=i) for i in range(3)])
    W = s.linear_propagator_block(NSTEPS)(base, s.sponge_fun, V)
    prop = s.linear_propagator(NSTEPS)
    for i in range(3):
        wi, _ = prop(base, s.sponge_fun, V[i])
        assert np.allclose(np.asarray(W[i]), np.asarray(wi),
                           rtol=1e-12, atol=1e-13)


def test_chunked_adjoint_matches_monolithic(sys_small):
    s = sys_small
    base = freestream_ic(s)
    v = add_noise(s.ctx, seed=5)
    _, adj_m = _props(s, None)
    am, _ = adj_m(base, s.sponge_fun, v)
    _, adj_c = _props(s, 3)
    ac, _ = adj_c(base, s.sponge_fun, v)
    assert np.allclose(np.asarray(am), np.asarray(ac), rtol=1e-11, atol=1e-12)


def test_chunked_nonlinear_advance_matches(sys_small):
    s = sys_small
    base = freestream_ic(s)
    from nekstab_tpu.solver import initial_state
    s.chunk_steps = None
    s._cache.clear()
    stm, em = s.nonlinear_advance(NSTEPS)(s.case, initial_state(s.ctx, base))
    s.chunk_steps = 3
    s._cache.clear()
    stc, ec = s.nonlinear_advance(NSTEPS)(s.case, initial_state(s.ctx, base))
    assert np.allclose(np.asarray(stm.u), np.asarray(stc.u),
                       rtol=1e-12, atol=1e-13)
    assert np.allclose(np.asarray(em), np.asarray(ec), rtol=1e-12)


def test_chunked_collect_matches(sys_small):
    """collect=True through chunks: energies AND trajectory identical."""
    s = sys_small
    base = freestream_ic(s)
    from nekstab_tpu.solver import initial_state
    s.chunk_steps = None
    s._cache.clear()
    stm, (em, tm) = s.nonlinear_advance(NSTEPS, collect=True)(
        s.case, initial_state(s.ctx, base))
    s.chunk_steps = 3
    s._cache.clear()
    stc, (ec, tc) = s.nonlinear_advance(NSTEPS, collect=True)(
        s.case, initial_state(s.ctx, base))
    assert tm.shape == tc.shape == (NSTEPS,) + base.shape
    assert np.allclose(np.asarray(tm), np.asarray(tc), rtol=1e-12,
                       atol=1e-13)
    assert np.allclose(np.asarray(em), np.asarray(ec), rtol=1e-12)


def test_chunked_floquet_orbit_matches(sys_small):
    """Orbit-replay (Floquet) base through chunks == monolithic, for both
    the raw orbit and the Fourier-compressed representation."""
    s = sys_small
    base = freestream_ic(s)
    from nekstab_tpu.solver import initial_state
    from nekstab_tpu.solver.orbit import compress_orbit
    s.chunk_steps = None
    s._cache.clear()
    _, (_, orbit) = s.nonlinear_advance(NSTEPS, collect=True)(
        s.case, initial_state(s.ctx, base))
    fo = compress_orbit(orbit, energy=0.9999)
    v = add_noise(s.ctx, seed=4)
    wm_orbit, _ = s.linear_propagator(NSTEPS)(orbit, s.sponge_fun, v)
    wm_four, _ = s.linear_propagator(NSTEPS)(fo, s.sponge_fun, v)
    s.chunk_steps = 3
    s._cache.clear()
    wc_orbit, _ = s.linear_propagator(NSTEPS)(orbit, s.sponge_fun, v)
    wc_four, _ = s.linear_propagator(NSTEPS)(fo, s.sponge_fun, v)
    assert np.allclose(np.asarray(wm_orbit), np.asarray(wc_orbit),
                       rtol=1e-12, atol=1e-13)
    assert np.allclose(np.asarray(wm_four), np.asarray(wc_four),
                       rtol=1e-12, atol=1e-13)


def test_chunked_newton_iteration_matches(sys_small):
    """One Newton iteration (residual + jvp-Jacobian GMRES) through the
    chunked path must reproduce the monolithic jitted path."""
    s = sys_small
    base = freestream_ic(s)
    out = {}
    for chunk in (None, 3):
        s.chunk_steps = chunk
        s._cache.clear()
        res = s.newton_base_flow(base, nsteps=NSTEPS, tol=1e-14, k_dim=6,
                                 maxiter=1, logger=lambda *_: None)
        out[chunk] = np.asarray(res.q)
    scale = np.abs(out[None]).max()
    assert np.allclose(out[None], out[3], atol=1e-8 * scale)


def test_chunked_adjoint_identity(sys_small):
    """<L u, v>_B = <u, L+ v>_B through the chunked pair."""
    s = sys_small
    base = freestream_ic(s)
    prop, adj = _props(s, 3)
    u = add_noise(s.ctx, seed=7)
    v = add_noise(s.ctx, seed=8)
    lu, _ = prop(base, s.sponge_fun, u)
    lv, _ = adj(base, s.sponge_fun, v)
    lhs = float(s.dot_full(lu, v))
    rhs = float(s.dot_full(u, lv))
    # the identity holds to the CG solve tolerance (custom_linear_solve
    # transposes by re-solving at ptol/vtol), not machine precision
    assert np.isclose(lhs, rhs, rtol=1e-8)
