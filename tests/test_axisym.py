"""Axisymmetric (x, r) formulation tests.

Reference capability: Nek5000 `ifaxis` meridional formulation used by the
tpjet example (SURVEY.md §2 "Axisymmetric", examples/tpjet/tpjet.par).
Validation: Hagen-Poiseuille pipe flow u(r) = G/(4 nu)(R^2 - r^2) is an exact
polynomial steady state of the r-weighted discrete system, so the stepper
must hold it to solver tolerance; the discrete adjoint identity must hold in
the (axis-degenerate) B-weighted inner product.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nekstab_tpu.config import NSConfig
from nekstab_tpu.mesh import box_mesh
from nekstab_tpu.ops import dsavg, glsc3, make_context
from nekstab_tpu.solver import (initial_state, make_adjoint_propagator,
                                make_advance, make_linear_propagator,
                                zero_case_fields)
from nekstab_tpu.solver.stepper import CaseFields


def pipe_mesh(n=6, nx=3, nr=2, L=2.0, R=1.0):
    def bc(x, y, nrm):
        return "A" if y < 1e-8 else "W"

    return box_mesh(n, nx, nr, 0.0, L, 0.0, R, bc_fn=bc, periodic_x=True)


@pytest.fixture(scope="module")
def pipe():
    m = pipe_mesh()
    assert m.axisym
    ctx = make_context(m)
    cfg = NSConfig(re=10.0, dt=2e-3, vtol=1e-12, ptol=1e-12,
                   vmaxit=400, pmaxit=400)
    return m, ctx, cfg


def test_axis_masks(pipe):
    m, ctx, cfg = pipe
    on_axis = np.asarray(ctx.ycoord) < 1e-12
    # radial velocity masked on the axis, axial velocity free
    assert np.all(np.asarray(ctx.mask_vel[1])[on_axis] == 0.0)
    assert np.all(np.asarray(ctx.mask_vel[0])[on_axis] == 1.0)
    # r-weighted mass vanishes on the axis, positive elsewhere
    assert np.all(np.asarray(ctx.bm)[on_axis] == 0.0)
    assert np.all(np.asarray(ctx.bm)[~on_axis] > 0.0)


def test_cylindrical_volume(pipe):
    """sum(bm) = cylinder volume / (2 pi) = L R^2 / 2."""
    m, ctx, cfg = pipe
    vol = float(jnp.sum(ctx.bm))
    assert vol == pytest.approx(2.0 * 1.0 ** 2 / 2.0, rel=1e-12)


def test_hagen_poiseuille_steady(pipe):
    """Exact HP flow is a discrete steady state: u = 1 - r^2 with body force
    G = 4 nu must persist under time stepping to solver tolerance."""
    m, ctx, cfg = pipe
    nu = cfg.nu
    r = ctx.ycoord
    u_ex = jnp.stack([1.0 - r ** 2, jnp.zeros_like(r)])
    u_ex = ctx.mask_vel * u_ex        # wall value is 0 = exact there
    f = jnp.stack([jnp.full_like(r, 4.0 * nu), jnp.zeros_like(r)])
    case = CaseFields(u_bc=jnp.zeros_like(u_ex), f=f,
                      sponge=jnp.zeros_like(ctx.bm),
                      sponge_ref=jnp.zeros_like(u_ex))
    adv = jax.jit(
        __import__("nekstab_tpu.solver.stepper", fromlist=["make_advance"])
        .make_advance(ctx, cfg, m.has_outflow, 50))
    st, _ = adv(case, initial_state(ctx, u_ex))
    err = np.max(np.abs(np.asarray(st.u - u_ex)))
    assert err < 1e-9, err


def test_hagen_poiseuille_attracts(pipe):
    """From a perturbed IC the flow must relax toward HP (stable flow)."""
    m, ctx, cfg = pipe
    r = ctx.ycoord
    u_ex = ctx.mask_vel * jnp.stack([1.0 - r ** 2, jnp.zeros_like(r)])
    f = jnp.stack([jnp.full_like(r, 4.0 * cfg.nu), jnp.zeros_like(r)])
    case = CaseFields(u_bc=jnp.zeros_like(u_ex), f=f,
                      sponge=jnp.zeros_like(ctx.bm),
                      sponge_ref=jnp.zeros_like(u_ex))
    rng = np.random.default_rng(4)
    du = 0.05 * ctx.mask_vel * dsavg(
        ctx, jnp.asarray(rng.normal(size=u_ex.shape)))
    from nekstab_tpu.solver.stepper import make_advance as mka
    adv = jax.jit(mka(ctx, cfg, m.has_outflow, 200))
    st, _ = adv(case, initial_state(ctx, u_ex + du))
    e0 = float(glsc3(ctx, du, ctx.bm, du))
    d = st.u - u_ex
    e1 = float(glsc3(ctx, d, ctx.bm, d))
    assert e1 < 0.2 * e0, (e0, e1)


def test_adjoint_identity_axisym(pipe):
    """<L u, v> = <u, L* v> in the strictly positive adjoint weight B~ (the
    r-weighted mass with its axis zeros floored, ops/context.py): exact by
    construction, and B~-similarity makes the adjoint spectrum exactly match
    the direct spectrum (the reference's direct/adjoint gap is ~2e-5)."""
    m, ctx, cfg = pipe
    assert ctx.bm_adj is not None

    def mk(seed):
        rng = np.random.default_rng(seed)
        return ctx.mask_vel * dsavg(
            ctx, jnp.asarray(rng.normal(size=(2,) + ctx.bm.shape)))

    base, v, w = mk(1) * 0.5, mk(2), mk(3)
    sponge = jnp.zeros_like(ctx.bm)
    prop = make_linear_propagator(ctx, cfg, m.has_outflow, 3)
    adj = make_adjoint_propagator(ctx, cfg, m.has_outflow, 3)
    lv, _ = prop(base, sponge, v)
    lw, _ = adj(base, sponge, w)
    a = float(glsc3(ctx, lv, ctx.bm_adj, w))
    b = float(glsc3(ctx, v, ctx.bm_adj, lw))
    assert a == pytest.approx(b, rel=1e-9), (a, b)


def test_hp_dealiased(pipe):
    """HP steady state also holds with over-integration on (fine radius row)."""
    m, _, cfg = pipe
    ctxd = make_context(m, dealias=True)
    r = ctxd.ycoord
    u_ex = ctxd.mask_vel * jnp.stack([1.0 - r ** 2, jnp.zeros_like(r)])
    f = jnp.stack([jnp.full_like(r, 4.0 * cfg.nu), jnp.zeros_like(r)])
    case = CaseFields(u_bc=jnp.zeros_like(u_ex), f=f,
                      sponge=jnp.zeros_like(ctxd.bm),
                      sponge_ref=jnp.zeros_like(u_ex))
    from nekstab_tpu.solver.stepper import make_advance as mka
    adv = jax.jit(mka(ctxd, cfg, m.has_outflow, 20))
    st, _ = adv(case, initial_state(ctxd, u_ex))
    err = np.max(np.abs(np.asarray(st.u - u_ex)))
    assert err < 1e-9, err
