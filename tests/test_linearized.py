"""Linearized/adjoint propagator property tests (SURVEY.md §4: operator
adjointness <L u, v>_B = <u, L* v>_B — the reference's direct/adjoint
consistency is ~2e-5 (BASELINE.md); the discrete transpose here must be
exact to solver tolerance)."""

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

NSTEPS = 4


@pytest.fixture(scope="module")
def setup():
    m = box_mesh(5, 2, 2, 0.0, 1.0, 0.0, 1.0, bc_fn=lambda x, y, n: "W")
    ctx = make_context(m)
    cfg = NSConfig(re=100.0, dt=5e-3, vtol=1e-13, ptol=1e-13,
                   vmaxit=400, pmaxit=400)
    return m, ctx, cfg


def _clean(ctx, w):
    """Random field made continuous and Dirichlet-masked."""
    return ctx.mask_vel * dsavg(ctx, w)


def _rand_vel(ctx, seed):
    rng = np.random.default_rng(seed)
    return _clean(ctx, jnp.asarray(rng.normal(size=(2,) + ctx.bm.shape)))


def _ip(ctx, a, b):
    return float(glsc3(ctx, a, ctx.bm, b))


def test_adjoint_identity_steady_base(setup):
    m, ctx, cfg = setup
    base = _rand_vel(ctx, 10) * 0.5
    sponge = jnp.zeros_like(ctx.bm)
    prop = make_linear_propagator(ctx, cfg, m.has_outflow, NSTEPS)
    adj = make_adjoint_propagator(ctx, cfg, m.has_outflow, NSTEPS)
    v = _rand_vel(ctx, 11)
    w = _rand_vel(ctx, 12)
    lv, _ = prop(base, sponge, v)
    lw, _ = adj(base, sponge, w)
    a = _ip(ctx, lv, w)
    b = _ip(ctx, v, lw)
    assert a == pytest.approx(b, rel=1e-10), (a, b)


def test_adjoint_identity_with_sponge(setup):
    m, ctx, cfg = setup
    base = _rand_vel(ctx, 20) * 0.5
    x = ctx.xcoord
    sponge = 1.7 * jnp.clip(x - 0.6, 0.0, None) ** 2
    prop = make_linear_propagator(ctx, cfg, m.has_outflow, NSTEPS)
    adj = make_adjoint_propagator(ctx, cfg, m.has_outflow, NSTEPS)
    v = _rand_vel(ctx, 21)
    w = _rand_vel(ctx, 22)
    a = _ip(ctx, prop(base, sponge, v)[0], w)
    b = _ip(ctx, v, adj(base, sponge, w)[0])
    assert a == pytest.approx(b, rel=1e-10)


def test_adjoint_identity_floquet_orbit(setup):
    m, ctx, cfg = setup
    rng = np.random.default_rng(30)
    orbit = jnp.asarray(rng.normal(size=(NSTEPS, 2) + ctx.bm.shape)) * 0.3
    sponge = jnp.zeros_like(ctx.bm)
    prop = make_linear_propagator(ctx, cfg, m.has_outflow, NSTEPS)
    adj = make_adjoint_propagator(ctx, cfg, m.has_outflow, NSTEPS)
    v = _rand_vel(ctx, 31)
    w = _rand_vel(ctx, 32)
    a = _ip(ctx, prop(orbit, sponge, v)[0], w)
    b = _ip(ctx, v, adj(orbit, sponge, w)[0])
    assert a == pytest.approx(b, rel=1e-10)


def test_direct_adjoint_composition_self_adjoint(setup):
    # transient-growth operator L*L is B-self-adjoint (SURVEY.md §3.4)
    m, ctx, cfg = setup
    base = _rand_vel(ctx, 40) * 0.5
    sponge = jnp.zeros_like(ctx.bm)
    prop = make_linear_propagator(ctx, cfg, m.has_outflow, NSTEPS)
    adj = make_adjoint_propagator(ctx, cfg, m.has_outflow, NSTEPS)

    def ll(v):
        return adj(base, sponge, prop(base, sponge, v)[0])[0]

    v = _rand_vel(ctx, 41)
    w = _rand_vel(ctx, 42)
    a = _ip(ctx, ll(v), w)
    b = _ip(ctx, v, ll(w))
    assert a == pytest.approx(b, rel=1e-9)
    # and positive semi-definite: <L*L v, v> = |L v|^2 >= 0
    assert _ip(ctx, ll(v), v) > 0


def test_linearized_consistency_about_zero(setup):
    # about base=0 the NS propagator is Stokes: Phi(eps v)/eps -> L v
    m, ctx, cfg = setup
    base = jnp.zeros((2,) + ctx.bm.shape)
    sponge = jnp.zeros_like(ctx.bm)
    prop = make_linear_propagator(ctx, cfg, m.has_outflow, NSTEPS)
    advance = make_advance(ctx, cfg, m.has_outflow, NSTEPS)
    case = zero_case_fields(ctx)
    v = _rand_vel(ctx, 50)
    lv, _ = prop(base, sponge, v)
    errs = []
    for eps in (1e-3, 1e-5):
        st, _ = advance(case, initial_state(ctx, eps * v))
        errs.append(float(jnp.max(jnp.abs(st.u / eps - lv))))
    # error should shrink ~ eps (quadratic nonlinearity)
    assert errs[1] < errs[0] * 1e-1
    assert errs[1] < 5e-6


def test_linearized_growth_about_nontrivial_base(setup):
    # finite-difference check of the full Jacobian action about a nonzero
    # steady-in-time *frozen* base: compare L v against
    # (Phi_frozen(q0 + eps v) - Phi_frozen(q0))/eps where Phi_frozen evolves
    # the perturbation with the same frozen-base linearized equations plus
    # the quadratic term; here we verify first-order consistency using the
    # nonlinear stepper about a true equilibrium (u=0 with no forcing is one).
    # Covered by test_linearized_consistency_about_zero; this checks the
    # linear propagator is nontrivial (advection terms wired in).
    m, ctx, cfg = setup
    sponge = jnp.zeros_like(ctx.bm)
    prop = make_linear_propagator(ctx, cfg, m.has_outflow, NSTEPS)
    v = _rand_vel(ctx, 60)
    l0, _ = prop(jnp.zeros_like(v), sponge, v)
    lb, _ = prop(_rand_vel(ctx, 61), sponge, v)
    assert float(jnp.max(jnp.abs(l0 - lb))) > 1e-8
