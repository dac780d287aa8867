"""Over-integration (dealiased advection) tests.

Reference capability: Nek5000's lxd Gauss grid (3/2 rule) used by nekStab for
every advection evaluation (SURVEY.md §2 "Dealiasing", case `SIZE` lxd).
Here: `convect_dealiased` (ops/tensorprod.py) forms the quadratic product on
the fine Gauss grid and projects back in weak form.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nekstab_tpu.config import NSConfig
from nekstab_tpu.mesh import box_mesh
from nekstab_tpu.ops import dsavg, glsc3, make_context
from nekstab_tpu.ops.tensorprod import convect_dealiased
from nekstab_tpu.solver import (initial_state, make_adjoint_propagator,
                                make_advance, make_linear_propagator,
                                zero_case_fields)
from nekstab_tpu.solver.stepper import convect


@pytest.fixture(scope="module")
def ctxs():
    m = box_mesh(5, 3, 2, 0.0, 1.5, 0.0, 1.0, bc_fn=lambda x, y, n: "W")
    return m, make_context(m), make_context(m, dealias=True)


def test_quadrature_exactness(ctxs):
    """For a constant advector on affine elements the integrand has degree
    2p per direction: any Gauss rule with m >= n integrates it exactly, so
    two different over-integration orders must agree to machine precision."""
    m, ctx, _ = ctxs
    ctx_lo = make_context(m, dealias=ctx.n)        # m = n Gauss points
    ctx_hi = make_context(m, dealias=ctx.n + 3)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=(2,) + ctx.bm.shape))
    c = jnp.ones((2,) + ctx.bm.shape) * jnp.asarray(
        [1.3, -0.4])[:, None, None, None]
    lo = convect_dealiased(ctx_lo, c, u)
    hi = convect_dealiased(ctx_hi, c, u)
    assert np.max(np.abs(np.asarray(lo - hi))) < 1e-11


def test_dealiased_converges_to_collocation_smooth():
    """For smooth fields the collocation/over-integration gap is pure
    aliasing error and must vanish spectrally with n."""
    gaps = []
    for n in (5, 9):
        m = box_mesh(n, 3, 2, 0.0, 1.5, 0.0, 1.0, bc_fn=lambda x, y, b: "W")
        ctx = make_context(m)
        ctxd = make_context(m, dealias=True)
        x, y = np.asarray(ctx.xcoord), np.asarray(ctx.ycoord)
        c = jnp.asarray(np.stack([np.sin(np.pi * x) * np.cos(np.pi * y),
                                  -np.cos(np.pi * x) * np.sin(np.pi * y)]))
        u = jnp.asarray(np.stack([np.sin(2 * x + y), np.cos(x - y)]))
        ref = convect(ctx, c, u)
        da = convect_dealiased(ctxd, c, u)
        scale = np.max(np.abs(np.asarray(ref)))
        gaps.append(np.max(np.abs(np.asarray(ref - da))) / scale)
    assert gaps[0] < 5e-2
    assert gaps[1] < 1e-3 * gaps[0] and gaps[1] < 1e-5  # spectral decay


def test_global_weak_identity(ctxs):
    """The dealiased form is the exact fine-grid weak integral: for any test
    function phi (continuous), <phi, B*convect_da(c,u)> equals the fine-grid
    quadrature of phi*(c.grad u) computed independently."""
    m, ctx, ctxd = ctxs
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.normal(size=(2,) + ctx.bm.shape))
    c = jnp.asarray(rng.normal(size=(2,) + ctx.bm.shape))
    phi = jnp.asarray(rng.normal(size=ctx.bm.shape))
    da = convect_dealiased(ctxd, c, u)
    lhs = float(jnp.sum(phi * ctxd.bm * da[0]))

    # independent fine-grid quadrature
    from nekstab_tpu.ops.tensorprod import deriv_r, deriv_s, interp_fine
    urd = interp_fine(ctxd.jd, deriv_r(ctxd.D, u[0]))
    usd = interp_fine(ctxd.jd, deriv_s(ctxd.D, u[0]))
    cxd = interp_fine(ctxd.jd, c[0])
    cyd = interp_fine(ctxd.jd, c[1])
    phid = interp_fine(ctxd.jd, phi)
    crd = cxd * ctxd.dmet[0] - cyd * ctxd.dmet[1]
    csd = -cxd * ctxd.dmet[2] + cyd * ctxd.dmet[3]
    rhs = float(jnp.sum(phid * ctxd.wd * (crd * urd + csd * usd)))
    assert lhs == pytest.approx(rhs, rel=1e-12)


def test_adjoint_identity_dealiased(ctxs):
    """The machine-precision discrete adjoint must survive dealiasing."""
    m, _, ctxd = ctxs
    cfg = NSConfig(re=100.0, dt=5e-3, vtol=1e-13, ptol=1e-13,
                   vmaxit=400, pmaxit=400)
    rng = np.random.default_rng(7)
    mk = lambda s: ctxd.mask_vel * dsavg(
        ctxd, jnp.asarray(np.random.default_rng(s).normal(
            size=(2,) + ctxd.bm.shape)))
    base, v, w = mk(1) * 0.5, mk(2), mk(3)
    sponge = jnp.zeros_like(ctxd.bm)
    prop = make_linear_propagator(ctxd, cfg, m.has_outflow, 3)
    adj = make_adjoint_propagator(ctxd, cfg, m.has_outflow, 3)
    lv, _ = prop(base, sponge, v)
    lw, _ = adj(base, sponge, w)
    a = float(glsc3(ctxd, lv, ctxd.bm, w))
    b = float(glsc3(ctxd, v, ctxd.bm, lw))
    assert a == pytest.approx(b, rel=1e-10), (a, b)


def test_nonlinear_step_runs_dealiased(ctxs):
    """One nonlinear advance with dealiasing on: finite energy, no NaNs."""
    m, _, ctxd = ctxs
    cfg = NSConfig(re=50.0, dt=2e-3, vtol=1e-11, ptol=1e-10)
    adv = jax.jit(make_advance(ctxd, cfg, m.has_outflow, 5))
    rng = np.random.default_rng(11)
    u0 = ctxd.mask_vel * dsavg(
        ctxd, jnp.asarray(rng.normal(size=(2,) + ctxd.bm.shape))) * 0.1
    st, energy = adv(zero_case_fields(ctxd), initial_state(ctxd, u0))
    assert np.all(np.isfinite(np.asarray(st.u)))
    assert float(energy[-1]) < float(energy[0])  # decaying enclosed flow
