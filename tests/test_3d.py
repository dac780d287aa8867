"""3D layer: mesh/ops exactness, gather-scatter oracle, Taylor-Green
physics, and the exact discrete adjoint (docs/DESIGN_3D.md §6)."""

import jax.numpy as jnp
import numpy as np
import pytest

from nekstab_tpu.config import NSConfig
from nekstab_tpu.driver3d import FlowSystem3
from nekstab_tpu.mesh3d import box_mesh3
from nekstab_tpu.ops.sem3d import (dssum3, grad3, make_context3d,
                                   weak_div3, weak_laplacian3)


def _wall(x, y, z, n):
    return "W"


@pytest.fixture(scope="module")
def ctx_box():
    m = box_mesh3(5, 2, 2, 2, 0.0, 1.0, 0.0, 1.2, 0.0, 0.9, bc_fn=_wall)
    return m, make_context3d(m)


def test_mass_total_volume(ctx_box):
    m, ctx = ctx_box
    assert np.isclose(float(jnp.sum(ctx.bm)), 1.0 * 1.2 * 0.9, atol=1e-12)


def test_grad3_exact_polynomial(ctx_box):
    m, ctx = ctx_box
    x, y, z = ctx.xcoord, ctx.ycoord, ctx.zcoord
    u = x ** 3 + 2 * x * y - y ** 2 * z + z ** 2
    ux, uy, uz = grad3(ctx, u)
    assert np.allclose(ux, 3 * x ** 2 + 2 * y, atol=1e-9)
    assert np.allclose(uy, 2 * x - 2 * y * z, atol=1e-9)
    assert np.allclose(uz, -y ** 2 + 2 * z, atol=1e-9)


def test_weak_laplacian3_vs_quadrature(ctx_box):
    m, ctx = ctx_box
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=ctx.bm.shape))
    v = jnp.asarray(rng.normal(size=ctx.bm.shape))
    lhs = float(jnp.sum(v * weak_laplacian3(ctx, u)))
    ux, uy, uz = grad3(ctx, u)
    vx, vy, vz = grad3(ctx, v)
    rhs = float(jnp.sum(ctx.bm * (ux * vx + uy * vy + uz * vz)))
    assert np.isclose(lhs, rhs, rtol=1e-12)


def test_weak_div3_vs_gradient(ctx_box):
    """<weak_div(u), q> == <bm u, grad q> (exact transpose identity)."""
    m, ctx = ctx_box
    rng = np.random.default_rng(1)
    u, v, w = (jnp.asarray(rng.normal(size=ctx.bm.shape)) for _ in range(3))
    q = jnp.asarray(rng.normal(size=ctx.bm.shape))
    lhs = float(jnp.sum(q * weak_div3(ctx, u, v, w)))
    qx, qy, qz = grad3(ctx, q)
    rhs = float(jnp.sum(ctx.bm * (u * qx + v * qy + w * qz)))
    assert np.isclose(lhs, rhs, rtol=1e-12)


def test_dssum3_oracle(ctx_box):
    m, ctx = ctx_box
    rng = np.random.default_rng(2)
    u = rng.normal(size=ctx.bm.shape)
    got = np.asarray(dssum3(ctx, jnp.asarray(u)))
    g = np.zeros(m.nglobal)
    np.add.at(g, m.gid.ravel(), u.ravel())
    assert np.allclose(got, g[m.gid], atol=1e-13)


def test_multiplicity(ctx_box):
    m, ctx = ctx_box
    # 2x2x2 box: the center vertex is shared by 8 elements
    assert m.mult.max() == 8.0
    ones = np.asarray(dssum3(ctx, jnp.ones_like(ctx.bm)))
    assert np.allclose(ones, m.mult)


# ---------------------------------------------------------------------------
# physics: 3D Taylor-Green (2D TG embedded, exact NS solution)
# ---------------------------------------------------------------------------

def test_taylor_green_3d():
    nu = 0.05
    # n=8 so the spatial (spectral) error sits below the splitting error:
    # measured n=6 -> 1.5e-3 (under-resolved sin/cos over pi-sized
    # elements), n=8 -> 5.4e-5 at dt=5e-3
    m = box_mesh3(8, 2, 2, 2, 0.0, 2 * np.pi, 0.0, 2 * np.pi, 0.0,
                  2 * np.pi, periodic_x=True, periodic_y=True,
                  periodic_z=True, bc_fn=lambda *a: "P")
    cfg = NSConfig(re=1.0 / nu, dt=5e-3, vtol=1e-11, ptol=1e-10,
                   vmaxit=200, pmaxit=400)
    sys_ = FlowSystem3(m, cfg, None)
    ctx = sys_.ctx
    x, y = ctx.xcoord, ctx.ycoord

    def exact(t):
        decay = np.exp(-2.0 * nu * t)
        return jnp.stack([-jnp.cos(x) * jnp.sin(y) * decay,
                          jnp.sin(x) * jnp.cos(y) * decay,
                          jnp.zeros_like(x)])

    nsteps = 40
    st, E = sys_.nonlinear_advance(nsteps)(sys_.case,
                                           sys_.initial_state(exact(0.0)))
    ue = exact(nsteps * cfg.dt)
    err = float(jnp.max(jnp.abs(st.u - ue)))
    assert err < 1.5e-4, err


# ---------------------------------------------------------------------------
# linearized / adjoint
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def sys_cavity():
    m = box_mesh3(4, 2, 2, 2, 0.0, 1.0, 0.0, 1.0, 0.0, 1.0, bc_fn=_wall)
    cfg = NSConfig(re=100.0, dt=5e-3, vtol=1e-13, ptol=1e-13,
                   vmaxit=400, pmaxit=600)
    return FlowSystem3(m, cfg, None)


def _rand_vel3(ctx, seed):
    rng = np.random.default_rng(seed)
    u = jnp.asarray(rng.normal(size=(3,) + ctx.bm.shape))
    return ctx.mask_vel * (dssum3(ctx, u) * ctx.multinv)


def test_adjoint_identity_3d(sys_cavity):
    s = sys_cavity
    ctx = s.ctx
    base = _rand_vel3(ctx, 10) * 0.5
    v = _rand_vel3(ctx, 11)
    w = _rand_vel3(ctx, 12)
    nsteps = 3
    lv, _ = s.linear_propagator(nsteps)(base, s.sponge_fun, v)
    lw, _ = s.adjoint_propagator(nsteps)(base, s.sponge_fun, w)
    a = float(s.dot_full(lv, w))
    b = float(s.dot_full(v, lw))
    assert a == pytest.approx(b, rel=1e-9), (a, b)


def test_linearized_consistency_3d(sys_cavity):
    """The linearized propagator matches the nonlinear difference quotient.

    ONE step only: the frozen-base linearized map equals the true Jacobian
    just for the first step from a cold start (where the trajectory still
    IS the base); over multiple steps from a non-equilibrium base they
    legitimately differ by the trajectory drift (the reference's
    newton_linearized_map makes the same frozen-base approximation,
    core/matvec.f:381-475)."""
    s = sys_cavity
    ctx = s.ctx
    base = _rand_vel3(ctx, 20) * 0.3
    v = _rand_vel3(ctx, 21)
    nsteps = 1
    eps = 1e-6

    def phi(q):
        st, _ = s.nonlinear_advance(nsteps)(s.case, s.initial_state(q))
        return st.u

    fd = (phi(base + eps * v) - phi(base - eps * v)) / (2 * eps)
    lv, _ = s.linear_propagator(nsteps)(base, s.sponge_fun, v)
    num = float(jnp.linalg.norm((fd - lv).ravel()))
    den = float(jnp.linalg.norm(lv.ravel()))
    assert num / den < 1e-6, num / den


def test_vortex_criteria_3d():
    """3D criteria on analytic fields: a Burgers-like columnar vortex has
    Q>0, lambda2<0 and |vorticity|=2*Omega on the axis; a pure shear has
    Q<0, lambda_ci=0 and lambda2>=0 off-core."""
    import jax.numpy as jnp
    import numpy as np
    from nekstab_tpu.analysis.postproc3d import (
        delta_criterion3, lambda2_criterion3, omega_criterion3,
        q_criterion3, swirling_strength3, vorticity3)
    from nekstab_tpu.mesh3d import box_mesh3
    from nekstab_tpu.ops.sem3d import make_context3d

    mesh = box_mesh3(5, 2, 2, 2, -1, 1, -1, 1, -1, 1,
                     bc_fn=lambda x, y, z, f: "W")
    ctx = make_context3d(mesh)
    x, y, z = (np.asarray(ctx.xcoord), np.asarray(ctx.ycoord),
               np.asarray(ctx.zcoord))

    # solid-body rotation about z: u = (-Om y, Om x, 0)
    Om = 0.7
    u_rot = jnp.asarray(np.stack([-Om * y, Om * x, np.zeros_like(z)]))
    w = vorticity3(ctx, u_rot)
    assert float(jnp.max(jnp.abs(w[2] - 2 * Om))) < 1e-10
    assert float(jnp.max(jnp.abs(w[0]))) < 1e-10
    q = q_criterion3(ctx, u_rot)
    assert float(jnp.min(q)) > 0          # pure rotation: Q = Om^2 > 0
    assert float(jnp.max(jnp.abs(q - Om ** 2))) < 1e-9
    l2 = lambda2_criterion3(ctx, u_rot)
    assert float(jnp.max(l2)) < -Om ** 2 * 0.99   # lambda2 = -Om^2
    lci = swirling_strength3(ctx, u_rot)
    assert float(jnp.max(jnp.abs(lci - Om))) < 1e-6
    om = omega_criterion3(ctx, u_rot)
    assert float(jnp.min(om)) > 0.9       # rotation-dominated -> ~1
    d = delta_criterion3(ctx, u_rot)
    assert float(jnp.min(d)) > 0

    # pure shear u = (s y, 0, 0): Q = 0 exactly, no swirling, lambda2 = 0
    s = 1.3
    u_sh = jnp.asarray(np.stack([s * y, np.zeros_like(y),
                                 np.zeros_like(z)]))
    assert float(jnp.max(jnp.abs(q_criterion3(ctx, u_sh)))) < 1e-9
    assert float(jnp.max(swirling_strength3(ctx, u_sh))) < 1e-8
    assert float(jnp.max(jnp.abs(lambda2_criterion3(ctx, u_sh)))) < 1e-8

    # planar strain u = (a x, -a y, 0): Q = -a^2 < 0, lambda2 = +a^2
    a = 0.9
    u_st = jnp.asarray(np.stack([a * x, -a * y, np.zeros_like(z)]))
    q = q_criterion3(ctx, u_st)
    assert float(jnp.max(jnp.abs(q + a ** 2))) < 1e-9
    l2 = lambda2_criterion3(ctx, u_st)
    assert float(jnp.min(l2)) > a ** 2 * 0.99
