import jax.numpy as jnp
import numpy as np
import pytest

from nekstab_tpu.mesh import box_mesh, build_mesh
from nekstab_tpu.ops import (dsavg, dssum, glsc3, glsum, grad, make_context,
                             mass, strong_div, weak_div, weak_laplacian)


def _wall(x, y, n):
    return "W"


@pytest.fixture(scope="module")
def ctx_box():
    m = box_mesh(6, 3, 2, 0.0, 1.5, 0.0, 1.0, bc_fn=_wall)
    return make_context(m)


@pytest.fixture(scope="module")
def ctx_deformed():
    # smoothly deformed quadrilateral elements (non-affine mapping)
    m = box_mesh(7, 3, 3, 0.0, 1.0, 0.0, 1.0, bc_fn=_wall)
    corners = []
    for e in range(m.nelem):
        cs = []
        for (i, j) in [(0, 0), (-1, 0), (-1, -1), (0, -1)]:
            x, y = m.x[e][i, j], m.y[e][i, j]
            cs.append([x + 0.06 * np.sin(2 * x + y), y + 0.05 * np.cos(x - 3 * y)])
        corners.append(cs)
    md = build_mesh(7, np.array(corners), bc_fn=_wall)
    return make_context(md)


def test_mass_total_area(ctx_box):
    assert np.isclose(float(glsum(ctx_box, ctx_box.bm)), 1.5, atol=1e-12)


def test_grad_exact_polynomial(ctx_deformed):
    ctx = ctx_deformed
    x, y = ctx.xcoord, ctx.ycoord
    u = x ** 3 + 2 * x * y - y ** 2
    ux, uy = grad(ctx, u)
    assert np.allclose(ux, 3 * x ** 2 + 2 * y, atol=1e-9)
    assert np.allclose(uy, 2 * x - 2 * y, atol=1e-9)


def test_weak_laplacian_vs_quadrature(ctx_deformed):
    # v^T A u  ==  sum bm * grad(u).grad(v)  (exact identity of the G-form)
    ctx = ctx_deformed
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=ctx.bm.shape))
    v = jnp.asarray(rng.normal(size=ctx.bm.shape))
    lhs = float(jnp.sum(v * weak_laplacian(ctx, u)))
    ux, uy = grad(ctx, u)
    vx, vy = grad(ctx, v)
    rhs = float(jnp.sum(ctx.bm * (ux * vx + uy * vy)))
    assert np.isclose(lhs, rhs, rtol=1e-12)


def test_weak_laplacian_symmetry(ctx_deformed):
    ctx = ctx_deformed
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.normal(size=ctx.bm.shape))
    v = jnp.asarray(rng.normal(size=ctx.bm.shape))
    a = float(jnp.sum(v * weak_laplacian(ctx, u)))
    b = float(jnp.sum(u * weak_laplacian(ctx, v)))
    assert np.isclose(a, b, rtol=1e-12)


def test_weak_div_identity(ctx_deformed):
    # q^T weak_div(u,v) == sum bm * (u qx + v qy)
    ctx = ctx_deformed
    rng = np.random.default_rng(2)
    u = jnp.asarray(rng.normal(size=ctx.bm.shape))
    v = jnp.asarray(rng.normal(size=ctx.bm.shape))
    q = jnp.asarray(rng.normal(size=ctx.bm.shape))
    lhs = float(jnp.sum(q * weak_div(ctx, u, v)))
    qx, qy = grad(ctx, q)
    rhs = float(jnp.sum(ctx.bm * (u * qx + v * qy)))
    assert np.isclose(lhs, rhs, rtol=1e-12)


def test_strong_div_of_divfree_field(ctx_deformed):
    ctx = ctx_deformed
    x, y = ctx.xcoord, ctx.ycoord
    # stream function psi = x^2 y: u = x^2, v = -2xy is div-free and polynomial
    u, v = x ** 2, -2 * x * y
    assert np.allclose(strong_div(ctx, u, v), 0.0, atol=1e-9)


def test_dssum_consistency(ctx_box):
    ctx = ctx_box
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.normal(size=ctx.bm.shape))
    s = dssum(ctx, u)
    # dofs with multiplicity 1 unchanged
    m1 = np.asarray(ctx.multinv) == 1.0
    assert np.allclose(np.asarray(s)[m1], np.asarray(u)[m1])
    # dssum result is continuous: duplicated dofs agree
    gid = np.asarray(ctx.gid)
    flat_s = np.asarray(s).ravel()
    flat_g = gid.ravel()
    for g in np.unique(flat_g)[:50]:
        vals = flat_s[flat_g == g]
        assert np.allclose(vals, vals[0], rtol=1e-12)
    # dsavg preserves already-continuous fields
    c = ctx.xcoord * 2.0 + 1.0
    assert np.allclose(dsavg(ctx, c), c, atol=1e-12)


def test_dssum_transpose_is_itself(ctx_box):
    # dssum is symmetric: <dssum(u), v> = <u, dssum(v)> (Euclidean)
    ctx = ctx_box
    rng = np.random.default_rng(4)
    u = jnp.asarray(rng.normal(size=ctx.bm.shape))
    v = jnp.asarray(rng.normal(size=ctx.bm.shape))
    a = float(jnp.sum(dssum(ctx, u) * v))
    b = float(jnp.sum(u * dssum(ctx, v)))
    assert np.isclose(a, b, rtol=1e-12)


def test_glsc3_integrates(ctx_box):
    ctx = ctx_box
    one = jnp.ones_like(ctx.bm)
    x = ctx.xcoord
    # int x dA over [0,1.5]x[0,1] = 1.125
    assert np.isclose(float(glsc3(ctx, x, ctx.bm, one)), 1.125, atol=1e-10)


def test_integration_by_parts(ctx_box):
    # For u with compact support (zero on boundary):
    # q^T weak_div(u,0) == -sum q * bm * du/dx approximately (GLL quadrature)
    ctx = ctx_box
    x, y = np.asarray(ctx.xcoord), np.asarray(ctx.ycoord)
    bump = (x * (1.5 - x) * y * (1 - y)) ** 2 * 100
    u = jnp.asarray(bump)
    q = jnp.asarray(np.sin(2 * x + y))
    # note: pair q against the *unassembled* functionals (summing q * dssum(w)
    # over all redundant copies would double-count interface dofs)
    lhs = float(jnp.sum(q * weak_div(ctx, u, jnp.zeros_like(u))))
    ux, _ = grad(ctx, u)
    rhs = -float(jnp.sum(q * ctx.bm * ux))
    assert np.isclose(lhs, rhs, rtol=2e-4)
