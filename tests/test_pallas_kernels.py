"""Fused Pallas weak-Laplacian kernel (ops/pallas_kernels.py): correctness
vs the einsum path (interpret mode on CPU), transpose/symmetry, batching."""

import jax
import jax.numpy as jnp
import numpy as np

from nekstab_tpu.models.cylinder import cylinder_system
from nekstab_tpu.ops.pallas_kernels import (_einsum_impl, _flat_mats,
                                            _pallas_impl, weak_laplacian_fused)
from nekstab_tpu.ops.tensorprod import weak_laplacian


def test_fused_matches_einsum_interpret():
    rng = np.random.default_rng(0)
    R, n = 90, 6
    nn = n * n
    from nekstab_tpu.quadrature import make_basis
    D = make_basis(n).D
    drf, dsf = _flat_mats(D)
    u = jnp.asarray(rng.standard_normal((R, nn)))
    g11, g12, g22 = (jnp.asarray(rng.standard_normal((R, nn))) for _ in range(3))
    drt, dst = jnp.asarray(drf.T), jnp.asarray(dsf.T)
    a = _einsum_impl(u, g11, g12, g22, drt, dst)
    b = _pallas_impl(u, g11, g12, g22, drt, dst, interpret=True)
    assert float(jnp.max(jnp.abs(a - b))) < 1e-11


def test_wrapper_matches_weak_laplacian_and_transposes():
    sys_ = cylinder_system(n=5, dt=2e-3, nq=4, n_ring=3, nx_left=3,
                           nx_right=5, ny_side=3)
    ctx = sys_.ctx
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.standard_normal((2,) + ctx.bm.shape))
    ref = weak_laplacian(ctx, u)
    got = weak_laplacian_fused(ctx, u)   # einsum lowering on CPU
    assert float(jnp.max(jnp.abs(ref - got))) < 1e-11

    # self-transpose (element operator is symmetric)
    f = lambda v: weak_laplacian_fused(ctx, v)
    t = jax.linear_transpose(f, u)
    w = jnp.asarray(rng.standard_normal(u.shape))
    (ftw,) = t(w)
    a = float(jnp.vdot(f(u), w))
    b = float(jnp.vdot(u, ftw))
    assert abs(a - b) < 1e-12 * abs(a)
