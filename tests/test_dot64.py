"""The mixed-precision (f32 fields, f64 reductions) orthogonalization path.

VERDICT r2 Weak #3: `astype(float64)` without jax_enable_x64 silently
truncates to f32, making the advertised f64 orthogonalization dead code on
TPU. These tests pin the fix: dot64 refuses to build without x64, matches a
host f64 reference where a naive f32 dot provably does not, and never
promotes the f32 Krylov basis to f64 (which would hit TPU-emulated f64
GEMMs in tree_combine)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nekstab_tpu.config import NSConfig
from nekstab_tpu.driver import FlowSystem
from nekstab_tpu.mesh import box_mesh


@pytest.fixture(scope="module")
def sys32():
    mesh = box_mesh(4, 2, 2, 0.0, 1.0, 0.0, 1.0, bc_fn=lambda x, y, n: "V")
    cfg = NSConfig(re=100.0, dt=1e-2, vtol=1e-5, ptol=1e-5)
    return FlowSystem(mesh, cfg, None, dtype=jnp.float32)


def _adversarial_pair(ctx, seed=0):
    """f32 fields whose mass-weighted inner product loses ~all f32 digits
    to cancellation: a large-magnitude part that cancels exactly under the
    symmetric weight plus a tiny O(1e-3) remainder carrying the answer."""
    rng = np.random.default_rng(seed)
    shape = ctx.mask_vel.shape
    big = rng.standard_normal(shape) * 1e3
    big[1] = -big[0]            # cancels: w * (a0*b0 + a1*b1) with b = flip(a)
    small = rng.standard_normal(shape) * 1e-3
    a = (big + small).astype(np.float32)
    b = np.stack([a[1], a[0]]).astype(np.float32)  # swap components
    return jnp.asarray(a), jnp.asarray(b)


def test_dot64_requires_x64(sys32):
    assert jax.config.jax_enable_x64        # conftest enables it
    jax.config.update("jax_enable_x64", False)
    try:
        with pytest.raises(RuntimeError, match="x64"):
            _ = sys32.dot64
    finally:
        jax.config.update("jax_enable_x64", True)


def test_dot64_matches_host_f64_where_f32_fails(sys32):
    ctx = sys32.ctx
    a, b = _adversarial_pair(ctx)
    w = np.asarray(ctx.bm_eig, np.float64)
    ref = float(np.sum(np.asarray(a, np.float64) * w
                       * np.asarray(b, np.float64)))
    got = float(sys32.dot64(a, b))
    assert got == pytest.approx(ref, rel=1e-10)
    # the naive f32 dot provably loses the answer on this input — the
    # "fails under silent truncation" half of the check
    naive = float(jnp.sum(a * ctx.bm_eig.astype(jnp.float32) * b))
    assert abs(naive - ref) > 1e3 * abs(got - ref) + 1e-12


def test_dot64_output_is_f64_scalar(sys32):
    ctx = sys32.ctx
    a, b = _adversarial_pair(ctx, seed=1)
    s = sys32.dot64(a, b)
    assert s.dtype == jnp.float64


def test_cgs2_with_dot64_keeps_f32_basis(sys32):
    """Arnoldi CGS2 with f64 coefficients must not promote the basis."""
    from nekstab_tpu.algorithms.arnoldi import (ArnoldiSpace, tree_alloc,
                                                tree_set)
    ctx = sys32.ctx
    rng = np.random.default_rng(3)
    mk = lambda s: jnp.asarray(
        rng.standard_normal(ctx.mask_vel.shape), jnp.float32)
    space = ArnoldiSpace(matvec=lambda v: 0.5 * v, dot=sys32.dot64)
    v0, _ = space.normalize(mk(0))
    assert jax.tree.leaves(v0)[0].dtype == jnp.float32
    Q = tree_alloc(v0, 4)
    Q = tree_set(Q, 0, v0)
    h, w = space._cgs2(Q, mk(1), jnp.arange(4) < 1)
    assert h.dtype == jnp.float64           # coefficients at f64
    assert jax.tree.leaves(w)[0].dtype == jnp.float32   # basis stays f32
