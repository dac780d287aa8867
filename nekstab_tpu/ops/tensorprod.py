"""Element-local tensor-product SEM operators (JAX compute path).

These are the hot kernels of the framework: every field derivative is a pair of
small batched matmuls (the classic "fast tensor-product" trick), expressed so
XLA maps them onto the MXU as one large (E*n, n) x (n, n) GEMM per direction.
The reference obtains the same operations from Nek5000's mxm-based local
operators (SURVEY.md L1); here they are native XLA einsums, with a fused
Pallas variant of the weak Laplacian in ops/pallas_kernels.py
(NEKSTAB_PALLAS=1 to enable; see docs/ROOFLINE.md for when it pays).

Conventions: fields are (..., E, n, n) with index [e, i, j]; i is the r-index,
j the s-index. All functions are linear in the field argument (required for
`jax.linear_transpose` of the linearized propagator, solver/linearized.py).
"""

from __future__ import annotations

import os

import jax.numpy as jnp
from jax import lax

from .context import SemContext

# opt-in fused Pallas kernel for the weak Laplacian (ops/pallas_kernels.py);
# read once at import — flip NEKSTAB_PALLAS=1 in the environment
_USE_PALLAS = os.environ.get("NEKSTAB_PALLAS", "0") == "1"

# Operator-path contractions must be true f32: XLA's DEFAULT precision
# lowers f32 matmuls to one-pass bf16, whose ~1e-2 relative error in the
# repeated D/D^T applications destabilized the whole linearized propagator
# on TPU (the BENCH_r02 exp(tau L) blow-up to |mu| ~ 5.6e8). Two true-f32
# strategies, selectable with NEKSTAB_OP_PREC (read once at import):
#
#   "fma" (default) — express the n-point contractions as broadcast
#       multiply + reduce, which XLA fuses into ONE f32 VPU loop-fusion
#       kernel. At SEM sizes (n = 6..8 contraction depth) the chip is
#       latency-bound (docs/ROOFLINE.md): a k=6 contraction occupies 6/128
#       of the MXU's systolic depth, so the MXU buys nothing and the
#       HIGHEST 6-pass decomposition just multiplies the op count — the
#       r3 throughput collapse (11.9 -> 3.93 steps/s, BENCH_r03).
#   "highest" — 6-pass bf16 MXU decomposition (bitwise f32-equivalent).
#   "high"    — 3-pass bf16 (bf16_3x); NOT exact f32.
#   "default" — one-pass bf16; unstable for the propagator, kept only for
#       A/B diagnostics.
_MODE = os.environ.get("NEKSTAB_OP_PREC", "fma")
PREC = {"default": lax.Precision.DEFAULT,
        "high": lax.Precision.HIGH,
        "highest": lax.Precision.HIGHEST,
        "fma": lax.Precision.HIGHEST}[_MODE]
_FMA = _MODE == "fma"


def deriv_r(D: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """du/dr: contract the i-index: (D u)[e,i,j] = sum_k D[i,k] u[e,k,j]."""
    if _FMA:
        return jnp.sum(D[:, :, None] * u[..., None, :, :], axis=-2)
    return jnp.einsum("ik,...kj->...ij", D, u, precision=PREC)


def deriv_s(D: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """du/ds: contract the j-index."""
    if _FMA:
        return jnp.sum(u[..., :, None, :] * D[:, :], axis=-1)
    return jnp.einsum("jk,...ik->...ij", D, u, precision=PREC)


def deriv_r_t(D: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Transpose of deriv_r: (D^T w)[e,k,j] = sum_i D[i,k] w[e,i,j]."""
    if _FMA:
        return jnp.sum(D[:, :, None] * w[..., :, None, :], axis=-3)
    return jnp.einsum("ik,...ij->...kj", D, w, precision=PREC)


def deriv_s_t(D: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    if _FMA:
        return jnp.sum(w[..., :, :, None] * D[:, :], axis=-2)
    return jnp.einsum("jk,...ij->...ik", D, w, precision=PREC)


def bmatvec(A: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Batched matvec (..., a, b) @ (..., b) -> (..., a) at true f32.

    Used by the preconditioner applications (element Schwarz blocks, the
    dense vertex-coarse inverse). Unbatched these lower to f32 matvecs, but
    under the vmap-batched block propagator they become real GEMMs and
    XLA's DEFAULT drops them to one-pass bf16 — which breaks the
    preconditioner's symmetry at ~1e-2 on exactly the modes CG amplifies
    (the BENCH_r03 block-path blow-up; bisected with tools/block_vs_seq.py).
    """
    if _FMA:
        return jnp.sum(A * x[..., None, :], axis=-1)
    return jnp.einsum("...ab,...b->...a", A, x, precision=PREC)


def grad(ctx: SemContext, u: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Physical gradient (du/dx, du/dy) at collocation points."""
    ur = deriv_r(ctx.D, u)
    us = deriv_s(ctx.D, u)
    return ctx.rx * ur + ctx.sx * us, ctx.ry * ur + ctx.sy * us


def mass(ctx: SemContext, u: jnp.ndarray) -> jnp.ndarray:
    """Diagonal (unassembled) mass: B u."""
    return ctx.bm * u


def weak_laplacian(ctx: SemContext, u: jnp.ndarray) -> jnp.ndarray:
    """Element-local weak Laplacian A u (assemble with dssum afterwards):
    (A u)_q = int grad(u) . grad(phi_q), via the G-factor form."""
    if _USE_PALLAS:
        from .pallas_kernels import weak_laplacian_fused
        return weak_laplacian_fused(ctx, u)
    ur = deriv_r(ctx.D, u)
    us = deriv_s(ctx.D, u)
    wr = ctx.g11 * ur + ctx.g12 * us
    ws = ctx.g12 * ur + ctx.g22 * us
    return deriv_r_t(ctx.D, wr) + deriv_s_t(ctx.D, ws)


def weak_div(ctx: SemContext, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Element-local weak divergence functional: result_q = int (u,v).grad(phi_q)
    (equals -(div(u,v), phi_q) + boundary flux). Assemble with dssum."""
    fr = ctx.bm * (ctx.rx * u + ctx.ry * v)
    fs = ctx.bm * (ctx.sx * u + ctx.sy * v)
    return deriv_r_t(ctx.D, fr) + deriv_s_t(ctx.D, fs)


def interp_fine(jd: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Interpolate (..., E, n, n) GLL field to the (..., E, m, m) Gauss grid."""
    t = jnp.einsum("ai,...ij->...aj", jd, u, precision=PREC)
    return jnp.einsum("bj,...aj->...ab", jd, t, precision=PREC)


def interp_fine_t(jd: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Transpose: Gauss-grid functional -> GLL functional."""
    t = jnp.einsum("ai,...aj->...ij", jd, w, precision=PREC)
    return jnp.einsum("bj,...ib->...ij", jd, t, precision=PREC)


def convect_dealiased(ctx: SemContext, c: jnp.ndarray,
                      u: jnp.ndarray) -> jnp.ndarray:
    """(c.grad)u with over-integration on the Gauss grid (pointwise-equivalent
    form: the dealiased weak convection divided by the diagonal mass).

    The quadratic product is formed on the m-point Gauss grid (m ~ 3n/2) so
    the degree-(2p-1) integrand is integrated exactly — the reference's lxd
    over-integration (Nek5000 convect_new; SURVEY.md §2 "Dealiasing"). All
    steps are interpolations/products: exactly linear in both args separately,
    so `jax.linear_transpose` of the linearized step remains exact.
    """
    ur = deriv_r(ctx.D, u)
    us = deriv_s(ctx.D, u)
    urd = interp_fine(ctx.jd, ur)
    usd = interp_fine(ctx.jd, us)
    cxd = interp_fine(ctx.jd, c[0])
    cyd = interp_fine(ctx.jd, c[1])
    # jac*(c . grad r), jac*(c . grad s) on the fine grid (polynomial metrics)
    crd = cxd * ctx.dmet[0] - cyd * ctx.dmet[1]
    csd = -cxd * ctx.dmet[2] + cyd * ctx.dmet[3]
    fd = ctx.wd * (crd * urd + csd * usd)
    if ctx.dmet.shape[0] > 4:
        fd = fd * ctx.dmet[4]   # axisymmetric: cylindrical measure weight r
    # safe divisor: axisymmetric bm vanishes at axis nodes, whose pointwise
    # value is annihilated by the bm-weighting of every downstream consumer
    bm = jnp.where(ctx.bm == 0, 1.0, ctx.bm)
    return interp_fine_t(ctx.jd, fd) / bm


def strong_div(ctx: SemContext, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Collocation divergence du/dx + dv/dy."""
    ux, _ = grad(ctx, u)
    _, vy = grad(ctx, v)
    return ux + vy
