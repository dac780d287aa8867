"""Pallas TPU kernels for the element-local hot ops.

`weak_laplacian_fused`: the full element weak Laplacian
    out = Dr^T (g11 (Dr u) + g12 (Ds u)) + Ds^T (g12 (Dr u) + g22 (Ds u))
as ONE kernel per element tile — 4 MXU matmuls on the flattened (rows, n^2)
layout plus fused elementwise metric products, replacing ~8 separate XLA ops.
At SEM sizes the op is launch-latency bound, not FLOP bound (see
docs/ROOFLINE.md), so the win is op-count reduction inside the CG loops.

Exposed as a custom primitive `wlap_p`:
  * the element operator is SYMMETRIC (A_el^T = A_el), so its transpose rule
    is itself — `jax.linear_transpose` of the linearized propagator works
    unchanged (the exact-discrete-adjoint requirement);
  * lowering uses the Pallas kernel on TPU and the einsum path elsewhere.

Opt-in at runtime: set NEKSTAB_PALLAS=1 (ops/tensorprod.py dispatch), or call
weak_laplacian_fused directly.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import core as jcore
from jax.extend import core as jex_core
from jax.interpreters import ad, batching, mlir

TILE_E = 256


def _flat_mats(D: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    n = D.shape[0]
    I = np.eye(n)
    return np.kron(D, I), np.kron(I, D)   # Dr_flat, Ds_flat


def _einsum_impl(u, g11, g12, g22, drt, dst):
    """Reference implementation on the flattened (R, nn) layout."""
    ur = u @ drt
    us = u @ dst
    wr = g11 * ur + g12 * us
    ws = g12 * ur + g22 * us
    return wr @ drt.T + ws @ dst.T


def _pallas_impl(u, g11, g12, g22, drt, dst, interpret=False):
    from jax.experimental import pallas as pl

    R, nn = u.shape
    nEb = max(R // TILE_E, 1)
    tile = R // nEb if R % nEb == 0 else TILE_E

    def kernel(u_ref, g11_ref, g12_ref, g22_ref, drt_ref, dst_ref, out_ref):
        uu = u_ref[:]
        drt_k = drt_ref[:]
        dst_k = dst_ref[:]
        f32 = jnp.float32 if uu.dtype != jnp.float64 else jnp.float64
        ur = jnp.dot(uu, drt_k, preferred_element_type=f32)
        us = jnp.dot(uu, dst_k, preferred_element_type=f32)
        wr = g11_ref[:] * ur + g12_ref[:] * us
        ws = g12_ref[:] * ur + g22_ref[:] * us
        out_ref[:] = (jnp.dot(wr, drt_k.T, preferred_element_type=f32)
                      + jnp.dot(ws, dst_k.T, preferred_element_type=f32)
                      ).astype(uu.dtype)

    pad = (-R) % tile
    if pad:
        zpad = lambda a: jnp.pad(a, ((0, pad), (0, 0)))
        u, g11, g12, g22 = map(zpad, (u, g11, g12, g22))
    Rp = u.shape[0]
    grid = (Rp // tile,)
    espec = pl.BlockSpec((tile, nn), lambda i: (i, 0))
    mspec = pl.BlockSpec((nn, nn), lambda i: (0, 0))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Rp, nn), u.dtype),
        grid=grid,
        in_specs=[espec, espec, espec, espec, mspec, mspec],
        out_specs=espec,
        interpret=interpret,
    )(u, g11, g12, g22, drt, dst)
    return out[:R] if pad else out


# ---------------------------------------------------------------------------
# primitive (linear, symmetric -> self-transpose)
# ---------------------------------------------------------------------------

wlap_p = jex_core.Primitive("nekstab_wlap")


def _wlap(u, g11, g12, g22, drt, dst):
    return wlap_p.bind(u, g11, g12, g22, drt, dst)


wlap_p.def_impl(_einsum_impl)
wlap_p.def_abstract_eval(
    lambda u, *a: jcore.ShapedArray(u.shape, u.dtype))

mlir.register_lowering(
    wlap_p, mlir.lower_fun(_einsum_impl, multiple_results=False))
mlir.register_lowering(
    wlap_p, mlir.lower_fun(_pallas_impl, multiple_results=False),
    platform="tpu")

ad.defjvp(wlap_p,
          lambda t, *args: _wlap(t, *args[1:]),
          None, None, None, None, None)


def _wlap_transpose(ct, u, g11, g12, g22, drt, dst):
    # A_el is symmetric: transpose = the same operator
    return (_wlap(ct, g11, g12, g22, drt, dst),
            None, None, None, None, None)


ad.primitive_transposes[wlap_p] = _wlap_transpose


def _wlap_batch(args, dims):
    u, g11, g12, g22, drt, dst = args
    d = dims[0]
    if d is not batching.not_mapped and d != 0:
        u = jnp.moveaxis(u, d, 0)
    B = u.shape[0]
    out = _wlap(u.reshape(-1, u.shape[-1]),
                jnp.tile(g11, (B, 1)), jnp.tile(g12, (B, 1)),
                jnp.tile(g22, (B, 1)), drt, dst)
    return out.reshape(u.shape), 0


batching.primitive_batchers[wlap_p] = _wlap_batch


# ---------------------------------------------------------------------------
# public wrapper on the (..., E, n, n) field layout
# ---------------------------------------------------------------------------

def weak_laplacian_fused(ctx, u: jnp.ndarray) -> jnp.ndarray:
    """Drop-in for ops.tensorprod.weak_laplacian using the fused kernel."""
    n = ctx.n
    nn = n * n
    E = ctx.bm.shape[0]
    lead = u.shape[:-3]
    drf, dsf = _flat_mats(np.asarray(ctx.D, np.float64))
    drt = jnp.asarray(drf.T, u.dtype)
    dst = jnp.asarray(dsf.T, u.dtype)
    g11 = ctx.g11.reshape(E, nn)
    g12 = ctx.g12.reshape(E, nn)
    g22 = ctx.g22.reshape(E, nn)
    C = int(np.prod(lead)) if lead else 1
    uf = u.reshape(C * E, nn)
    if C > 1:
        g11, g12, g22 = (jnp.tile(g, (C, 1)) for g in (g11, g12, g22))
    out = _wlap(uf, g11, g12, g22, drt, dst)
    return out.reshape(u.shape)
