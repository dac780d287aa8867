"""Gather-only direct-stiffness primitives (the framework's "gslib").

XLA:TPU scatter is a compile-time and runtime liability (a single
segment-sum+gather program was measured at ~100 s remote compile on the v5e
path, vs < 1 s for gather-only code). Assembly is therefore implemented as
two custom JAX primitives that lower to pure gathers in BOTH directions:

  qsum(u, idx, gid):  local (..., L) -> global (..., G): each global dof sums
      its <= maxmult copies via a padded index table (gather + reduce);
  qcopy(g, idx, gid): global -> local: g[..., gid] (gather).

They are exact transposes of each other (Q^T and Q of the classical direct
stiffness), registered via ad.primitive_transposes — so jax.linear_transpose
of the propagator (the exact discrete adjoint, solver/linearized.py) also
emits only gathers, never an XLA scatter.

Tables are built host-side in mesh preprocessing (the role of gslib setup in
the reference, SURVEY.md L0).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import core as jcore
from jax.extend import core as jex_core
from jax.interpreters import ad, batching, mlir


def build_gs_tables(gid: np.ndarray, nglobal: int) -> np.ndarray:
    """Index table (nglobal, maxmult) into the padded flat local vector
    [0..L]: row g lists the flat positions of all copies of global dof g,
    padded with L (a zero slot)."""
    flat = gid.reshape(-1).astype(np.int64)
    L = flat.size
    order = np.argsort(flat, kind="stable")
    sorted_gid = flat[order]
    counts = np.bincount(flat, minlength=nglobal)
    maxmult = int(counts.max())
    idx = np.full((nglobal, maxmult), L, dtype=np.int32)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    for k in range(maxmult):
        sel = counts > k
        idx[sel, k] = order[starts[sel] + k]
    return idx


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

qsum_p = jex_core.Primitive("nekstab_qsum")
qcopy_p = jex_core.Primitive("nekstab_qcopy")


def qsum(u: jnp.ndarray, idx: jnp.ndarray, gid: jnp.ndarray) -> jnp.ndarray:
    """Sum duplicated copies into the global vector: (..., L) -> (..., G)."""
    return qsum_p.bind(u, idx, gid)


def qcopy(g: jnp.ndarray, idx: jnp.ndarray, gid: jnp.ndarray) -> jnp.ndarray:
    """Copy global values to every local slot: (..., G) -> (..., L)."""
    return qcopy_p.bind(g, idx, gid)


def _qsum_impl(u, idx, gid):
    pad = jnp.zeros(u.shape[:-1] + (1,), u.dtype)
    up = jnp.concatenate([u, pad], axis=-1)
    return jnp.sum(up[..., idx], axis=-1)


def _qcopy_impl(g, idx, gid):
    return g[..., gid]


def _qsum_abstract(u, idx, gid):
    return jcore.ShapedArray(u.shape[:-1] + (idx.shape[0],), u.dtype)


def _qcopy_abstract(g, idx, gid):
    return jcore.ShapedArray(g.shape[:-1] + (gid.shape[0],), g.dtype)


qsum_p.def_impl(_qsum_impl)
qsum_p.def_abstract_eval(_qsum_abstract)
qcopy_p.def_impl(_qcopy_impl)
qcopy_p.def_abstract_eval(_qcopy_abstract)

mlir.register_lowering(qsum_p, mlir.lower_fun(_qsum_impl,
                                              multiple_results=False))
mlir.register_lowering(qcopy_p, mlir.lower_fun(_qcopy_impl,
                                               multiple_results=False))

# linear in the field argument: jvp = same op on the tangent
ad.defjvp(qsum_p, lambda t, u, idx, gid: qsum(t, idx, gid), None, None)
ad.defjvp(qcopy_p, lambda t, g, idx, gid: qcopy(t, idx, gid), None, None)


def _qsum_transpose(ct, u, idx, gid):
    # <Q^T u, g~> = <u, Q g~>
    return (qcopy(ct, idx, gid), None, None)


def _qcopy_transpose(ct, g, idx, gid):
    return (qsum(ct, idx, gid), None, None)


ad.primitive_transposes[qsum_p] = _qsum_transpose
ad.primitive_transposes[qcopy_p] = _qcopy_transpose


def _batch(prim):
    def rule(args, dims):
        x, idx, gid = args
        d = dims[0]
        assert dims[1] is batching.not_mapped and dims[2] is batching.not_mapped
        if d != 0:
            x = jnp.moveaxis(x, d, 0)
        return prim.bind(x, idx, gid), 0

    return rule


batching.primitive_batchers[qsum_p] = _batch(qsum_p)
batching.primitive_batchers[qcopy_p] = _batch(qcopy_p)
