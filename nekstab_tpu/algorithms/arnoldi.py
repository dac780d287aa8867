"""k-step Arnoldi factorization with CGS2 re-orthogonalization.

Operator-agnostic (reference: core/krylov_decomposition.f): vectors are
arbitrary pytrees, the operator is a callable, and the inner product is
supplied by the caller (mass-weighted for stability runs). The Krylov basis
lives on device as a stacked pytree (leading axis k+1); both CGS passes are
vectorized into a single batched contraction -> on TPU each pass is one big
GEMM + one psum instead of 2k sequential reductions (SURVEY.md §2.4).

The Hessenberg matrix is kept host-side in float64 numpy — it is k x k tiny
and feeds scipy dense solves (the reference vendors LAPACK for this,
core/lapack_wrapper.f).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def tree_get(Q, i):
    return jax.tree.map(lambda x: x[i], Q)


def tree_set(Q, i, v):
    return jax.tree.map(lambda x, y: x.at[i].set(y), Q, v)


def tree_axpy(a, x, y):
    # scalar cast to the leaf dtype: with x64 enabled for the f64 inner
    # products (driver.dot64) the coefficients arrive as strong float64 and
    # must not promote the f32 basis to (TPU-emulated) f64
    return jax.tree.map(
        lambda xl, yl: jnp.asarray(a, xl.dtype) * xl + yl, x, y)


def tree_scale(a, x):
    return jax.tree.map(lambda xl: jnp.asarray(a, xl.dtype) * xl, x)


def tree_zeros_like(v):
    return jax.tree.map(jnp.zeros_like, v)


def tree_alloc(v, m: int):
    """Stacked basis of m slots shaped like v."""
    return jax.tree.map(lambda x: jnp.zeros((m,) + x.shape, x.dtype), v)


def tree_combine(Q, coeffs):
    """sum_i coeffs[i] * Q[i] over the stacked leading axis (krylov_matmul,
    reference core/krylov_subspace.f:214-258). coeffs may be (k,) or (k, m) —
    the latter returns a stacked pytree of m combinations. Coefficients are
    cast to the basis dtype: the combination GEMM must run at the basis
    precision (f64 coeffs would otherwise promote an f32 basis to an
    emulated-f64 matmul on TPU)."""
    return jax.tree.map(
        lambda x: jnp.tensordot(jnp.asarray(coeffs, x.dtype), x,
                                axes=(0, 0),
                                precision=jax.lax.Precision.HIGHEST), Q)


@dataclass
class ArnoldiSpace:
    """Bundles the vector-space callables the algorithms need."""

    matvec: Callable            # v -> A v
    dot: Callable               # (a, b) -> scalar (global, mass-weighted)

    def __post_init__(self):
        self._cgs2 = make_cgs2(self.dot)  # compiled once per space

    def norm(self, v):
        return jnp.sqrt(self.dot(v, v))

    def normalize(self, v):
        # guarded against exact ("lucky") breakdown: with direct-factorized
        # solves the Krylov residual can vanish to machine zero, and 1/0
        # would poison the basis with NaN before GMRES sees the tolerance
        nrm = self.norm(v)
        safe = jnp.where(nrm > 0, nrm, 1.0)
        # tree_scale casts the (possibly f64) reciprocal to the leaf dtype
        return tree_scale(jnp.where(nrm > 0, 1.0 / safe, 0.0), v), nrm


def make_cgs2(dot: Callable):
    """Classical Gram-Schmidt with one full re-orthogonalization pass
    (reference update_hessenberg_matrix, core/krylov_decomposition.f:116-202).
    Jitted once; `active` masks the used columns so one compilation serves
    every Arnoldi step."""

    @jax.jit
    def cgs2(Q, w, active):
        def one_pass(w):
            h = jax.vmap(lambda q: dot(q, w))(Q) * active
            corr = tree_combine(Q, h)
            w = jax.tree.map(lambda wl, cl: wl - cl, w, corr)
            return h, w

        h1, w = one_pass(w)
        h2, w = one_pass(w)
        return h1 + h2, w

    return cgs2


def arnoldi_factorization(space: ArnoldiSpace, Q, H: np.ndarray, mstart: int,
                          mend: int, callback: Callable | None = None):
    """Extend an Arnoldi factorization from column mstart to mend (1-based
    counts, reference core/krylov_decomposition.f:7-104): on exit
        A Q[:k] = Q[:k] H[:k,:k] + H[k,k-1] Q[k] e_k^T,   k = mend.

    Q: stacked pytree with k_dim+1 slots, Q[mstart-1] holds the next start
    vector (unit norm). H: (k_dim+1, k_dim) numpy, updated in place.
    callback(m, Q, H) runs after each new column (checkpoint hook analog of
    arnoldi_checkpoint, core/krylov_decomposition.f:89).
    Returns (Q, beta) with beta the final residual norm.
    """
    cgs2 = space._cgs2
    beta = 0.0
    for m in range(mstart, mend + 1):
        w = space.matvec(tree_get(Q, m - 1))
        active = jnp.arange(Q_len(Q)) < m
        h, w = cgs2(Q, w, active.astype(leaf_dtype(Q)))
        w, beta = space.normalize(w)
        Q = tree_set(Q, m, w)
        hh = np.asarray(h, dtype=np.float64)
        H[:m, m - 1] = hh[:m]
        H[m, m - 1] = float(beta)
        if callback is not None:
            callback(m, Q, H)
    return Q, float(beta)


def _basis_prefix(Q, k: int):
    """First k slots of a stacked basis."""
    return jax.tree.map(lambda x: x[:k], Q)


def Q_len(Q) -> int:
    return jax.tree.leaves(Q)[0].shape[0]


def leaf_dtype(Q):
    return jax.tree.leaves(Q)[0].dtype
