"""Checkpoint / restart: flow fields and Arnoldi factorizations.

Reference: per-iteration Arnoldi checkpoints as KRY* field files + ASCII
Hessenberg HES* (core/IO.f, core/eigensolvers.f:284-325, 802-905), base
flows as 64-bit BF_* files. Here: npz archives (fields + Hessenberg + crank
counter in one file), resumed bitwise-exactly — the driver-side chunked
restart loops of the reference (tools/arnoldi_loop/autorun.py) become a
resume=(Q, H, mstart) argument to krylov_schur.
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np


def save_field(path: str, u, p=None, **meta):
    """Save a velocity (and optional pressure) field with metadata
    (the reference's outpost of 64-bit BF_ files, core/newton_krylov.f:152-165)."""
    arrays = dict(u=np.asarray(u, dtype=np.float64))
    if p is not None:
        arrays["p"] = np.asarray(p, dtype=np.float64)
    arrays.update({f"meta_{k}": np.asarray(v) for k, v in meta.items()})
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, **arrays)


def load_field(path: str, dtype=None):
    """Returns (u, p_or_None, meta dict)."""
    with np.load(path) as z:
        u = z["u"]
        p = z["p"] if "p" in z else None
        meta = {k[5:]: z[k] for k in z.files if k.startswith("meta_")}
    if dtype is not None:
        u = jnp.asarray(u, dtype)
        p = None if p is None else jnp.asarray(p, dtype)
    return u, p, meta


def save_arnoldi(path: str, Q, H: np.ndarray, m: int, **meta):
    """Checkpoint an Arnoldi factorization: stacked Krylov basis (ANY vector
    pytree — plain velocity arrays, (u, T) stacks, or (u, period) tuples of
    the UPO space), Hessenberg, and the completed column count. Leaves are
    stored as Q0..Qk; reconstruct the structure at load with `like`."""
    import jax
    leaves = jax.tree.leaves(Q)
    arrays = {f"Q{i}": np.asarray(l, dtype=np.float64)
              for i, l in enumerate(leaves)}
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, H=np.asarray(H, dtype=np.float64),
                        m=np.asarray(m), nleaves=np.asarray(len(leaves)),
                        **arrays,
                        **{f"meta_{k}": np.asarray(v) for k, v in meta.items()})


def load_arnoldi(path: str, dtype=None, like=None):
    """Returns (Q, H, m, meta) ready to pass as krylov_schur(resume=...).
    `like`: an example pytree with the basis' tree structure (any stacked
    basis or single vector); omit for single-array bases (legacy files with
    a 'Q' key also load)."""
    import jax
    with np.load(path) as z:
        if "Q" in z.files:                      # legacy single-array layout
            leaves = [z["Q"]]
        else:
            leaves = [z[f"Q{i}"] for i in range(int(z["nleaves"]))]
        H = z["H"]
        m = int(z["m"])
        meta = {k[5:]: z[k] for k in z.files if k.startswith("meta_")}
    if dtype is not None:
        leaves = [jnp.asarray(l, dtype) for l in leaves]
    if like is not None:
        Q = jax.tree.unflatten(jax.tree.structure(like), leaves)
    elif len(leaves) == 1:
        Q = leaves[0]
    else:
        Q = tuple(leaves)
    return Q, H, m, meta


def make_arnoldi_checkpointer(path: str, every: int = 1, **meta):
    """Callback for arnoldi_factorization/krylov_schur: saves the current
    factorization every `every` new columns (reference arnoldi_checkpoint,
    core/krylov_decomposition.f:89 + ifres logic)."""

    def callback(m, Q, H):
        if m % every == 0:
            save_arnoldi(path, Q, H, m, **meta)

    return callback
