"""Checkpoint/restart and spectra-file tests: a checkpointed Arnoldi run
resumed mid-factorization must reproduce the uninterrupted run bitwise
(SURVEY.md §5 checkpoint/resume)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from nekstab_tpu.algorithms.arnoldi import (ArnoldiSpace,
                                            arnoldi_factorization,
                                            tree_alloc, tree_set)
from nekstab_tpu.algorithms.eigensolve import krylov_schur
from nekstab_tpu.config import ArnoldiConfig
from nekstab_tpu.io import (AsciiSeries, load_arnoldi, load_field,
                            make_arnoldi_checkpointer, save_arnoldi,
                            save_field, write_spectre)


def _space(n=20, seed=0):
    rng = np.random.default_rng(seed)
    A = jnp.asarray(np.eye(n) * 0.5 + 0.2 * rng.normal(size=(n, n)))
    return ArnoldiSpace(matvec=lambda v: A @ v,
                        dot=lambda a, b: jnp.vdot(a, b)), rng


def test_field_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    u = rng.normal(size=(2, 4, 5, 5))
    p = rng.normal(size=(4, 5, 5))
    path = str(tmp_path / "BF_test.npz")
    save_field(path, u, p, re=50.0, time=12.5)
    u2, p2, meta = load_field(path)
    assert np.array_equal(u, u2)
    assert np.array_equal(p, p2)
    assert float(meta["re"]) == 50.0


def test_arnoldi_checkpoint_resume_bitwise(tmp_path):
    space, rng = _space()
    v0 = jnp.asarray(rng.normal(size=20))
    v0, _ = space.normalize(v0)
    k = 10

    # uninterrupted run
    Q = tree_alloc(v0, k + 1)
    Q = tree_set(Q, 0, v0)
    H = np.zeros((k + 1, k))
    Q, _ = arnoldi_factorization(space, Q, H, 1, k)

    # checkpointed at column 5, then resumed
    path = str(tmp_path / "KRY.npz")
    Q2 = tree_alloc(v0, k + 1)
    Q2 = tree_set(Q2, 0, v0)
    H2 = np.zeros((k + 1, k))
    Q2, _ = arnoldi_factorization(space, Q2, H2, 1, 5,
                                  callback=make_arnoldi_checkpointer(path))
    Qr, Hr, m, _ = load_arnoldi(path)
    assert m == 5
    Q3 = jnp.asarray(Qr)
    H3 = np.zeros((k + 1, k))
    H3[:, :] = Hr
    Q3, _ = arnoldi_factorization(space, Q3, H3, 6, k)

    assert np.array_equal(np.asarray(Q), np.asarray(Q3))
    assert np.array_equal(H, H3)


def test_krylov_schur_resume(tmp_path):
    space, rng = _space(seed=3)
    v0 = jnp.asarray(rng.normal(size=20))
    cfg = ArnoldiConfig(k_dim=12, eigen_tol=1e-8, schur_tgt=0)
    path = str(tmp_path / "KRY.npz")
    full = krylov_schur(space, v0, cfg, logger=lambda *a, **k: None)
    # redo with a checkpoint at column 7 and resume
    v0n, _ = space.normalize(v0)
    Q = tree_alloc(v0n, 13)
    Q = tree_set(Q, 0, v0n)
    H = np.zeros((13, 12))
    arnoldi_factorization(space, Q, H, 1, 7,
                          callback=make_arnoldi_checkpointer(path))
    resumed = krylov_schur(space, None, cfg,
                           resume=load_arnoldi(path)[:3],
                           logger=lambda *a, **k: None)
    assert np.allclose(np.sort_complex(full.evals),
                       np.sort_complex(resumed.evals), atol=1e-12)


def test_spectra_files(tmp_path):
    mults = np.array([0.9 + 0.1j, 0.5 - 0.2j])
    ns = np.log(mults) / 1.0
    res = np.array([1e-9, 1e-3])
    paths = write_spectre(str(tmp_path), "d", mults, ns, res, tol=1e-6)
    h = np.loadtxt(paths["H"])
    assert h.shape == (2, 3)
    conv = np.loadtxt(paths["conv"])
    assert conv.ndim == 1 and len(conv) == 2  # single converged mode row
    series = AsciiSeries(str(tmp_path / "residu.dat"), header="t res")
    series.append(0.1, 1e-3)
    series.append(0.2, 1e-4)
    data = np.loadtxt(str(tmp_path / "residu.dat"))
    assert data.shape == (2, 2)


def test_arnoldi_checkpoint_pytree(tmp_path):
    """Pytree bases (e.g. the UPO (u, period) tuples) checkpoint/resume."""
    import jax
    import jax.numpy as jnp
    from nekstab_tpu.io.checkpoint import load_arnoldi, save_arnoldi

    Q = (jnp.arange(24.0).reshape(4, 6), jnp.asarray([1.0, 2.0, 3.0, 4.0]))
    H = np.arange(12.0).reshape(4, 3)
    save_arnoldi(tmp_path / "k.npz", Q, H, 2, tau=0.5)
    Q2, H2, m, meta = load_arnoldi(tmp_path / "k.npz", dtype=jnp.float64,
                                   like=Q)
    assert m == 2 and float(meta["tau"]) == 0.5
    assert jax.tree.structure(Q2) == jax.tree.structure(Q)
    for a, b in zip(jax.tree.leaves(Q2), jax.tree.leaves(Q)):
        assert np.array_equal(np.asarray(a), np.asarray(b))
