"""Block Arnoldi / block Krylov-Schur (algorithms/block_arnoldi.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nekstab_tpu.algorithms import (ArnoldiSpace, block_krylov_schur,
                                    krylov_schur)
from nekstab_tpu.algorithms.block_arnoldi import (_block_qr,
                                                  block_arnoldi_factorization,
                                                  make_block_cgs2)
from nekstab_tpu.algorithms.arnoldi import tree_alloc, _basis_prefix
from nekstab_tpu.config import ArnoldiConfig


def make_operator(n=60, seed=0):
    rng = np.random.default_rng(seed)
    # nonnormal matrix with a known dominant complex pair
    A = rng.standard_normal((n, n)) * 0.05
    A[0, 0] = A[1, 1] = 1.02 * np.cos(0.3)
    A[0, 1] = 1.02 * np.sin(0.3)
    A[1, 0] = -1.02 * np.sin(0.3)
    A = jnp.asarray(A)
    space = ArnoldiSpace(matvec=lambda v: A @ v,
                         dot=lambda a, b: jnp.vdot(a, b))
    return np.asarray(A), space


def test_block_factorization_identity():
    A, space = make_operator()
    b, jmax = 3, 8
    k = jmax * b
    rng = np.random.default_rng(1)
    V0 = jnp.asarray(rng.standard_normal((b, A.shape[0])))
    V0n, _ = _block_qr(space, V0)
    Q = tree_alloc(V0n[0], k + b)
    Q = Q.at[:b].set(V0n)
    H = np.zeros((k + b, k))
    mvb = jax.vmap(space.matvec)
    Q, H = block_arnoldi_factorization(space, mvb, Q, H, 1, jmax, b)
    Qn = np.asarray(Q)
    # orthonormality
    G = Qn[:k] @ Qn[:k].T
    assert np.max(np.abs(G - np.eye(k))) < 1e-10
    # factorization identity A Q_k = Q_{k+b} Hbar
    lhs = A @ Qn[:k].T
    rhs = Qn[:k + b].T @ H
    assert np.max(np.abs(lhs - rhs)) < 1e-9


@pytest.mark.parametrize("b", [2, 4])
def test_block_ks_matches_scalar(b):
    A, space = make_operator()
    rng = np.random.default_rng(2)
    cfg = ArnoldiConfig(k_dim=24, eigen_tol=1e-8, schur_tgt=2,
                        max_restarts=12, maxmodes=4)
    v0 = jnp.asarray(rng.standard_normal(A.shape[0]))
    ks = krylov_schur(space, v0, cfg, logger=lambda *_: None)
    V0 = jnp.asarray(rng.standard_normal((b, A.shape[0])))
    mvb = jax.vmap(space.matvec)
    bks = block_krylov_schur(space, mvb, V0, cfg, block=b,
                             logger=lambda *_: None)
    assert bks.converged
    lam_s = ks.evals[np.argsort(-np.abs(ks.evals))][:2]
    lam_b = bks.evals[np.argsort(-np.abs(bks.evals))][:2]
    ref = np.linalg.eigvals(A)
    ref = ref[np.argsort(-np.abs(ref))][:2]
    assert np.max(np.abs(np.sort_complex(lam_b) - np.sort_complex(ref))) < 1e-7
    assert np.max(np.abs(np.sort_complex(lam_b) - np.sort_complex(lam_s))) < 1e-7


def test_block_propagator_matches_scalar():
    from nekstab_tpu.models.cylinder import cylinder_system, freestream_ic
    from nekstab_tpu.utils import add_noise
    sys_ = cylinder_system(n=4, dt=5e-3, nq=4, n_ring=3, nx_left=3,
                           nx_right=5, ny_side=3, vtol=1e-11, ptol=1e-10)
    base = freestream_ic(sys_)
    space = sys_.direct_space(base, 3)
    _, mvb = sys_.direct_space_block(base, 3)
    V = jnp.stack([add_noise(sys_.ctx, seed=s) for s in (1, 2, 3)])
    W = mvb(V)
    for i in range(3):
        wi = space.matvec(V[i])
        # vmapped CG iterates until every lane converges, so the batched
        # solution differs from per-vector solves at solver-tolerance level
        assert float(jnp.max(jnp.abs(W[i] - wi))) < 1e-9
