"""Property tests of the operator-agnostic algorithm layer on small dense
operators (SURVEY.md §4: Arnoldi residual identity, GMRES vs dense solve)."""

import jax.numpy as jnp
import numpy as np
import pytest

from nekstab_tpu.algorithms.arnoldi import (ArnoldiSpace,
                                            arnoldi_factorization, tree_alloc,
                                            tree_set)
from nekstab_tpu.algorithms.eigensolve import krylov_schur, power_iteration
from nekstab_tpu.algorithms.gmres import gmres
from nekstab_tpu.algorithms.newton import newton_krylov
from nekstab_tpu.config import ArnoldiConfig


def _dense_space(A):
    Aj = jnp.asarray(A)
    return ArnoldiSpace(matvec=lambda v: Aj @ v,
                        dot=lambda a, b: jnp.vdot(a, b))


def test_arnoldi_identity():
    rng = np.random.default_rng(0)
    n, k = 12, 8
    A = rng.normal(size=(n, n))
    space = _dense_space(A)
    v0 = jnp.asarray(rng.normal(size=n))
    v0, _ = space.normalize(v0)
    Q = tree_alloc(v0, k + 1)
    Q = tree_set(Q, 0, v0)
    H = np.zeros((k + 1, k))
    Q, beta = arnoldi_factorization(space, Q, H, 1, k)
    Qk = np.asarray(Q)[:k].T          # (n, k)
    qk1 = np.asarray(Q)[k]
    # A Q_k = Q_k H_k + beta q_{k+1} e_k^T
    lhs = A @ Qk
    rhs = Qk @ H[:k, :k]
    rhs[:, -1] += H[k, k - 1] * qk1
    assert np.allclose(lhs, rhs, atol=1e-10)
    # orthonormal basis (CGS2)
    G = np.asarray(Q)[: k + 1] @ np.asarray(Q)[: k + 1].T
    assert np.allclose(G, np.eye(k + 1), atol=1e-12)
    assert beta == pytest.approx(H[k, k - 1])


def _matrix_with_spectrum():
    """Nonsymmetric matrix with known leading complex pair + real eigs."""
    rng = np.random.default_rng(1)
    n = 24
    blocks = [np.array([[0.9, 0.55], [-0.55, 0.9]])]  # |lam| ~ 1.054
    vals = [0.95, -0.8, 0.6, 0.5]
    D = np.zeros((n, n))
    D[:2, :2] = blocks[0]
    for i, v in enumerate(vals):
        D[2 + i, 2 + i] = v
    D[6:, 6:] = np.diag(rng.uniform(-0.3, 0.3, n - 6))
    V = rng.normal(size=(n, n))
    A = V @ D @ np.linalg.inv(V)
    return A


def test_krylov_schur_dense():
    A = _matrix_with_spectrum()
    exact = np.linalg.eigvals(A)
    exact = exact[np.argsort(-np.abs(exact))]
    space = _dense_space(A)
    rng = np.random.default_rng(2)
    v0 = jnp.asarray(rng.normal(size=A.shape[0]))
    cfg = ArnoldiConfig(k_dim=14, eigen_tol=1e-9, schur_tgt=4, maxmodes=6,
                        max_restarts=40)
    res = krylov_schur(space, v0, cfg, logger=lambda *a, **k: None)
    assert res.converged
    got = res.evals[np.argsort(-np.abs(res.evals))][:4]
    for g, e in zip(got, exact[:4]):
        assert abs(g - e) < 1e-7, (got[:4], exact[:4])


def test_krylov_schur_one_shot():
    A = _matrix_with_spectrum()
    exact = np.linalg.eigvals(A)
    exact = exact[np.argsort(-np.abs(exact))]
    space = _dense_space(A)
    v0 = jnp.asarray(np.random.default_rng(3).normal(size=A.shape[0]))
    cfg = ArnoldiConfig(k_dim=24, eigen_tol=1e-8, schur_tgt=0)
    res = krylov_schur(space, v0, cfg, logger=lambda *a, **k: None)
    got = res.evals[np.argsort(-np.abs(res.evals))][:2]
    assert np.allclose(np.sort_complex(got), np.sort_complex(exact[:2]),
                       atol=1e-7)


def test_gmres_vs_dense():
    rng = np.random.default_rng(4)
    n = 30
    A = np.eye(n) + 0.1 * rng.normal(size=(n, n))
    b = rng.normal(size=n)
    space = _dense_space(A)
    x, info = gmres(space, jnp.asarray(b), ksize=15, rtol=1e-10,
                    max_outer=20, logger=lambda *a, **k: None)
    assert info["converged"]
    assert np.allclose(np.asarray(x), np.linalg.solve(A, b), atol=1e-8)


def test_gmres_restarted_with_x0():
    rng = np.random.default_rng(5)
    n = 20
    A = np.eye(n) + 0.1 * rng.normal(size=(n, n))
    b = rng.normal(size=n)
    x0 = jnp.asarray(rng.normal(size=n))
    space = _dense_space(A)
    x, info = gmres(space, jnp.asarray(b), ksize=5, x0=x0, rtol=1e-9,
                    max_outer=30, logger=lambda *a, **k: None)
    assert info["converged"]
    assert np.allclose(np.asarray(x), np.linalg.solve(A, b), atol=1e-7)


def test_newton_krylov_small():
    # fixed point of Phi(q) = 0.3*tanh(M q) + c  -> F(q) = Phi(q) - q
    rng = np.random.default_rng(6)
    n = 8
    M = jnp.asarray(rng.normal(size=(n, n)))
    c = jnp.asarray(rng.normal(size=n))

    def phi(q):
        return 0.3 * jnp.tanh(M @ q) + c

    def residual(q):
        return phi(q) - q

    def jac_mv(q):
        import jax
        return lambda v: jax.jvp(residual, (q,), (v,))[1]

    res = newton_krylov(residual, jac_mv, lambda a, b: jnp.vdot(a, b),
                        jnp.zeros(n), tol=1e-12, maxiter=20, k_dim=8,
                        logger=lambda *a, **k: None)
    assert res.converged
    assert np.allclose(np.asarray(phi(res.q)), np.asarray(res.q), atol=1e-11)


def test_power_iteration():
    rng = np.random.default_rng(7)
    n = 16
    A = rng.normal(size=(n, n))
    A = A + A.T  # symmetric: power iteration converges to dominant
    lam_exact = np.linalg.eigvalsh(A)
    dom = lam_exact[np.argmax(np.abs(lam_exact))]
    space = _dense_space(A)
    lam, v = power_iteration(space, jnp.asarray(rng.normal(size=n)),
                             nsteps=200, logger=lambda *a, **k: None)
    assert lam == pytest.approx(dom, rel=1e-6)


def test_newton_upo_machinery():
    # machinery smoke test on a tiny cavity: shapes, jvp-through-propagator,
    # extended-vector GMRES (physics validation needs a real shedding orbit)
    import jax.numpy as jnp
    from nekstab_tpu.algorithms.upo import newton_upo
    from nekstab_tpu.config import NSConfig
    from nekstab_tpu.mesh import box_mesh
    from nekstab_tpu.driver import FlowSystem
    from nekstab_tpu.utils import add_noise

    mesh = box_mesh(4, 2, 2, 0.0, 1.0, 0.0, 1.0, bc_fn=lambda x, y, n: "W")
    cfg = NSConfig(re=100.0, dt=1e-2, vtol=1e-8, ptol=1e-7, vmaxit=60,
                   pmaxit=80)
    sys_ = FlowSystem(mesh, cfg, None)
    u0 = add_noise(sys_.ctx, seed=5, amp=1e-3)
    res = newton_upo(sys_, u0, T0=0.05, nsteps=5, tol=1e-30, maxiter=2,
                     k_dim=6, logger=lambda *a, **k: None)
    assert res.niter == 2
    assert res.u.shape == u0.shape
    assert np.isfinite(res.residuals).all()
    assert res.period > 0


def test_sorted_schur_robust():
    """DTRSEN-backed sorted Schur (VERDICT r3 Weak #3: scipy's sort=...
    re-validation raised LinAlgError in cavity_stability): valid factorization
    with the |lambda| >= cut cluster leading, for random Hessenberg inputs."""
    from nekstab_tpu.algorithms.eigensolve import (_schur_block_eigs,
                                                   sorted_schur)
    rng = np.random.default_rng(7)
    for _ in range(50):
        k = int(rng.integers(4, 32))
        H = np.triu(rng.standard_normal((k, k)), -1)
        mods = np.sort(np.abs(np.linalg.eigvals(H)))[::-1]
        m_want = int(rng.integers(1, k))
        cut = 0.5 * (mods[m_want - 1] + mods[min(m_want, k - 1)])
        T, Z, m = sorted_schur(H, cut)
        assert np.allclose(Z @ T @ Z.T, H,
                           atol=1e-10 * max(1.0, np.abs(H).max()))
        assert np.allclose(Z.T @ Z, np.eye(k), atol=1e-12)
        ev = _schur_block_eigs(T)
        if 0 < m < k:
            assert np.abs(ev[:m]).min() >= np.abs(ev[m:]).max() - 1e-8
