"""Host-side PN/PN-2 operator assembly: sparse divergence D and E = D W D^T.

The reference's benchmark cases run Nek5000's lx2 = lx1-2 formulation
(examples/cylinder/stability/direct/SIZE), whose pressure operator is the
consistent Poisson E = D B^-1 D^T on the discontinuous Gauss-point pressure
space. These host builders supply (a) the diagonal of E for device-side
Jacobi-preconditioned CG and (b) the sparse E itself for the splu-factorized
f64 gold path (hostsolve/direct.py).
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp


def element_D_blocks(Dm: np.ndarray, J2: np.ndarray, w2: np.ndarray,
                     met2: np.ndarray) -> np.ndarray:
    """Dense element divergence blocks (E, n2^2, 2, n^2):
    (D u)[e, q] = w2[q] * sum over velocity dofs of the interpolated
    derivative/metric combination (see solver/proj.div2)."""
    ys, xs, yr, xr = met2[0], met2[1], met2[2], met2[3]
    E, n2, _ = ys.shape
    n = Dm.shape[0]
    I = np.eye(n)
    Dr = np.kron(Dm, I)                    # (n^2, n^2), i-index derivative
    Ds = np.kron(I, Dm)
    J22 = np.kron(J2, J2)                  # (n2^2, n^2)
    wq = w2.reshape(-1)
    JDr = J22 @ Dr                         # (n2^2, n^2)
    JDs = J22 @ Ds
    blocks = np.zeros((E, n2 * n2, 2, n * n))
    f = lambda m: m.reshape(E, n2 * n2, 1)
    blocks[:, :, 0, :] = (f(ys) * JDr[None] - f(yr) * JDs[None])
    blocks[:, :, 1, :] = (-f(xs) * JDr[None] + f(xr) * JDs[None])
    return blocks * wq[None, :, None, None]


def build_D_sparse(mesh, Dm: np.ndarray, J2: np.ndarray, w2: np.ndarray,
                   met2: np.ndarray) -> sp.csr_matrix:
    """Sparse D: (E * n2^2 pressure dofs) x (2 * nglobal velocity dofs)."""
    blocks = element_D_blocks(Dm, J2, w2, met2)
    E, np2, _, nn = blocks.shape
    G = mesh.nglobal
    gid = mesh.gid.reshape(E, nn)
    rows = np.repeat(np.arange(E * np2).reshape(E, np2, 1), 2 * nn,
                     axis=2).ravel()
    cols = np.concatenate([gid[:, None, :], G + gid[:, None, :]],
                          axis=1)                      # (E, 2, nn)
    cols = np.broadcast_to(cols.reshape(E, 1, 2 * nn),
                           (E, np2, 2 * nn)).ravel()
    vals = blocks.reshape(E, np2, 2 * nn).ravel()
    D = sp.coo_matrix((vals, (rows, cols)), shape=(E * np2, 2 * G)).tocsr()
    D.sum_duplicates()
    return D


def build_E_sparse(D: sp.csr_matrix, wdiag: np.ndarray) -> sp.csr_matrix:
    """E = D W D^T with W the masked inverse assembled mass (2G diagonal)."""
    W = sp.diags(np.asarray(wdiag))
    E = (D @ W @ D.T).tocsr()
    E.sum_duplicates()
    return E


def e_diagonal(D: sp.csr_matrix, wdiag: np.ndarray) -> np.ndarray:
    """diag(E) without forming E: row-wise weighted square sums of D."""
    D2 = D.copy()
    D2.data = D2.data ** 2
    return np.asarray(D2 @ np.asarray(wdiag)).ravel()
