"""Two-level additive Schwarz preconditioner for the pressure Poisson solve.

The reference leans on Nek5000's XXT/semg coarse solvers for this, the
dominant cost of `nek_advance` (SURVEY.md §7 hard parts #1;
examples/.../1cyl.par:29 `preconditioner = semg_xxt`). TPU-native variant:

  z = sum_e R_e^T W_e A_e^+ W_e R_e r   +   P A_c^{-1} P^T r

* fine level: per-element pseudo-inverses of the local weak Laplacian
  (constant mode zeroed), applied as ONE batched (E, n^2, n^2) x (E, n^2)
  matmul — ideal MXU work;
* coarse level: element-constant space, A_c = P^T A P (E x E) factorized
  host-side once (scipy pinv) and applied as a dense matmul;
* W_e = diag(1/multiplicity) weighting keeps the operator symmetric, so
  custom_linear_solve(symmetric=True) stays exactly transposable.

Built host-side (numpy/scipy) from the element matrices; applied on device.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse as sp


def element_laplacian_matrices(geom: dict, D: np.ndarray) -> np.ndarray:
    """Dense element stiffness matrices (E, n^2, n^2) of the weak Laplacian
    in the [e, i*n+j] flattening (matches fields reshaped (E, n*n))."""
    g11, g12, g22 = geom["g11"], geom["g12"], geom["g22"]
    E, n, _ = g11.shape
    I = np.eye(n)
    # Dr acts on i index: Dr_flat = kron(D, I); Ds on j: kron(I, D)
    Dr = np.kron(D, I)
    Ds = np.kron(I, D)
    f11 = g11.reshape(E, n * n)
    f12 = g12.reshape(E, n * n)
    f22 = g22.reshape(E, n * n)
    A = (np.einsum("ka,ek,kb->eab", Dr, f11, Dr)
         + np.einsum("ka,ek,kb->eab", Dr, f12, Ds)
         + np.einsum("ka,ek,kb->eab", Ds, f12, Dr)
         + np.einsum("ka,ek,kb->eab", Ds, f22, Ds))
    return A


def build_pressure_precond(mesh, geom: dict, D: np.ndarray
                           ) -> tuple[np.ndarray, np.ndarray]:
    """Returns (elem_pinv (E, n^2, n^2), coarse_inv (E, E))."""
    A_el = element_laplacian_matrices(geom, D)
    E, m, _ = A_el.shape

    # per-element pseudo-inverse (zero the constant-mode eigenvalue), batched
    w, V = np.linalg.eigh(A_el)
    wmax = w[:, -1:]
    winv = np.where(w > 1e-10 * wmax, 1.0 / np.where(w == 0, 1, w), 0.0)
    elem_pinv = np.einsum("eak,ek,ebk->eab", V, winv, V)

    # assembled sparse A and coarse space P (multiplicity-weighted indicators)
    gid = mesh.gid.reshape(E, m)
    multinv = (1.0 / mesh.mult).reshape(E, m)
    rows = np.repeat(gid, m, axis=1).ravel()
    cols = np.tile(gid, (1, m)).ravel()
    vals = A_el.ravel()
    A = sp.coo_matrix((vals, (rows, cols)),
                      shape=(mesh.nglobal, mesh.nglobal)).tocsr()
    P = sp.coo_matrix((multinv.ravel(),
                       (gid.ravel(), np.repeat(np.arange(E), m))),
                      shape=(mesh.nglobal, E)).tocsr()
    Ac = (P.T @ A @ P).toarray()
    coarse_inv = np.linalg.pinv(Ac, rcond=1e-10)
    return elem_pinv, coarse_inv
