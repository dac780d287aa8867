"""Two-level pressure preconditioner: element Schwarz + spectral deflation.

The reference leans on Nek5000's XXT/semg coarse solvers for this, the
dominant cost of `nek_advance` (SURVEY.md §7 hard parts #1;
examples/.../1cyl.par:29 `preconditioner = semg_xxt`). TPU-native variant:

  z = sum_e R_e^T W_e A_e^+ W_e R_e r   +   Z C^{-1} Z^T r

* fine level: per-element pseudo-inverses of the local weak Laplacian
  (constant mode zeroed), applied as ONE batched (E, n^2, n^2) x (E, n^2)
  matmul — ideal MXU work;
* coarse level: SPECTRAL DEFLATION — the m lowest eigenmodes of the
  assembled pressure operator (shift-invert Lanczos at build time), applied
  as two skinny GEMMs and an (m, m) solve. This replaces a first-cut dense
  element-constant (E, E) coarse inverse, which needed an all_gather of
  per-element residuals and O(E^2) replicated memory — the deflation
  coarse costs one psum of length m across shards and is optimal per
  coarse dimension (it removes exactly the modes CG converges slowest on).

Both levels are symmetric by construction, so
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


def _assemble_sparse(mesh, A_el: np.ndarray) -> sp.csr_matrix:
    E, m, _ = A_el.shape
    gid = mesh.gid.reshape(E, m)
    rows = np.repeat(gid, m, axis=1).ravel()
    cols = np.tile(gid, (1, m)).ravel()
    A = sp.coo_matrix((A_el.ravel(), (rows, cols)),
                      shape=(mesh.nglobal, mesh.nglobal)).tocsr()
    A.sum_duplicates()
    return A


def _lowest_modes(A_ff: sp.csr_matrix, k: int) -> tuple[np.ndarray, np.ndarray]:
    """(lam, V) — k smallest-eigenvalue modes of the SPD(ish) sparse A_ff."""
    nf = A_ff.shape[0]
    k = min(k, max(nf - 3, 1))
    if nf <= 2000:
        lam, V = np.linalg.eigh(A_ff.toarray())
        return lam[:k], V[:, :k]
    from scipy.sparse.linalg import eigsh
    # shift-invert about 0: smallest eigenvalues converge fastest
    lam, V = eigsh(A_ff.tocsc(), k=k, sigma=0, which="LM")
    order = np.argsort(lam)
    return lam[order], V[:, order]


def build_pressure_precond(mesh, geom: dict, D: np.ndarray,
                           maskg_p: np.ndarray, has_outflow: bool,
                           n_deflate: int = 128, local_layout: bool = True,
                           deflation: bool = True
                           ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Returns (elem_pinv (E, n^2, n^2), Z, C_inv (m, m)).

    Z is the deflation basis in the layout the solve runs in:
    local (m, E, n, n) for the slice-exchange (gs2) path, global (m, G)
    for the assembled-dof fallback path.
    """
    A_el = element_laplacian_matrices(geom, D)
    E, msz, _ = A_el.shape
    n = geom["g11"].shape[-1]

    # per-element pseudo-inverse (zero the constant-mode eigenvalue), batched
    w, V = np.linalg.eigh(A_el)
    wmax = w[:, -1:]
    winv = np.where(w > 1e-10 * wmax, 1.0 / np.where(w == 0, 1, w), 0.0)
    elem_pinv = np.einsum("eak,ek,ebk->eab", V, winv, V)

    if not deflation:
        return elem_pinv, None, None

    # ---- spectral deflation basis --------------------------------------
    A = _assemble_sparse(mesh, A_el)
    G = mesh.nglobal
    if has_outflow:
        free = np.flatnonzero(np.asarray(maskg_p) > 0)
    else:
        free = np.arange(G)
    lam, Vf = _lowest_modes(A[free][:, free], n_deflate + 2)
    # drop (near-)nullspace modes: the enclosed-flow constant is handled by
    # the CG mean projection, not the coarse solve
    lmax = max(lam.max(), 1.0)
    keep = lam > 1e-10 * lmax
    lam, Vf = lam[keep][:n_deflate], Vf[:, keep][:, :n_deflate]
    Vg = np.zeros((G, lam.size))
    Vg[free] = Vf

    gid = mesh.gid
    if local_layout:
        # Z = W M Q V  (multiplicity-weighted masked scatter to local layout)
        mloc = (1.0 / mesh.mult) * mesh.mask_p          # (E, n, n)
        Z = np.transpose(Vg[gid], (3, 0, 1, 2)) * mloc  # (m, E, n, n)
        # Galerkin coarse matrix C = Z^T A_sym Z with
        # A_sym y = M dssum(A_loc dssum(M y)) (stepper._pressure_solver_gs2)
        def np_dssum1(u):
            g = np.zeros(G)
            np.add.at(g, gid.ravel(), u.ravel())
            return g[gid]

        mz = lam.size
        Y = np.stack([np_dssum1(mesh.mask_p * Z[i]) for i in range(mz)])
        AY = np.einsum("eab,meb->mea", A_el, Y.reshape(mz, E, msz))
        AZ = np.stack([mesh.mask_p * np_dssum1(AY[i].reshape(E, n, n))
                       for i in range(mz)])
        C = Z.reshape(mz, -1) @ AZ.reshape(mz, -1).T
    else:
        Z = (np.asarray(maskg_p)[:, None] * Vg).T        # (m, G)
        C = np.diag(lam)                                 # V orthonormal on free
    C_inv = np.linalg.pinv(C, rcond=1e-12, hermitian=True)
    return elem_pinv, Z, C_inv


def build_halo_gids(mesh) -> np.ndarray:
    """(E, 4, n-2) int32 global dof ids of each element's four halo strips —
    the edge-adjacent interior row of the side neighbour (-1 where the side
    is a physical boundary). Strip node order matches the element's own edge
    node order, so ops/gather_scatter.halo_rows produces exactly
    values[halo_gids] (verified by tests/test_precond_overlap.py).

    Side order: 0 = i- (row 0), 1 = i+ (row n-1), 2 = j- (col 0),
    3 = j+ (col n-1)."""
    gid = mesh.gid
    E, n, _ = gid.shape
    edge = np.stack([gid[:, 0, :], gid[:, -1, :],
                     gid[:, :, 0], gid[:, :, -1]], axis=1)      # (E, 4, n)
    inner = np.stack([gid[:, 1, :], gid[:, -2, :],
                      gid[:, :, 1], gid[:, :, -2]], axis=1)     # (E, 4, n)
    by_key: dict = {}
    for e in range(E):
        for s in range(4):
            key = (int(min(edge[e, s, 0], edge[e, s, -1])),
                   int(max(edge[e, s, 0], edge[e, s, -1])))
            by_key.setdefault(key, []).append((e, s))
    halo = np.full((E, 4, n - 2), -1, dtype=np.int64)
    for key, members in by_key.items():
        if len(members) != 2:
            continue          # boundary edge (1) or degenerate (>2): no halo
        (ea, sa), (eb, sb) = members
        ea_edge, eb_edge = edge[ea, sa], edge[eb, sb]
        if np.array_equal(ea_edge, eb_edge):
            halo[ea, sa] = inner[eb, sb][1:-1]
            halo[eb, sb] = inner[ea, sa][1:-1]
        elif np.array_equal(ea_edge, eb_edge[::-1]):
            halo[ea, sa] = inner[eb, sb][::-1][1:-1]
            halo[eb, sb] = inner[ea, sa][::-1][1:-1]
        else:
            raise RuntimeError("edge node-order mismatch - bad topology")
    return halo


def build_overlap_schwarz(mesh, A_el: np.ndarray,
                          maskg: np.ndarray | None = None) -> np.ndarray:
    """Overlapping additive-Schwarz patch inverses (E, P, P) with
    P = n^2 + 4(n-2): each element's patch is its own n^2 nodes plus the
    four width-one halo strips (neighbour's edge-adjacent interior row,
    corner nodes excluded). This is the minimal-overlap Schwarz of
    Fischer/Lottes SEM pressure preconditioning — the role the reference
    gets from Nek5000's semg/XXT solvers (1cyl.par:29) — here with exact
    dense patch inverses of the ASSEMBLED operator submatrix (patch count x
    52^2 fits HBM trivially at SEM sizes).

    Patch dof order: [own nodes row-major (n^2), halo side 0 (n-2), side 1,
    side 2, side 3] — matching ops/gather_scatter.halo_rows. maskg: global
    Dirichlet mask (0 rows/cols replaced by identity)."""
    E, msz, _ = A_el.shape
    n = int(round(np.sqrt(msz)))
    A = _assemble_sparse(mesh, A_el).tolil()
    if maskg is not None:
        fixed = np.flatnonzero(np.asarray(maskg) == 0)
        if fixed.size:
            A = A.tocsr()
            d = np.ones(A.shape[0])
            d[fixed] = 0.0
            Dm = sp.diags(d)
            A = (Dm @ A @ Dm + sp.diags(1.0 - d)).tolil()
    A = A.tocsr()
    halo = build_halo_gids(mesh)                          # (E, 4, n-2)
    pg = np.concatenate([mesh.gid.reshape(E, msz),
                         halo.reshape(E, -1)], axis=1)    # (E, P)
    P = pg.shape[1]
    Ainv = np.empty((E, P, P))
    for e in range(E):
        valid = pg[e] >= 0
        iv = pg[e][valid]
        Ae = np.eye(P)
        Ae[np.ix_(valid, valid)] = A[np.ix_(iv, iv)].toarray()
        Ainv[e] = np.linalg.inv(Ae)
    return Ainv


def bilinear_embed(n: int) -> np.ndarray:
    """Q1 (bilinear) embedding on the reference element: (n^2, 4) matrix
    mapping the 4 vertex values [v(0,0), v(0,1), v(1,0), v(1,1)] (the
    [::n-1, ::n-1] corner ordering) to all GLL nodes."""
    from ..quadrature import make_basis
    xi = make_basis(n).x                    # GLL points in [-1, 1]
    l0 = 0.5 * (1.0 - xi)
    l1 = 0.5 * (1.0 + xi)
    cols = [np.outer(l0, l0), np.outer(l0, l1),
            np.outer(l1, l0), np.outer(l1, l1)]
    return np.stack([c.reshape(-1) for c in cols], axis=1)


def build_vertex_coarse(mesh, A_el: np.ndarray,
                        mask_loc: np.ndarray | None = None):
    """Vertex-FEM (Q1) coarse level — the classic SEM coarse grid (the
    reference gets it from Nek5000's semg/XXT solvers, 1cyl.par:29):

      z_c = R A_c^+ R^T r,   R = (scatter vertex -> element corners) o Q1,
      A_c = R^T A R  (Galerkin on the element matrices).

    Contains all element-wise-smooth content (in particular every
    element-constant mode, which the fine Schwarz level annihilates).
    Returns (Jb (n^2, 4), vidx, vgid, Ac_inv (NV, NV)) — vertex assembly
    reuses the qsum/qcopy gather tables on the (4E,) corner slots.
    """
    import scipy.sparse as sp

    from .gslib import build_gs_tables

    E, msz, _ = A_el.shape
    n = int(round(np.sqrt(msz)))
    Jb = bilinear_embed(n)                                # (n^2, 4)
    gc = mesh.gid[:, ::n - 1, ::n - 1].reshape(-1)        # (4E,)
    verts, inv = np.unique(gc, return_inverse=True)
    NV = len(verts)
    vidx = build_gs_tables(inv.reshape(-1, 1), NV)
    vgid = inv.astype(np.int32)

    # Galerkin coarse matrix: Ac[vi, vj] += (R^T A_el R)[a, b] with the
    # Dirichlet mask folded into the prolongation R = M_e Jb — without it
    # the coarse matrix is all-Neumann singular and the pinv drops the
    # quasi-constant mode, leaving one isolated O(1e-4) eigenvalue in the
    # preconditioned spectrum (measured: kappa 1.9e5 -> the CG stalls)
    if mask_loc is not None:
        Jm = mask_loc.reshape(E, msz, 1) * Jb[None]       # (E, n^2, 4)
        Ael_c = np.einsum("eqa,eqr,erb->eab", Jm, A_el, Jm)
    else:
        Ael_c = np.einsum("qa,eqr,rb->eab", Jb, A_el, Jb)  # (E, 4, 4)
    iv = inv.reshape(E, 4)
    rows = np.repeat(iv, 4, axis=1).ravel()
    cols = np.tile(iv, (1, 4)).ravel()
    Ac = sp.coo_matrix((Ael_c.ravel(), (rows, cols)), shape=(NV, NV)).toarray()
    Ac_inv = np.linalg.pinv(Ac, rcond=1e-10, hermitian=True)
    return Jb, vidx, vgid, Ac_inv
