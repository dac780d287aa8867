"""Host-side sparse-direct factorized solves (the f64 accuracy path).

The reference's gold eigenvalues were produced on CPUs in f64 with Nek5000's
XXT *direct* coarse solves (SURVEY.md §7 hard part #1; 1cyl.par
`preconditioner = semg_xxt`). The TPU chip has no usable f64 (matmul is
emulated at ~1e-9 and compiles for minutes), so the framework carries a host
twin of the implicit solves: the assembled pressure-Poisson and velocity-
Helmholtz operators are factorized ONCE with SuperLU (scipy.splu) and applied
inside the *unchanged* jitted stepper through `jax.pure_callback` wrapped in
`lax.custom_linear_solve(symmetric=True)` — so

  * the discretization is byte-for-byte the same code path as the CG mode
    (same weak forms, masks, splitting),
  * `jax.linear_transpose` still yields the exact discrete adjoint (the
    transpose of a symmetric solve is the same solve), and
  * each implicit solve is exact to machine f64, removing the CG-tolerance
    noise floor from eigenvalue matvecs (~100x faster than f64 CG on 2 host
    cores at the reference-mesh size: a 72k-dof 2D factor is ~1 s, a solve
    ~10 ms).

Used by the gold-value pipelines (examples/cylinder_reference_gold.py) and
any case needing f64 Newton/eigensolves beyond the TPU's f32 floor.
"""

from __future__ import annotations

import numpy as np


class HostDirect:
    """Factorized host solves for one discretization (one mesh + masks).

    Built inside `make_context(host_direct=True)`; stored as a static
    (meta) field of the SemContext so jitted programs can close over its
    callback methods. Hashable by identity, as required for jit caching.
    """

    _MAX_FACTORS = 24   # FIFO cap (traced-dt Newton can mint many keys)

    def __init__(self, mesh, geom: dict, maskg_p: np.ndarray,
                 maskg_vel: np.ndarray, bmg: np.ndarray, has_outflow: bool,
                 axdiag_g: np.ndarray | None = None):
        import scipy.sparse as sp
        from scipy.sparse.linalg import splu

        from ..ops.precond import element_laplacian_matrices

        A_el = element_laplacian_matrices(geom, geom["D"])
        E, m, _ = A_el.shape
        gid = mesh.gid.reshape(E, m)
        rows = np.repeat(gid, m, axis=1).ravel()
        cols = np.tile(gid, (1, m)).ravel()
        A = sp.coo_matrix((A_el.ravel(), (rows, cols)),
                          shape=(mesh.nglobal, mesh.nglobal)).tocsr()
        A.sum_duplicates()
        self._sp, self._splu = sp, splu
        self.A = A
        self.bmg = np.asarray(bmg, np.float64)
        self.axdiag_g = None if axdiag_g is None \
            else np.asarray(axdiag_g, np.float64)
        self.maskg_vel = np.asarray(maskg_vel)
        self.nglobal = mesh.nglobal

        # pressure operator: Dirichlet rows masked out at outflow; enclosed
        # (all-Neumann) problems pin dof 0 — callers project the mean, which
        # reproduces the CG+projection solution exactly (constant shifts are
        # annihilated by grad(p) downstream anyway)
        if has_outflow:
            pfree = np.flatnonzero(np.asarray(maskg_p) > 0)
        else:
            pfree = np.arange(1, mesh.nglobal)
        self._pfree = pfree
        self._plu = splu(A[pfree][:, pfree].tocsc())
        self._hfree = [np.flatnonzero(self.maskg_vel[c] > 0)
                       for c in range(self.maskg_vel.shape[0])]
        self._hcache: dict = {}

    # ------------------------------------------------------------------
    def solve_p(self, b):
        """Pressure Poisson solve on the free global dofs; b: (nglobal,)."""
        b = np.asarray(b)
        x = np.zeros_like(b)
        x[self._pfree] = self._plu.solve(b[self._pfree])
        return x

    # ------------------------------------------------------------------
    def set_pnpn2(self, D_sp, wdiag: np.ndarray, has_outflow: bool):
        """Factorize the PN/PN-2 pressure operator E = D W D^T
        (hostsolve/pnpn2.py). Enclosed flows pin one pressure dof (the
        nullspace is the global constant); callers project the mean."""
        from .pnpn2 import build_E_sparse
        self.D_sp = D_sp            # kept for the assembled steady Jacobian
        self.wdiag = np.asarray(wdiag)
        E = build_E_sparse(D_sp, wdiag)
        npd = E.shape[0]
        efree = np.arange(npd) if has_outflow else np.arange(1, npd)
        self._efree = efree
        self._elu = self._splu(E[efree][:, efree].tocsc())

    def solve_e(self, b):
        b = np.asarray(b)
        shp = b.shape
        bf = b.reshape(-1)
        x = np.zeros_like(bf)
        x[self._efree] = self._elu.solve(bf[self._efree])
        return x.reshape(shp)

    # ------------------------------------------------------------------
    def _helm_factor(self, comp: int, nu: float, g0dt: float):
        key = (comp, nu, g0dt)
        lu_free = self._hcache.get(key)
        if lu_free is None:
            sp = self._sp
            H = nu * self.A + sp.diags(g0dt * self.bmg)
            if comp == 1 and self.axdiag_g is not None:
                H = H + sp.diags(nu * self.axdiag_g)
            free = self._hfree[comp]
            lu_free = (self._splu(H[free][:, free].tocsc()), free)
            if len(self._hcache) >= self._MAX_FACTORS:
                self._hcache.pop(next(iter(self._hcache)))
            self._hcache[key] = lu_free
        return lu_free

    def make_helm_fn(self, nus: tuple):
        """Host callback (rhs (ncomp, G), g0dt ()) -> solution, factorizing
        lazily per (component, nu, g0/dt) — the BDF startup ramp visits three
        g0 values; traced-dt (UPO) paths refactorize per dt under a FIFO cap."""

        def hfn(rhs, g0dt):
            rhs = np.asarray(rhs)
            g0dt = float(np.asarray(g0dt))
            out = np.zeros_like(rhs)
            for c in range(rhs.shape[0]):
                lu, free = self._helm_factor(c, float(nus[c]), g0dt)
                out[c, free] = lu.solve(rhs[c, free])
            return out

        return hfn
