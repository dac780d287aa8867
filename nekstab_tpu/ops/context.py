"""Device-side SEM operator context.

Bundles everything the jitted compute path needs: the 1D differentiation
matrix, geometric factors, the diagonal mass matrix, direct-stiffness
connectivity and Dirichlet masks — the TPU-native replacement for the
reference's Nek5000 geometry arrays (`bm1`, `rxm1`...) and gslib handles
(SURVEY.md L0/L1). Built once (host-side numpy, float64) from a Mesh2D and
cast to the configured device dtype.

The context is a registered pytree so it can be passed through `jax.jit`
without re-tracing per call; integer metadata (nglobal, axis_name) is static.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..mesh import Mesh2D
from ..quadrature import make_basis


@partial(jax.tree_util.register_dataclass,
         data_fields=["D", "rx", "ry", "sx", "sy", "jac", "bm", "bm_assembled",
                      "g11", "g12", "g22", "diag_a", "mask_vel", "mask_p",
                      "multinv", "maskg_vel", "maskg_p", "diag_ag", "bmg",
                      "xcoord", "ycoord", "bm_eig", "gid", "gid_flat",
                      "gs_idx", "p_schwarz", "p_defl_z", "p_defl_c",
                      "p_vfem", "p_oschwarz", "bwn", "gs2_rv",
                      "jd", "wd", "dmet", "axdiag", "rinv", "bm_adj", "p2"],
         meta_fields=["n", "nelem", "nglobal", "axis_name", "gs2_plan",
                      "hsolve", "shard_hint"])
@dataclasses.dataclass(frozen=True)
class SemContext:
    # static metadata
    n: int
    nelem: int                # local element count (per shard when sharded)
    nglobal: int
    axis_name: str | None     # shard_map axis for cross-device dssum/psum

    # device arrays, all (E, n, n) unless noted
    D: jnp.ndarray            # (n, n) differentiation matrix
    rx: jnp.ndarray
    ry: jnp.ndarray
    sx: jnp.ndarray
    sy: jnp.ndarray
    jac: jnp.ndarray
    bm: jnp.ndarray           # diagonal mass (unassembled, = w_i w_j J)
    bm_assembled: jnp.ndarray # dssum(bm)
    g11: jnp.ndarray          # stiffness geometric factors
    g12: jnp.ndarray
    g22: jnp.ndarray
    diag_a: jnp.ndarray       # assembled diagonal of the weak Laplacian
    mask_vel: jnp.ndarray     # (2, E, n, n) velocity Dirichlet masks (u, v)
    mask_p: jnp.ndarray       # (E, n, n) pressure mask (0 at outflow)
    multinv: jnp.ndarray      # 1 / dof multiplicity
    gid: jnp.ndarray          # (E, n, n) int32 global dof ids
    gid_flat: jnp.ndarray     # (L,) flattened gid (gather-scatter primitive)
    gs_idx: jnp.ndarray       # (nglobal, maxmult) copy table (ops/gslib.py)
    # global (assembled) vectors, shape (nglobal,) or (2, nglobal) — the
    # implicit solves run on these: A_g = scatter o A_local o gather is
    # Euclidean-symmetric, which makes custom_linear_solve(symmetric=True)
    # transpose exactly (the key to the machine-precision discrete adjoint)
    maskg_vel: jnp.ndarray    # (2, nglobal) velocity Dirichlet masks
    maskg_p: jnp.ndarray      # (nglobal,)
    diag_ag: jnp.ndarray      # (nglobal,) assembled weak-Laplacian diagonal
    bmg: jnp.ndarray          # (nglobal,) assembled mass diagonal
    xcoord: jnp.ndarray
    ycoord: jnp.ndarray
    bm_eig: jnp.ndarray       # inner-product weight (bm, zeroed in sponge zone
                              #  — the reference's bm1s, core/usr_extra.f:104-128)
    # two-level pressure preconditioner (ops/precond.py), or None:
    # element Schwarz pseudo-inverses + spectral-deflation coarse space
    p_schwarz: jnp.ndarray | None   # (E, n^2, n^2) element pseudo-inverses
    p_defl_z: jnp.ndarray | None    # (m, E, n, n) local / (m, G) global basis
    p_defl_c: jnp.ndarray | None    # (m, m) coarse Galerkin inverse
    # vertex-FEM (Q1) coarse level: (Jb (n^2,4), vidx, vgid, Ac_inv (NV,NV))
    p_vfem: tuple | None
    # overlapping-Schwarz patch inverses (E, P, P), P = n^2 + 4(n-2)
    # (ops/precond.build_overlap_schwarz; applied with halo_rows/halo_rows_t)
    p_oschwarz: jnp.ndarray | None
    bwn: jnp.ndarray          # (2, E, n, n) Dirichlet-face normal weights
    # structured-block gather-scatter (ops/gslib2.py): static plan tuple and
    # the (vidx, vgid) corner-vertex gather tables; None -> unstructured
    gs2_plan: tuple | None
    gs2_rv: tuple | None
    # over-integration dealiasing of advection (reference: Nek5000 lxd grid,
    # `SIZE` lxd = 3*lx1/2; SURVEY.md §2 "Dealiasing"). None -> collocation.
    jd: jnp.ndarray | None    # (m, n) GLL -> Gauss interpolation
    wd: jnp.ndarray | None    # (m, m) fine quadrature weights outer(wg, wg)
    dmet: jnp.ndarray | None  # (4|5, E, m, m) fine-grid metric polynomials
                              #  [ys, xs, yr, xr]: jac*(c.grad r) = cx ys - cy xs,
                              #  jac*(c.grad s) = -cx yr + cy xr; axisymmetric
                              #  contexts append row 4 = fine radius r
    # axisymmetric extras (None on planar meshes): extra radial-momentum
    # viscous diagonal int phi v/r (axis entries 0 — that dof is masked), the
    # safe reciprocal radius (0 on the axis) for curl-curl / vorticity, and
    # the strictly positive adjoint weight (bm with axis zeros floored)
    axdiag: jnp.ndarray | None
    rinv: jnp.ndarray | None
    bm_adj: jnp.ndarray | None
    # PN/PN-2 mesh-2 machinery (solver/proj.py): pressure on the (n-2)^2
    # Gauss grid — (j2 (n-2, n) interp, w2 (n-2, n-2) weights,
    # met2 (4, E, n-2, n-2) metric polynomials [ys, xs, yr, xr],
    # e_diag (E, n-2, n-2) diagonal of the E operator for Jacobi precond)
    p2: tuple | None = None
    # host-side sparse-direct factorized solves (hostsolve/direct.py), or
    # None -> iterative CG solves. Static: hashable by identity.
    hsolve: object | None = None
    # GSPMD anchor (jax.sharding.Mesh, element-axis name) set by
    # parallel.ShardedFlowSystem: dssum re-asserts the element sharding on
    # its operands so SPMD propagation cannot drift inside CG while-loops
    # (MULTICHIP_r02/r03 "involuntary full rematerialization" tails).
    shard_hint: tuple | None = None

    @property
    def dtype(self):
        return self.bm.dtype


def geometry_factors(mesh: Mesh2D) -> dict[str, np.ndarray]:
    """Metric terms, Jacobian, mass and stiffness factors (numpy, float64).

    Axisymmetric meshes (mesh.axisym, y = r): all quadrature factors carry the
    cylindrical measure r dx dr — bm, g11/g12/g22 are r-weighted, and `axdiag`
    holds the extra radial-momentum viscous diagonal int phi v/r dx dr
    (= int phi (v/r^2) r: the r cancels one singular power; the remaining 1/r
    diagonal is zeroed at the axis nodes, whose radial dof is masked anyway).
    Reference: Nek5000 `ifaxis` geometry (SURVEY.md §2 "Axisymmetric")."""
    basis = make_basis(mesh.n)
    D = basis.D
    x, y = mesh.x, mesh.y
    xr = np.einsum("ik,ekj->eij", D, x)
    xs = np.einsum("jl,eil->eij", D, x)
    yr = np.einsum("ik,ekj->eij", D, y)
    ys = np.einsum("jl,eil->eij", D, y)
    jac = xr * ys - xs * yr
    if np.any(jac <= 0):
        raise ValueError("non-positive Jacobian: tangled element(s)")
    rx = ys / jac
    ry = -xs / jac
    sx = -yr / jac
    sy = xr / jac
    w2 = np.outer(basis.w, basis.w)[None, :, :]
    rwt = y if mesh.axisym else np.ones_like(y)   # cylindrical radius weight
    bm = w2 * jac * rwt
    g11 = w2 * jac * rwt * (rx * rx + ry * ry)
    g12 = w2 * jac * rwt * (rx * sx + ry * sy)
    g22 = w2 * jac * rwt * (sx * sx + sy * sy)
    axdiag = rinv = bm_adj = None
    if mesh.axisym:
        on_axis = y < 1e-12 * max(np.ptp(y), 1.0)
        rsafe = np.where(on_axis, 1.0, y)
        rinv = np.where(on_axis, 0.0, 1.0 / rsafe)
        axdiag = w2 * jac * rinv
        # strictly positive adjoint weight B~: the r-weighted mass vanishes on
        # the axis, making the B-adjoint ill-defined there; replacing the axis
        # zeros with a small positive consistent value keeps the adjoint
        # propagator EXACTLY similar to the transpose (same spectrum as the
        # direct operator) while B~ ~ B everywhere the measure is nonzero
        r_floor = 0.5 * y[~on_axis].min()
        bm_adj = np.where(on_axis, w2 * jac * r_floor, bm)
    # element-local diagonal of the weak Laplacian
    diag_local = (np.einsum("ki,ekj->eij", D * D, g11)
                  + np.einsum("lj,eil->eij", D * D, g22)
                  + 2.0 * np.einsum("i,j,eij->eij", np.diag(D), np.diag(D), g12))
    return dict(D=D, rx=rx, ry=ry, sx=sx, sy=sy, jac=jac, bm=bm,
                g11=g11, g12=g12, g22=g22, diag_local=diag_local,
                axdiag=axdiag, rinv=rinv, bm_adj=bm_adj)


def _np_dssum(gid: np.ndarray, u: np.ndarray, nglobal: int) -> np.ndarray:
    g = np.zeros(nglobal)
    np.add.at(g, gid.ravel(), u.ravel())
    return g[gid]


def make_context(mesh: Mesh2D, dtype=jnp.float64, axis_name: str | None = None,
                 sponge_ramp: np.ndarray | None = None,
                 pressure_precond: bool | str = True,
                 n_deflate: int = 128,
                 nscalars: int = 0,
                 mask_t: np.ndarray | None = None,
                 dealias: bool | int = False,
                 host_direct: bool = False,
                 scheme: str = "pnpn") -> SemContext:
    """Build the device context. `sponge_ramp` (E,n,n, >=0) marks the sponge
    zone; the eigensolver inner-product weight bm_eig is zeroed wherever the
    ramp is active (reference: bm1s, core/usr_extra.f:104-128)."""
    g = geometry_factors(mesh)
    bm_assembled = _np_dssum(mesh.gid, g["bm"], mesh.nglobal)
    diag_a = _np_dssum(mesh.gid, g["diag_local"], mesh.nglobal)

    def to_global(a):
        gg = np.zeros(mesh.nglobal)
        np.add.at(gg, mesh.gid.ravel(), a.ravel())
        return gg

    def min_global(a):
        gg = np.full(mesh.nglobal, np.inf)
        np.minimum.at(gg, mesh.gid.ravel(), a.ravel())
        return gg

    # stacked component masks: velocity (+ nscalars advected scalars, which
    # ride as extra components of the state — temperature for Boussinesq)
    comp_masks = [mesh.mask_u, mesh.mask_v]
    if nscalars:
        mt = mesh.mask_t if mask_t is None else mask_t
        comp_masks += [mt] * nscalars
    mask_vel = np.stack(comp_masks)
    maskg_vel = np.stack([min_global(m) for m in comp_masks])
    maskg_p = min_global(mesh.mask_p)
    diag_ag = to_global(g["diag_local"])
    bmg = to_global(g["bm"])
    bm_eig = g["bm"].copy()
    if sponge_ramp is not None:
        bm_eig[sponge_ramp > 0] = 0.0
    dev = lambda a: jnp.asarray(a, dtype=dtype)

    from .gslib import build_gs_tables
    gs_idx = build_gs_tables(mesh.gid, mesh.nglobal)

    hsolve = None
    if host_direct:
        # host f64 direct solves operate on the assembled global-dof
        # formulation; skip the gs2 local-space plan so the stepper takes
        # that branch (hostsolve/direct.py)
        from ..hostsolve import HostDirect
        hsolve = HostDirect(
            mesh, g, maskg_p, maskg_vel, bmg,
            has_outflow=bool(mesh.has_outflow),
            axdiag_g=None if g["axdiag"] is None else to_global(g["axdiag"]))
        gs2_plan, gs2_rv = None, None
    else:
        from .gslib2 import build_plan
        gs2_plan, gs2_rv = build_plan(mesh)
        if gs2_rv is not None:
            gs2_rv = tuple(jnp.asarray(a) for a in gs2_rv)  # int tables

    # pressure_precond mode string: fine level "schwarz" (element pseudo-
    # inverses) or point Jacobi (absent), plus coarse levels "vfem"
    # (vertex-Q1 grid — the classic SEM coarse, contains every element-
    # smooth mode) and/or "defl" (spectral deflation — m lowest modes,
    # scalable psum-of-m coarse). True -> "schwarz_vfem".
    p_schwarz = p_defl_z = p_defl_c = p_vfem = p_oschwarz = None
    mode = "oschwarz_vfem" if pressure_precond is True else pressure_precond
    if mode and hsolve is None:
        from .precond import (build_overlap_schwarz, build_pressure_precond,
                              build_vertex_coarse,
                              element_laplacian_matrices)
        has_overlap = "oschwarz" in mode
        fine_schwarz = "schwarz" in mode.replace("oschwarz", "")
        if has_overlap:
            p_oschwarz = dev(build_overlap_schwarz(
                mesh, element_laplacian_matrices(g, g["D"]), maskg_p))
        if fine_schwarz or "defl" in mode:
            ps, zd, cd = build_pressure_precond(
                mesh, g, g["D"], maskg_p, bool(mesh.has_outflow),
                n_deflate=n_deflate, local_layout=gs2_plan is not None,
                deflation="defl" in mode)
            if fine_schwarz:
                p_schwarz = dev(ps)
            if "defl" in mode:
                p_defl_z, p_defl_c = dev(zd), dev(cd)
        if "vfem" in mode:
            jb, vi, vg, aci = build_vertex_coarse(
                mesh, element_laplacian_matrices(g, g["D"]),
                mask_loc=mesh.mask_p)
            p_vfem = (dev(jb), jnp.asarray(vi), jnp.asarray(vg), dev(aci))

    p2 = None
    if scheme == "pnpn2":
        # PN/PN-2 mesh-2 (the reference's lx2 = lx1-2 configuration,
        # examples/cylinder/stability/direct/SIZE): pressure on interior
        # Gauss points, metric polynomials interpolated exactly
        if mesh.axisym:
            raise NotImplementedError("pnpn2 + axisymmetric: use pnpn")
        from ..quadrature import make_dealias as _mk
        d2 = _mk(mesh.n, mesh.n - 2)
        met = np.stack([g["rx"] * g["jac"], -g["ry"] * g["jac"],
                        -g["sx"] * g["jac"], g["sy"] * g["jac"]])
        met2 = np.einsum("ai,bj,keij->keab", d2.J, d2.J, met)
        w2 = np.outer(d2.wg, d2.wg)
        from ..hostsolve.pnpn2 import build_D_sparse, e_diagonal
        D_sp = build_D_sparse(mesh, g["D"], d2.J, w2, met2)
        wdiag = (maskg_vel[:2] / bmg).reshape(-1)
        ediag = e_diagonal(D_sp, wdiag).reshape(
            (mesh.nelem, mesh.n - 2, mesh.n - 2))
        p2 = (dev(d2.J), dev(w2), dev(met2), dev(ediag))
        if hsolve is not None:
            hsolve.set_pnpn2(D_sp, wdiag, bool(mesh.has_outflow))

    jd = wd = dmet = None
    if dealias:
        from ..quadrature import make_dealias
        da = make_dealias(mesh.n, None if dealias is True else int(dealias))
        # fine-grid metric *polynomials* (exact interpolants of degree-p maps):
        # ys = rx*jac, xs = -ry*jac, yr = -sx*jac, xr = sy*jac
        met = [g["rx"] * g["jac"], -g["ry"] * g["jac"],
               -g["sx"] * g["jac"], g["sy"] * g["jac"]]
        if mesh.axisym:
            met.append(mesh.y)   # fine radius: the cylindrical measure weight
        metd = np.einsum("ai,bj,keij->keab", da.J, da.J, np.stack(met))
        jd, wd = dev(da.J), dev(np.outer(da.wg, da.wg))
        dmet = dev(metd)
    return SemContext(
        n=mesh.n, nelem=mesh.nelem, nglobal=mesh.nglobal,
        gid=jnp.asarray(mesh.gid, dtype=jnp.int32),
        gid_flat=jnp.asarray(mesh.gid.reshape(-1), dtype=jnp.int32),
        gs_idx=jnp.asarray(gs_idx),
        axis_name=axis_name,
        D=dev(g["D"]), rx=dev(g["rx"]), ry=dev(g["ry"]), sx=dev(g["sx"]),
        sy=dev(g["sy"]), jac=dev(g["jac"]), bm=dev(g["bm"]),
        bm_assembled=dev(bm_assembled), g11=dev(g["g11"]), g12=dev(g["g12"]),
        g22=dev(g["g22"]), diag_a=dev(diag_a), mask_vel=dev(mask_vel),
        mask_p=dev(mesh.mask_p), multinv=dev(1.0 / mesh.mult),
        maskg_vel=dev(maskg_vel), maskg_p=dev(maskg_p),
        diag_ag=dev(diag_ag), bmg=dev(bmg),
        p_schwarz=p_schwarz, p_defl_z=p_defl_z, p_defl_c=p_defl_c,
        p_vfem=p_vfem, p_oschwarz=p_oschwarz,
        gs2_plan=gs2_plan, gs2_rv=gs2_rv, jd=jd, wd=wd, dmet=dmet,
        axdiag=None if g["axdiag"] is None else dev(g["axdiag"]),
        rinv=None if g["rinv"] is None else dev(g["rinv"]),
        bm_adj=None if g["bm_adj"] is None else dev(g["bm_adj"]),
        bwn=dev(mesh.bwn if mesh.bwn is not None
                else np.zeros((2,) + mesh.x.shape)),
        xcoord=dev(mesh.x), ycoord=dev(mesh.y), bm_eig=dev(bm_eig),
        p2=p2, hsolve=hsolve)
