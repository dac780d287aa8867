"""3D element-local tensor-product SEM operators + device context.

The 3D counterpart of ops/tensorprod.py + ops/context.py (docs/DESIGN_3D.md
§1): fields are (..., E, n, n, n) with index [e, i, j, k] (r, s, t); every
derivative is one n-point contraction per direction, expressed in the same
true-f32 strategy as 2D (tensorprod.PREC / fma broadcast-reduce — the bf16
one-pass lowering that destabilized the 2D propagator applies identically).

Direct stiffness uses the gather-only qsum/qcopy primitives (ops/gslib.py)
on the flattened (E n^3) layout — correctness-first; the structured-block
slice-exchange plan generalizes later (DESIGN_3D §2). Reference: Nek5000's
lx1^3 local operators + gslib (SURVEY.md L0/L1).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..mesh3d import Mesh3D
from ..quadrature import make_basis
from .tensorprod import PREC, _FMA


# ---------------------------------------------------------------------------
# tensor-product contractions (linear in the field argument)
# ---------------------------------------------------------------------------

def deriv3_r(D: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """du/dr: contract index i: (D u)[e,i,j,k] = sum_a D[i,a] u[e,a,j,k]."""
    if _FMA:
        return jnp.sum(D[:, :, None, None] * u[..., None, :, :, :], axis=-3)
    return jnp.einsum("ia,...ajk->...ijk", D, u, precision=PREC)


def deriv3_s(D: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    if _FMA:
        return jnp.sum(D[:, :, None] * u[..., None, :, :], axis=-2)
    return jnp.einsum("ja,...iak->...ijk", D, u, precision=PREC)


def deriv3_t(D: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    if _FMA:
        return jnp.sum(u[..., :, None, :] * D, axis=-1)
    return jnp.einsum("ka,...ija->...ijk", D, u, precision=PREC)


def deriv3_r_t(D: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Transpose of deriv3_r: (D^T w)[e,a,j,k] = sum_i D[i,a] w[e,i,j,k]."""
    if _FMA:
        return jnp.sum(D[:, :, None, None] * w[..., :, None, :, :], axis=-4)
    return jnp.einsum("ia,...ijk->...ajk", D, w, precision=PREC)


def deriv3_s_t(D: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    if _FMA:
        return jnp.sum(D[:, :, None] * w[..., :, None, :], axis=-3)
    return jnp.einsum("ja,...ijk->...iak", D, w, precision=PREC)


def deriv3_t_t(D: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    if _FMA:
        return jnp.sum(w[..., :, :, None] * D[:, :], axis=-2)
    return jnp.einsum("ka,...ijk->...ija", D, w, precision=PREC)


# ---------------------------------------------------------------------------
# device context
# ---------------------------------------------------------------------------

@partial(jax.tree_util.register_dataclass,
         data_fields=["D", "dxi", "bm", "g", "diag_a", "mask_vel", "mask_p",
                      "multinv", "gid_flat", "gs_idx", "maskg_vel", "maskg_p",
                      "diag_ag", "bmg", "xcoord", "ycoord", "zcoord",
                      "bm_eig", "bwn"],
         meta_fields=["n", "nelem", "nglobal", "axis_name"])
@dataclasses.dataclass(frozen=True)
class SemContext3D:
    n: int
    nelem: int
    nglobal: int
    axis_name: str | None

    D: jnp.ndarray              # (n, n)
    dxi: jnp.ndarray            # (3, 3, E, n, n, n) inverse metrics
                                # dxi[a, b] = d r_a / d x_b
    bm: jnp.ndarray             # (E, n, n, n) diagonal mass
    g: jnp.ndarray              # (3, 3, E, n, n, n) symmetric G factors
    diag_a: jnp.ndarray         # local weak-Laplacian diagonal
    mask_vel: jnp.ndarray       # (3+s, E, n, n, n)
    mask_p: jnp.ndarray
    multinv: jnp.ndarray
    gid_flat: jnp.ndarray       # (E n^3,)
    gs_idx: jnp.ndarray         # (nglobal, maxmult)
    maskg_vel: jnp.ndarray      # (3+s, nglobal)
    maskg_p: jnp.ndarray
    diag_ag: jnp.ndarray
    bmg: jnp.ndarray
    xcoord: jnp.ndarray
    ycoord: jnp.ndarray
    zcoord: jnp.ndarray
    bm_eig: jnp.ndarray
    bwn: jnp.ndarray            # (3, E, n, n, n)

    @property
    def dtype(self):
        return self.bm.dtype


def geometry_factors3(mesh: Mesh3D) -> dict:
    """Metric terms, Jacobian, mass and stiffness factors (numpy f64)."""
    basis = make_basis(mesh.n)
    D = basis.D
    coords = np.stack([mesh.x, mesh.y, mesh.z])        # (3, E, n, n, n)
    # dx[b, a] = d x_b / d r_a
    dr = np.einsum("ia,cEajk->cEijk", D, coords)
    ds = np.einsum("ja,cEiak->cEijk", D, coords)
    dt = np.einsum("ka,cEija->cEijk", D, coords)
    J = np.stack([dr, ds, dt], axis=1)                 # (3=xb, 3=ra, E,n,n,n)
    jac = (J[0, 0] * (J[1, 1] * J[2, 2] - J[1, 2] * J[2, 1])
           - J[1, 0] * (J[0, 1] * J[2, 2] - J[0, 2] * J[2, 1])
           + J[2, 0] * (J[0, 1] * J[1, 2] - J[0, 2] * J[1, 1]))
    if np.any(jac <= 0):
        raise ValueError("non-positive Jacobian: tangled hex element(s)")
    # inverse: dxi[a, b] = d r_a / d x_b = cof(J)[b, a] / jac
    dxi = np.empty_like(J)
    for a in range(3):
        for b in range(3):
            b1, b2 = [q for q in range(3) if q != b]
            a1, a2 = [q for q in range(3) if q != a]
            cof = (J[b1, a1] * J[b2, a2] - J[b1, a2] * J[b2, a1])
            sign = (-1.0) ** (a + b)
            dxi[a, b] = sign * cof / jac
    w3 = (basis.w[:, None, None] * basis.w[None, :, None]
          * basis.w[None, None, :])[None]
    bm = w3 * jac
    # G[a, b] = w3 jac sum_c dxi[a, c] dxi[b, c]
    G = np.einsum("acEijk,bcEijk->abEijk", dxi, dxi) * bm
    # element-local diagonal of the weak Laplacian
    DD = D * D
    diag = (np.einsum("ai,Eajk->Eijk", DD, G[0, 0])
            + np.einsum("aj,Eiak->Eijk", DD, G[1, 1])
            + np.einsum("ak,Eija->Eijk", DD, G[2, 2])
            + 2.0 * np.diag(D)[None, :, None, None] * np.diag(D)[None, None, :, None] * G[0, 1]
            + 2.0 * np.diag(D)[None, :, None, None] * np.diag(D)[None, None, None, :] * G[0, 2]
            + 2.0 * np.diag(D)[None, None, :, None] * np.diag(D)[None, None, None, :] * G[1, 2])
    return dict(D=D, jac=jac, dxi=dxi, bm=bm[0] if bm.ndim == 5 else bm,
                G=G, diag_local=diag)


def make_context3d(mesh: Mesh3D, dtype=jnp.float64,
                   sponge_ramp: np.ndarray | None = None,
                   nscalars: int = 0) -> SemContext3D:
    g = geometry_factors3(mesh)
    bm = g["bm"]
    from .gslib import build_gs_tables
    gs_idx = build_gs_tables(mesh.gid, mesh.nglobal)

    def to_global(a):
        gg = np.zeros(mesh.nglobal)
        np.add.at(gg, mesh.gid.ravel(), a.ravel())
        return gg

    def min_global(a):
        gg = np.full(mesh.nglobal, np.inf)
        np.minimum.at(gg, mesh.gid.ravel(), a.ravel())
        return gg

    comp_masks = [mesh.mask_u, mesh.mask_v, mesh.mask_w]
    if nscalars:
        comp_masks += [mesh.mask_t] * nscalars
    mask_vel = np.stack(comp_masks)
    maskg_vel = np.stack([min_global(m) for m in comp_masks])
    bm_eig = bm.copy()
    if sponge_ramp is not None:
        bm_eig[sponge_ramp > 0] = 0.0
    dev = lambda a: jnp.asarray(a, dtype=dtype)
    return SemContext3D(
        n=mesh.n, nelem=mesh.nelem, nglobal=mesh.nglobal, axis_name=None,
        D=dev(g["D"]), dxi=dev(g["dxi"]), bm=dev(bm), g=dev(g["G"]),
        diag_a=dev(g["diag_local"]), mask_vel=dev(mask_vel),
        mask_p=dev(mesh.mask_p), multinv=dev(1.0 / mesh.mult),
        gid_flat=jnp.asarray(mesh.gid.reshape(-1), jnp.int32),
        gs_idx=jnp.asarray(gs_idx),
        maskg_vel=dev(maskg_vel), maskg_p=dev(min_global(mesh.mask_p)),
        diag_ag=dev(to_global(g["diag_local"])), bmg=dev(to_global(bm)),
        xcoord=dev(mesh.x), ycoord=dev(mesh.y), zcoord=dev(mesh.z),
        bm_eig=dev(bm_eig),
        bwn=dev(mesh.bwn if mesh.bwn is not None
                else np.zeros((3,) + mesh.x.shape)))


# ---------------------------------------------------------------------------
# operators
# ---------------------------------------------------------------------------

def grad3(ctx: SemContext3D, u: jnp.ndarray):
    """Physical gradient (du/dx, du/dy, du/dz) at collocation points."""
    ur = deriv3_r(ctx.D, u)
    us = deriv3_s(ctx.D, u)
    ut = deriv3_t(ctx.D, u)
    d = ctx.dxi
    return (d[0, 0] * ur + d[1, 0] * us + d[2, 0] * ut,
            d[0, 1] * ur + d[1, 1] * us + d[2, 1] * ut,
            d[0, 2] * ur + d[1, 2] * us + d[2, 2] * ut)


def weak_laplacian3(ctx: SemContext3D, u: jnp.ndarray) -> jnp.ndarray:
    """Element-local weak Laplacian via the G-factor form."""
    ur = deriv3_r(ctx.D, u)
    us = deriv3_s(ctx.D, u)
    ut = deriv3_t(ctx.D, u)
    G = ctx.g
    wr = G[0, 0] * ur + G[0, 1] * us + G[0, 2] * ut
    ws = G[0, 1] * ur + G[1, 1] * us + G[1, 2] * ut
    wt = G[0, 2] * ur + G[1, 2] * us + G[2, 2] * ut
    return (deriv3_r_t(ctx.D, wr) + deriv3_s_t(ctx.D, ws)
            + deriv3_t_t(ctx.D, wt))


def weak_div3(ctx: SemContext3D, u, v, w) -> jnp.ndarray:
    """Weak divergence functional: result_q = int (u,v,w).grad(phi_q)."""
    d, bm = ctx.dxi, ctx.bm
    fr = bm * (d[0, 0] * u + d[0, 1] * v + d[0, 2] * w)
    fs = bm * (d[1, 0] * u + d[1, 1] * v + d[1, 2] * w)
    ft = bm * (d[2, 0] * u + d[2, 1] * v + d[2, 2] * w)
    return (deriv3_r_t(ctx.D, fr) + deriv3_s_t(ctx.D, fs)
            + deriv3_t_t(ctx.D, ft))


def convect3(ctx: SemContext3D, c: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """(c . grad) u for stacked fields u (m, E, n, n, n), velocity c
    (3, E, n, n, n). Collocation form (3D over-integration: future work)."""
    gx, gy, gz = grad3(ctx, u)
    return c[0] * gx + c[1] * gy + c[2] * gz


def curl3(ctx: SemContext3D, u: jnp.ndarray) -> jnp.ndarray:
    """Vorticity vector (3, E, n, n, n) of velocity u (3, E, n, n, n)."""
    _, uy, uz = grad3(ctx, u[0])
    vx, _, vz = grad3(ctx, u[1])
    wx, wy, _ = grad3(ctx, u[2])
    return jnp.stack([wy - vz, uz - wx, vx - uy])


# ---------------------------------------------------------------------------
# direct stiffness (gather-only) + reductions
# ---------------------------------------------------------------------------

def assemble3(ctx: SemContext3D, u: jnp.ndarray) -> jnp.ndarray:
    from .gslib import qsum
    lead = u.shape[:-4]
    return qsum(u.reshape(lead + (-1,)), ctx.gs_idx, ctx.gid_flat)


def scatter3(ctx: SemContext3D, g: jnp.ndarray) -> jnp.ndarray:
    from .gslib import qcopy
    loc = qcopy(g, ctx.gs_idx, ctx.gid_flat)
    return loc.reshape(g.shape[:-1] + ctx.bm.shape[-4:])


def dssum3(ctx: SemContext3D, u: jnp.ndarray) -> jnp.ndarray:
    return scatter3(ctx, assemble3(ctx, u))


def glsc3_3d(ctx: SemContext3D, a, w, b):
    return jnp.sum(a * w * b)
