"""3D spectral-element meshes (hex elements, lx1^3 GLL nodes).

The reference reaches 3D through Nek5000's lx1^3 hexes (SURVEY.md §0: the
Nek5000 fork supplies the SEM layer; e.g. the tpjet / flip-flop 3D example
variants). This module is the 3D counterpart of mesh.py: host-side numpy
preprocessing producing a static Mesh3D consumed by ops/sem3d.make_context3d.

Scope (docs/DESIGN_3D.md §1/§6): trilinear (affine-face) hex elements from a
structured box generator with per-face BC tagging and periodic directions —
the discretization family every 3D gold check here needs (3D Taylor-Green,
periodic channel/duct, jet-in-box). Curved 3D ingestion (.re2 v3) rides on
the same Mesh3D contract later.

Face order convention: face index f in 0..5 = (r-, r+, s-, s+, t-, t+),
i.e. node-index axis (i, j, k) minimal/maximal slabs.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import numpy as np

from .quadrature import make_basis

FACE_SLICES = (
    (0, 0), (0, -1), (1, 0), (1, -1), (2, 0), (2, -1),
)


def _face_index(f: int):
    """(axis, side-index) of face f for numpy slicing on (E, n, n, n)."""
    ax, s = FACE_SLICES[f]
    idx = [slice(None)] * 3
    idx[ax] = s
    return ax, tuple(idx)


@dataclass
class BoundaryFace3:
    elem: int
    face: int          # 0..5 = (r-, r+, s-, s+, t-, t+)
    tag: str           # BC tag: 'V' Dirichlet, 'W' wall, 'O' outflow, ...
    normal: np.ndarray  # (3,) outward unit normal


@dataclass
class Mesh3D:
    """Fully preprocessed 3D SEM mesh (all numpy, static)."""

    n: int
    nelem: int
    x: np.ndarray              # (E, n, n, n)
    y: np.ndarray
    z: np.ndarray
    gid: np.ndarray            # (E, n, n, n) int32 global dof ids
    nglobal: int
    mult: np.ndarray           # (E, n, n, n) dof multiplicity
    mask_u: np.ndarray         # (E, n, n, n) 1 free / 0 Dirichlet (u_x)
    mask_v: np.ndarray
    mask_w: np.ndarray
    mask_p: np.ndarray         # 0 where pressure pinned (outflow)
    mask_t: np.ndarray | None
    has_outflow: bool
    bc_faces: list[BoundaryFace3] = field(default_factory=list)
    # surface-quadrature outward-normal weights on Dirichlet faces
    # (3, E, n, n, n): sum(q * (bwn . u)) = oint q (u . n) dS over V/W faces
    bwn: np.ndarray | None = None

    @property
    def shape(self) -> tuple[int, int, int, int]:
        return (self.nelem, self.n, self.n, self.n)


def _global_numbering3(x, y, z, periodic_map, tol):
    xx, yy, zz = (x, y, z) if periodic_map is None else periodic_map(x, y, z)
    key = np.stack([np.round(xx / tol), np.round(yy / tol),
                    np.round(zz / tol)], axis=-1)
    _, gid = np.unique(key.reshape(-1, 3), axis=0, return_inverse=True)
    return gid.reshape(x.shape).astype(np.int32), int(gid.max()) + 1


def mesh_from_coords3(x: np.ndarray, y: np.ndarray, z: np.ndarray,
                      bc_fn: Callable | None = None,
                      periodic_map: Callable | None = None,
                      interior_faces: set | None = None) -> Mesh3D:
    """Assemble a Mesh3D from GLL node coordinates (E, n, n, n).

    bc_fn(xm, ym, zm, normal) -> tag for each non-shared boundary face
    (face-midpoint coordinates + outward unit normal); None => all 'V'.
    periodic_map(x, y, z) -> canonical coords identifying periodic images.
    interior_faces: {(e, f)} faces to force interior (periodic seams)."""
    E, n = x.shape[0], x.shape[1]
    gid, nglobal = _global_numbering3(x, y, z, periodic_map, tol=1e-8)

    mult = np.zeros(nglobal)
    np.add.at(mult, gid.ravel(), 1.0)
    mult = mult[gid]

    # boundary faces: a face is on the boundary iff its 4 corner dofs are
    # not all shared with another element's face — detect via face-key
    # counting over corner-gid sets
    basis = make_basis(n)
    w2 = np.outer(basis.w, basis.w)
    face_keys: dict = {}
    for e in range(E):
        for f in range(6):
            ax, idx = _face_index(f)
            g = gid[e][idx]
            key = frozenset((int(g[0, 0]), int(g[0, -1]),
                             int(g[-1, 0]), int(g[-1, -1])))
            face_keys.setdefault(key, []).append((e, f))

    if bc_fn is None:
        bc_fn = lambda xm, ym, zm, nrm: "V"
    interior_faces = interior_faces or set()

    bc_faces: list[BoundaryFace3] = []
    mask_u = np.ones_like(x)
    mask_v = np.ones_like(x)
    mask_w = np.ones_like(x)
    mask_p = np.ones_like(x)
    mask_t = np.ones_like(x)
    bwn = np.zeros((3,) + x.shape)
    has_outflow = False

    for key, members in face_keys.items():
        if len(members) != 1:
            continue
        e, f = members[0]
        if (e, f) in interior_faces:
            continue
        ax, idx = _face_index(f)
        xf, yf, zf = x[e][idx], y[e][idx], z[e][idx]
        # outward normal from the two in-face tangents (node-index axes
        # other than ax), oriented outward by face side
        axes = [a for a in range(3) if a != ax]
        coords = np.stack([xf, yf, zf])               # (3, n, n)
        t1 = np.gradient(coords, axis=1)              # d/d(first in-face idx)
        t2 = np.gradient(coords, axis=2)
        nrm_f = np.cross(t1[:, n // 2, n // 2], t2[:, n // 2, n // 2])
        # orientation: cross(t_b, t_c) with (ax, b, c) cyclic points along
        # +ax; flip for the minus side
        sign = 1.0 if f % 2 == 1 else -1.0
        if (ax, axes[0], axes[1]) not in ((0, 1, 2), (1, 2, 0), (2, 0, 1)):
            sign = -sign
        nrm_f = sign * nrm_f / np.linalg.norm(nrm_f)
        xm, ym, zm = float(xf.mean()), float(yf.mean()), float(zf.mean())
        tag = bc_fn(xm, ym, zm, nrm_f)
        bc_faces.append(BoundaryFace3(e, f, tag, nrm_f))
        if tag in ("V", "W", "v"):
            mask_u[e][idx] = 0.0
            mask_v[e][idx] = 0.0
            mask_w[e][idx] = 0.0
            # surface quadrature weights: |t_u x t_v| dS at each face
            # node, exact tangents via the 1D differentiation matrix
            D = basis.D
            tu = np.einsum("ab,cbk->cak", D, coords)
            tv = np.einsum("ab,ckb->cka", D, coords)
            cr = np.cross(tu, tv, axisa=0, axisb=0)   # (n, n, 3)
            dS = np.linalg.norm(cr, axis=-1) * w2
            for c in range(3):
                bwn[c, e][idx] += nrm_f[c] * dS
        elif tag in ("O", "o"):
            mask_p[e][idx] = 0.0
            has_outflow = True
        if tag in ("V", "W", "t"):
            mask_t[e][idx] = 0.0

    # Dirichlet masks must be single-valued on shared dofs (min over copies)
    def min_global(m):
        g = np.full(nglobal, np.inf)
        np.minimum.at(g, gid.ravel(), m.ravel())
        return g[gid]

    mask_u = min_global(mask_u)
    mask_v = min_global(mask_v)
    mask_w = min_global(mask_w)
    mask_p = min_global(mask_p)
    mask_t = min_global(mask_t)

    return Mesh3D(n=n, nelem=E, x=x, y=y, z=z, gid=gid, nglobal=nglobal,
                  mult=mult, mask_u=mask_u, mask_v=mask_v, mask_w=mask_w,
                  mask_p=mask_p, mask_t=mask_t, has_outflow=has_outflow,
                  bc_faces=bc_faces, bwn=bwn)


def box_mesh3(n: int, nx: int, ny: int, nz: int,
              x0: float, x1: float, y0: float, y1: float,
              z0: float, z1: float,
              bc_fn: Callable | None = None,
              periodic_x: bool = False, periodic_y: bool = False,
              periodic_z: bool = False,
              xv: np.ndarray | None = None, yv: np.ndarray | None = None,
              zv: np.ndarray | None = None) -> Mesh3D:
    """Structured box of nx*ny*nz affine hex elements; optional per-axis
    vertex grading (xv/yv/zv override the uniform splits) and periodicity."""
    basis = make_basis(n)
    xi = 0.5 * (basis.x + 1.0)                       # [0, 1]
    xv = np.linspace(x0, x1, nx + 1) if xv is None else np.asarray(xv)
    yv = np.linspace(y0, y1, ny + 1) if yv is None else np.asarray(yv)
    zv = np.linspace(z0, z1, nz + 1) if zv is None else np.asarray(zv)
    E = nx * ny * nz
    x = np.empty((E, n, n, n))
    y = np.empty((E, n, n, n))
    z = np.empty((E, n, n, n))
    e = 0
    for ix in range(nx):
        for iy in range(ny):
            for iz in range(nz):
                gx = xv[ix] + (xv[ix + 1] - xv[ix]) * xi
                gy = yv[iy] + (yv[iy + 1] - yv[iy]) * xi
                gz = zv[iz] + (zv[iz + 1] - zv[iz]) * xi
                x[e] = gx[:, None, None]
                y[e] = gy[None, :, None]
                z[e] = gz[None, None, :]
                e += 1

    def pm(xx, yy, zz):
        px = np.where(np.isclose(xx, x1), x0, xx) if periodic_x else xx
        py = np.where(np.isclose(yy, y1), y0, yy) if periodic_y else yy
        pz = np.where(np.isclose(zz, z1), z0, zz) if periodic_z else zz
        return px, py, pz

    periodic = periodic_x or periodic_y or periodic_z
    mesh = mesh_from_coords3(x, y, z, bc_fn=bc_fn,
                             periodic_map=pm if periodic else None)
    return mesh


def dirichlet_values3(mesh: Mesh3D, tag_values: dict) -> np.ndarray:
    """(3, E, n, n, n) Dirichlet velocity values from
    {tag: fn(x, y, z) -> (u, v, w)} evaluated on tagged faces."""
    vals = np.zeros((3,) + mesh.x.shape)
    for bf in mesh.bc_faces:
        if bf.tag not in tag_values:
            continue
        ax, idx = _face_index(bf.face)
        xf, yf, zf = mesh.x[bf.elem][idx], mesh.y[bf.elem][idx], \
            mesh.z[bf.elem][idx]
        u, v, w = tag_values[bf.tag](xf, yf, zf)
        vals[0, bf.elem][idx] = np.broadcast_to(u, xf.shape)
        vals[1, bf.elem][idx] = np.broadcast_to(v, xf.shape)
        vals[2, bf.elem][idx] = np.broadcast_to(w, xf.shape)
    return vals
