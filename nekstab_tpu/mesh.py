"""2D spectral-element mesh: curvilinear quads, global numbering, BC masks.

Host-side (numpy) preprocessing. The reference gets meshes from Nek5000
`.re2/.ma2` files plus gslib connectivity (SURVEY.md L0/L1); here meshes are
built programmatically (Gordon-Hall transfinite interpolation, circular-arc
edges) and the direct-stiffness connectivity is a coordinate-matched global
numbering, consumed by the gather-scatter ops (ops/gather_scatter.py).

Conventions
-----------
* Element reference coords (r, s) in [-1,1]^2; node [e, i, j] sits at
  (r_i, s_j): i is the r/x-like index, j the s/y-like index.
* Element corners given CCW: [SW, SE, NE, NW].
* Faces named 'S' (s=-1), 'E' (r=+1), 'N' (s=+1), 'W' (r=-1).

Boundary-condition tags (cf. Nek5000 cbc codes used in the reference examples):
  'W'   wall           -> homogeneous Dirichlet velocity
  'V'   inflow         -> Dirichlet velocity (values from the case)
  'O'   outflow        -> natural (do-nothing) + pressure pinned to 0
  'SYM' symmetry       -> zero normal velocity (axis-aligned faces only)
  'A'   axis (r=0)     -> axisymmetric axis: zero radial velocity, natural
                          axial/pressure (the reference's Nek5000 `ifaxis`
                          'A  ' cbc, used by examples/tpjet)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import numpy as np

from .quadrature import make_basis

Curve = tuple  # ('arc', xc, yc) circular arc centred at (xc, yc)

_FACE_CORNERS = {"S": (0, 1), "E": (1, 2), "N": (3, 2), "W": (0, 3)}

DIRICHLET_TAGS = ("W", "V")


def _edge_points(a: np.ndarray, b: np.ndarray, t: np.ndarray,
                 curve: Curve | None) -> np.ndarray:
    """Sample the edge from corner a to corner b at parameters t in [-1,1].

    Straight line by default; ('arc', xc, yc) places points on the circle
    centred at (xc, yc) through a and b, GLL-distributed in angle (so two
    elements sharing the arc produce identical interface nodes).
    """
    if curve is None:
        lam = (t + 1.0) / 2.0
        return a[None, :] + lam[:, None] * (b - a)[None, :]
    kind = curve[0]
    if kind != "arc":
        raise ValueError(f"unknown curve kind {kind!r}")
    xc, yc = curve[1], curve[2]
    c = np.array([xc, yc])
    ra, rb = np.linalg.norm(a - c), np.linalg.norm(b - c)
    if not np.isclose(ra, rb, rtol=1e-8):
        raise ValueError("arc endpoints not equidistant from centre")
    tha = np.arctan2(a[1] - yc, a[0] - xc)
    thb = np.arctan2(b[1] - yc, b[0] - xc)
    # shortest way around
    dth = np.mod(thb - tha + np.pi, 2 * np.pi) - np.pi
    th = tha + (t + 1.0) / 2.0 * dth
    rad = ra + (t + 1.0) / 2.0 * (rb - ra)
    return np.stack([xc + rad * np.cos(th), yc + rad * np.sin(th)], axis=1)


def gordon_hall(corners: np.ndarray, curves: dict[str, Curve],
                r: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """GLL coordinates (x, y), each (n, n), of one element via transfinite
    (Gordon-Hall) interpolation from 4 corner points and optional curved edges."""
    n = len(r)
    c0, c1, c2, c3 = corners
    eS = _edge_points(c0, c1, r, curves.get("S"))
    eN = _edge_points(c3, c2, r, curves.get("N"))
    eW = _edge_points(c0, c3, r, curves.get("W"))
    eE = _edge_points(c1, c2, r, curves.get("E"))
    ri = r[:, None, None]          # varies with i
    sj = r[None, :, None]          # varies with j
    blend = ((1 - sj) / 2 * eS[:, None, :] + (1 + sj) / 2 * eN[:, None, :]
             + (1 - ri) / 2 * eW[None, :, :] + (1 + ri) / 2 * eE[None, :, :])
    bilin = ((1 - ri) * (1 - sj) / 4 * c0 + (1 + ri) * (1 - sj) / 4 * c1
             + (1 + ri) * (1 + sj) / 4 * c2 + (1 - ri) * (1 + sj) / 4 * c3)
    xy = blend - bilin
    return xy[..., 0], xy[..., 1]


def face_index(face: str, n: int) -> tuple:
    """Numpy index (into an (..., n, n) array) selecting the nodes of a face,
    ordered along the face's natural parameter."""
    if face == "S":
        return (slice(None), 0)
    if face == "N":
        return (slice(None), n - 1)
    if face == "W":
        return (0, slice(None))
    if face == "E":
        return (n - 1, slice(None))
    raise ValueError(face)


@dataclass
class BoundaryFace:
    elem: int
    face: str          # 'S'|'E'|'N'|'W'
    tag: str           # BC tag
    normal: np.ndarray  # (2,) outward unit normal (from straight endpoints)


@dataclass
class Mesh2D:
    """Fully preprocessed SEM mesh (all numpy, static)."""

    n: int                     # GLL points per direction (Nek lx1)
    nelem: int
    x: np.ndarray              # (E, n, n) node x-coords
    y: np.ndarray              # (E, n, n) node y-coords
    gid: np.ndarray            # (E, n, n) int32 global dof ids
    nglobal: int
    mult: np.ndarray           # (E, n, n) float multiplicity of each dof
    mask_u: np.ndarray         # (E, n, n) 1.0 free / 0.0 Dirichlet, x-velocity
    mask_v: np.ndarray         # (E, n, n) same, y-velocity
    mask_p: np.ndarray         # (E, n, n) 0.0 where pressure pinned (outflow)
    mask_t: np.ndarray | None  # (E, n, n) scalar/temperature Dirichlet mask
    has_outflow: bool
    # axisymmetric (x, r) meridional mesh: y >= 0 is the radius, weak forms
    # r-weighted (ops/context.py); set automatically when an 'A' face exists
    axisym: bool = False
    bc_faces: list[BoundaryFace] = field(default_factory=list)
    # surface-quadrature outward-normal weights on Dirichlet faces:
    # sum(q * (bwn[0] u + bwn[1] v)) = boundary integral of (u,v).n q over
    # all 'V'/'W' faces — the g_n term of the pressure-Poisson weak form
    bwn: np.ndarray | None = None
    # structured-block layout for the slice-based gather-scatter
    # (ops/gslib2.py): tuples (e0, bx, by, orient, per_x, per_y) with elements
    # e0 + ix*by + iy stored contiguously; orient 'xy' = node r-axis along
    # block-x, 'swap' = node s-axis along block-x (O-grid rings)
    blocks: tuple | None = None

    @property
    def shape(self) -> tuple[int, int, int]:
        return (self.nelem, self.n, self.n)

    def faces_with_tag(self, tag: str) -> list[BoundaryFace]:
        return [f for f in self.bc_faces if f.tag == tag]


def _global_numbering(x: np.ndarray, y: np.ndarray,
                      periodic_map: Callable | None,
                      tol: float, robust: bool = False
                      ) -> tuple[np.ndarray, int]:
    xx, yy = (x, y) if periodic_map is None else periodic_map(x, y)
    if robust:
        gid = _robust_numbering(xx, yy, tol)
    else:
        key = np.stack([np.round(xx / tol), np.round(yy / tol)], axis=-1)
        _, gid = np.unique(key.reshape(-1, 2), axis=0, return_inverse=True)
        gid = gid.reshape(x.shape).astype(np.int32)
    return gid, int(gid.max()) + 1


def _robust_numbering(xx: np.ndarray, yy: np.ndarray, tol: float):
    """Tolerance-robust coordinate matching (union-find over a KDTree
    neighbor graph) — for INGESTED meshes whose coordinates carry roundoff
    noise (e.g. float32-truncated .re2 corners) that can straddle quantized
    bins. tol must be below the smallest genuine node separation."""
    from scipy.spatial import cKDTree

    pts = np.stack([xx.reshape(-1), yy.reshape(-1)], axis=1)
    tree = cKDTree(pts)
    pairs = tree.query_pairs(r=tol, output_type="ndarray")
    parent = np.arange(pts.shape[0])

    def find(i):
        root = i
        while parent[root] != root:
            root = parent[root]
        while parent[i] != root:
            parent[i], i = root, parent[i]
        return root

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    roots = np.array([find(i) for i in range(pts.shape[0])])
    _, gid = np.unique(roots, return_inverse=True)
    return gid.reshape(xx.shape).astype(np.int32)


def _scatter_min(gid: np.ndarray, vals: np.ndarray, nglobal: int) -> np.ndarray:
    """Per-dof minimum over all sharing (e,i,j) slots, gathered back."""
    g = np.full(nglobal, np.inf)
    np.minimum.at(g, gid.ravel(), vals.ravel())
    return g[gid]


def build_mesh(n: int, corners: np.ndarray,
               curves: dict[tuple[int, str], Curve] | None = None,
               bc_fn: Callable[[float, float, np.ndarray], str] | None = None,
               periodic_map: Callable | None = None) -> Mesh2D:
    """Assemble a Mesh2D from element corner coordinates.

    corners: (E, 4, 2) CCW [SW, SE, NE, NW]
    curves:  {(elem, face): Curve} optional curved edges
    bc_fn(xm, ym, normal) -> tag, called for each boundary face midpoint;
        None => all-Dirichlet ('V').
    periodic_map(x, y) -> canonical (x, y) identifying periodic images.
    """
    curves = curves or {}
    basis = make_basis(n)
    nelem = corners.shape[0]
    x = np.empty((nelem, n, n))
    y = np.empty((nelem, n, n))
    for e in range(nelem):
        ec = {f: c for (ee, f), c in curves.items() if ee == e}
        x[e], y[e] = gordon_hall(corners[e], ec, basis.x)
    return mesh_from_coords(x, y, bc_fn=bc_fn, periodic_map=periodic_map)


def mesh_from_coords(x: np.ndarray, y: np.ndarray,
                     bc_fn: Callable[[float, float, np.ndarray], str] | None = None,
                     periodic_map: Callable | None = None,
                     match_tol: float | None = None) -> Mesh2D:
    """Assemble a Mesh2D from prescribed GLL node coordinates (E, n, n).

    This is the ingestion path for externally generated meshes — in
    particular the reference toolchain's, whose field files carry the full
    (curved) GLL geometry (io/nekfile.py): connectivity is recovered by
    coordinate matching, boundary faces topologically, BC tags from bc_fn.
    The reference obtains the same from .re2/.ma2 + gslib (SURVEY.md L0/L1).
    """
    nelem, n = x.shape[0], x.shape[1]
    diam = max(np.ptp(x), np.ptp(y))
    if match_tol is None:
        gid, nglobal = _global_numbering(x, y, periodic_map,
                                         1e-8 * max(diam, 1.0))
    else:
        gid, nglobal = _global_numbering(x, y, periodic_map, match_tol,
                                         robust=True)

    mult = np.zeros(nglobal)
    np.add.at(mult, gid.ravel(), 1.0)
    mult = mult[gid]

    # --- boundary faces: vertex-pair keys seen exactly once -----------------
    # vertex global ids (corner nodes), periodic-aware via gid
    vid = np.stack([gid[:, 0, 0], gid[:, -1, 0], gid[:, -1, -1], gid[:, 0, -1]],
                   axis=1)  # (E, 4) [SW, SE, NE, NW]
    face_count: dict[frozenset, int] = {}
    face_list: list[tuple[int, str, frozenset]] = []
    for e in range(nelem):
        for f, (ca, cb) in _FACE_CORNERS.items():
            key = frozenset((int(vid[e, ca]), int(vid[e, cb])))
            face_count[key] = face_count.get(key, 0) + 1
            face_list.append((e, f, key))

    mask_u = np.ones((nelem, n, n))
    mask_v = np.ones((nelem, n, n))
    mask_p = np.ones((nelem, n, n))
    mask_t = np.ones((nelem, n, n))
    bc_faces: list[BoundaryFace] = []
    has_outflow = False
    for e, f, key in face_list:
        if face_count[key] != 1:
            continue
        ca, cb = _FACE_CORNERS[f]
        a = np.array([x[e][face_index(f, n)][0], y[e][face_index(f, n)][0]])
        b = np.array([x[e][face_index(f, n)][-1], y[e][face_index(f, n)][-1]])
        tang = b - a
        nrm = np.array([tang[1], -tang[0]])
        # orient outward: away from element centroid
        cen = np.array([x[e].mean(), y[e].mean()])
        mid = (a + b) / 2
        if np.dot(nrm, mid - cen) < 0:
            nrm = -nrm
        nrm = nrm / np.linalg.norm(nrm)
        tag = "V" if bc_fn is None else bc_fn(mid[0], mid[1], nrm)
        bc_faces.append(BoundaryFace(elem=e, face=f, tag=tag, normal=nrm))
        idx = face_index(f, n)
        if tag in DIRICHLET_TAGS:
            mask_u[e][idx] = 0.0
            mask_v[e][idx] = 0.0
            # scalar (temperature) Dirichlet on the same faces by default
            # (insulated/Neumann scalar BCs: leave mask_t=1 via custom masks)
            mask_t[e][idx] = 0.0
        elif tag == "O":
            has_outflow = True
            mask_p[e][idx] = 0.0
        elif tag == "SYM":
            if abs(nrm[0]) > abs(nrm[1]):
                mask_u[e][idx] = 0.0
            else:
                mask_v[e][idx] = 0.0
        elif tag == "A":
            # axisymmetric axis: u_r = 0 essential; u_x, p natural (the
            # r-weight of the weak form imposes du_x/dr = 0 for free)
            mask_v[e][idx] = 0.0
        else:
            raise ValueError(f"unknown BC tag {tag!r}")

    # global consistency: a dof Dirichlet anywhere is Dirichlet everywhere
    mask_u = _scatter_min(gid, mask_u, nglobal)
    mask_v = _scatter_min(gid, mask_v, nglobal)
    mask_p = _scatter_min(gid, mask_p, nglobal)
    mask_t = _scatter_min(gid, mask_t, nglobal)

    axisym = any(f.tag == "A" for f in bc_faces)
    if axisym and np.min(y) < -1e-12:
        raise ValueError("axisymmetric mesh must lie in r = y >= 0")
    mesh = Mesh2D(n=n, nelem=nelem, x=x, y=y, gid=gid, nglobal=nglobal,
                  mult=mult, mask_u=mask_u, mask_v=mask_v, mask_p=mask_p,
                  mask_t=mask_t, has_outflow=has_outflow, bc_faces=bc_faces,
                  axisym=axisym)
    mesh.bwn = surface_weights(mesh, DIRICHLET_TAGS)
    return mesh


def surface_weights(mesh: "Mesh2D", tags, region=None) -> np.ndarray:
    """Per-node surface-quadrature outward-normal weights (2, E, n, n) over
    the boundary faces with the given tags: sum(q * (w[0] u + w[1] v)) is the
    surface integral of (u,v).n q. Nodes on two tagged faces accumulate both
    contributions. `region(xc, yc) -> bool` restricts to faces whose centroid
    satisfies the predicate — the per-object decomposition of the reference's
    torque monitor (nekStab_define_obj, core/usr_extra.f:641-655)."""
    basis = make_basis(mesh.n)
    n = mesh.n
    bwn = np.zeros((2, mesh.nelem, n, n))
    for f in mesh.bc_faces:
        if f.tag not in tags:
            continue
        idx = face_index(f.face, n)
        xf = mesh.x[f.elem][idx]
        yf = mesh.y[f.elem][idx]
        if region is not None and not region(xf.mean(), yf.mean()):
            continue
        tx = basis.D @ xf
        ty = basis.D @ yf
        ds = np.hypot(tx, ty)
        nx, ny = ty / ds, -tx / ds
        # orient outward (match the straight-edge normal estimate)
        if nx.mean() * f.normal[0] + ny.mean() * f.normal[1] < 0:
            nx, ny = -nx, -ny
        rw = mesh.y[f.elem][idx] if mesh.axisym else 1.0
        bwn[0][f.elem][idx] += basis.w * ds * nx * rw
        bwn[1][f.elem][idx] += basis.w * ds * ny * rw
    return bwn


def dirichlet_values(mesh: Mesh2D, tag_values: dict,
                     ncomp: int = 2) -> np.ndarray:
    """Dirichlet value field (ncomp, E, n, n) from per-tag callables
    {tag: fn(x, y) -> (u, v[, theta, ...])} evaluated on each tagged boundary
    face (the userbc callback analog, SURVEY.md §2.3). ncomp = 2 velocity
    components plus any advected scalars (Boussinesq temperature)."""
    vals = np.zeros((ncomp,) + mesh.shape)
    was_set = np.zeros(mesh.shape, dtype=bool)
    for f in mesh.bc_faces:
        fn = tag_values.get(f.tag)
        if fn is None:
            continue
        idx = face_index(f.face, mesh.n)
        xf = mesh.x[f.elem][idx]
        yf = mesh.y[f.elem][idx]
        comps = fn(xf, yf)
        for c in range(ncomp):
            vals[c][f.elem][idx] = comps[c] if c < len(comps) else 0.0
        was_set[f.elem][idx] = True
    # propagate to ALL copies of each global dof (a masked dof can live in an
    # element with no boundary face; its copy must carry the same value or the
    # Dirichlet lifting field would be discontinuous)
    cnt = np.zeros(mesh.nglobal)
    np.add.at(cnt, mesh.gid[was_set], 1.0)
    for c in range(ncomp):
        s = np.zeros(mesh.nglobal)
        np.add.at(s, mesh.gid[was_set], vals[c][was_set])
        avg = s / np.maximum(cnt, 1.0)
        vals[c] = avg[mesh.gid]
    return vals


# ---------------------------------------------------------------------------
# Generators
# ---------------------------------------------------------------------------

def _grade(a: float, b: float, m: int, ratio: float = 1.0) -> np.ndarray:
    """m+1 vertices from a to b, geometric grading (last/first cell = ratio)."""
    if np.isclose(ratio, 1.0):
        return np.linspace(a, b, m + 1)
    q = ratio ** (1.0 / (m - 1))
    steps = q ** np.arange(m)
    t = np.concatenate(([0.0], np.cumsum(steps)))
    return a + (b - a) * t / t[-1]


def box_corners(xv: np.ndarray, yv: np.ndarray) -> np.ndarray:
    """Element corner array (E,4,2) for a tensor grid with vertex lines xv, yv."""
    nx, ny = len(xv) - 1, len(yv) - 1
    corners = np.empty((nx * ny, 4, 2))
    e = 0
    for jy in range(ny):
        for ix in range(nx):
            x0, x1 = xv[ix], xv[ix + 1]
            y0, y1 = yv[jy], yv[jy + 1]
            corners[e] = [[x0, y0], [x1, y0], [x1, y1], [x0, y1]]
            e += 1
    return corners


def annulus_mesh(n: int, r_in: float = 1.0, r_out: float = 2.0,
                 n_theta: int = 32, n_r: int = 8,
                 bc_fn: Callable | None = None) -> Mesh2D:
    """Full annular ring (periodic in theta via coincident 0/2pi vertices);
    all circumferential element edges are exact circular arcs. The reference
    thermosyphon geometry (examples/thersyphon/baseflow/tsyphon.box: an
    (r, theta) box with periodic theta)."""
    th = np.linspace(0.0, 2 * np.pi, n_theta + 1)
    rr = np.linspace(r_in, r_out, n_r + 1)
    v = np.stack([rr[None, :] * np.cos(th[:, None]),
                  rr[None, :] * np.sin(th[:, None])], axis=-1)  # (nt+1,nr+1,2)
    corners = []
    curves = {}
    e = 0
    for i in range(n_theta):
        for j in range(n_r):
            # CCW: (inner_i, outer_i, outer_{i+1}, inner_{i+1}) — W face is
            # the inner arc, E face the outer arc (cf. models/cylinder.py)
            corners.append([v[i, j], v[i, j + 1], v[i + 1, j + 1],
                            v[i + 1, j]])
            curves[(e, "W")] = ("arc", 0.0, 0.0)
            curves[(e, "E")] = ("arc", 0.0, 0.0)
            e += 1
    if bc_fn is None:
        bc_fn = lambda x, y, nrm: "W"
    m = build_mesh(n, np.asarray(corners), curves=curves, bc_fn=bc_fn)
    m.blocks = ((0, n_theta, n_r, "swap"),)
    return m


def box_mesh(n: int, nx: int, ny: int, x0: float, x1: float, y0: float,
             y1: float, bc_fn: Callable | None = None,
             periodic_x: bool = False, periodic_y: bool = False,
             xv: np.ndarray | None = None,
             yv: np.ndarray | None = None) -> Mesh2D:
    """Structured box mesh; periodic directions are identified in the numbering."""
    xv = np.linspace(x0, x1, nx + 1) if xv is None else xv
    yv = np.linspace(y0, y1, ny + 1) if yv is None else yv
    corners = box_corners(xv, yv)

    pmap = None
    if periodic_x or periodic_y:
        Lx, Ly = x1 - x0, y1 - y0

        def pmap(x, y):
            xx = x0 + np.mod(x - x0, Lx) if periodic_x else x
            yy = y0 + np.mod(y - y0, Ly) if periodic_y else y
            # fold the far boundary onto the near one exactly
            if periodic_x:
                xx = np.where(np.isclose(xx, x1, atol=1e-10 * max(Lx, 1)), x0, xx)
            if periodic_y:
                yy = np.where(np.isclose(yy, y1, atol=1e-10 * max(Ly, 1)), y0, yy)
            return xx, yy

    if bc_fn is None and (periodic_x and periodic_y):
        bc_fn = None  # fully periodic: no boundary faces remain
    m = build_mesh(n, corners, bc_fn=bc_fn, periodic_map=pmap)
    m.blocks = ((0, len(yv) - 1, len(xv) - 1, "swap"),)
    return m
