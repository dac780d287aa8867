"""Nek5000 .re2 binary mesh reader -> Mesh2D.

Completes the reference mesh-input path (SURVEY.md §2 "Mesh input
.re2/.ma2"): element corners, curved sides and boundary conditions are taken
from the file itself (no user inference), connectivity by coordinate
matching, periodic ('P') faces folded into the global numbering, and the
structured-block layout recovered (mesh_blocks.py) so the fast
slice-exchange gather-scatter applies. The .ma2 partition file is not needed
— partitioning is the device mesh's job here.

Format (v002, little-endian): 80-byte ASCII header '#v002 nelgt ldim nelv',
float32 6.54321 tag, per element (2D) 9 float64 (group, xc[4], yc[4]);
curved-side block: count then 8 float64 per record (ieg, iside, 5 params,
8-char type — 'C' = signed-radius circular arc, center on the LEFT of the
directed edge for positive radius); BC block: count then 8 float64 per
record (ieg, iside, 5 params, 3-char cbc).
"""

from __future__ import annotations

import struct

import numpy as np

# Nek face -> (corner_a, corner_b) in CCW corner order; same face letters as
# mesh.py (S=1, E=2, N=3, W=4)
_FACE_CORNERS = {1: (0, 1), 2: (1, 2), 3: (2, 3), 4: (3, 0)}
_FACE_NAME = {1: "S", 2: "E", 3: "N", 4: "W"}

# Nek cbc codes -> framework BC tags (mesh.py)
CBC_MAP = {"v": "V", "V": "V", "W": "W", "O": "O", "o": "O",
           "SYM": "SYM", "A": "A", "P": "P"}


def read_re2(path: str) -> dict:
    """Raw parse: corners (E,4,2), curves {(e, face): ('arc', xc, yc)},
    bcs {(e, face_name): (cbc, params)}, periodic pairs."""
    with open(path, "rb") as fh:
        hdr = fh.read(80).decode("ascii", errors="replace")
        if not (hdr.startswith("#v002") or hdr.startswith("#v003")):
            raise ValueError(f"unsupported .re2 version: {hdr[:10]!r} "
                             "(only #v002/#v003 little-endian)")
        tok = hdr.split()
        nelgt, ldim = int(tok[1]), int(tok[2])
        tag = np.fromfile(fh, dtype="<f4", count=1)[0]
        if abs(tag - 6.54321) > 1e-4:
            raise ValueError("big-endian .re2 not supported")
        if ldim != 2:
            raise ValueError("only 2D .re2 supported (3D: future round)")
        el = np.fromfile(fh, dtype="<f8", count=9 * nelgt).reshape(nelgt, 9)
        corners = np.stack([el[:, 1:5], el[:, 5:9]], axis=-1)  # (E, 4, 2)

        ncurve = int(np.fromfile(fh, dtype="<f8", count=1)[0])
        curves = {}
        for _ in range(ncurve):
            rec = fh.read(64)
            vals = np.frombuffer(rec[:56], dtype="<f8")
            ctype = rec[56:64].decode("ascii", errors="replace").strip()
            e, f = int(vals[0]) - 1, int(vals[1])
            if ctype == "C":
                rad = float(vals[2])
                a, b = _FACE_CORNERS[f]
                A, B = corners[e, a], corners[e, b]
                mid = (A + B) / 2.0
                chord = B - A
                c = np.linalg.norm(chord)
                h2 = rad * rad - (c / 2.0) ** 2
                if h2 < 0:
                    raise ValueError(f"arc radius {rad} shorter than chord "
                                     f"{c} (elem {e+1} face {f})")
                nL = np.array([-chord[1], chord[0]]) / c
                centre = mid + np.sign(rad) * np.sqrt(h2) * nL
                curves[(e, _FACE_NAME[f])] = ("arc", float(centre[0]),
                                              float(centre[1]))
            else:
                raise ValueError(f"curve type {ctype!r} not supported yet")

        bcs = {}
        bids = {}
        nbc_arr = np.fromfile(fh, dtype="<f8", count=1)
        nbc = int(nbc_arr[0]) if nbc_arr.size else 0
        for _ in range(nbc):
            rec = fh.read(64)
            vals = np.frombuffer(rec[:56], dtype="<f8")
            cbc = rec[56:64].decode("ascii", errors="replace")[:3].strip()
            e, f = int(vals[0]) - 1, int(vals[1])
            if cbc == "MSH":
                # v003 boundaryID mesh (Nek setbc/boundaryTypeMap style):
                # the integer boundary id rides in the last param slot
                bids[(e, _FACE_NAME[f])] = int(vals[6])
            else:
                bcs[(e, _FACE_NAME[f])] = (cbc, tuple(float(v)
                                                      for v in vals[2:7]))
    return dict(nelgt=nelgt, corners=corners, curves=curves, bcs=bcs,
                bids=bids)


def mesh_from_re2(path: str, n: int, recover_blocks: bool = True,
                  cbc_map: dict | None = None,
                  bid_map: dict | None = None,
                  match_tol: float | None = None):
    """Build a Mesh2D of order n from a .re2 file: Gordon-Hall geometry from
    the file's corners + arcs, BC tags from the file's cbc records, periodic
    faces folded by midpoint translation matching, blocks recovered.

    bid_map: {boundaryID: tag} for v003 boundaryID meshes — the information
    the reference supplies in user code (e.g. back_fstep bfs.usr usrdat2
    setbc(4,1,'v')/setbc(2,1,'O')/setbc(3,1,'W'))."""
    from ..mesh import (_FACE_CORNERS as FC, build_mesh, face_index,
                        mesh_from_coords, gordon_hall)
    from ..quadrature import make_basis
    from ..mesh_blocks import canonicalize_coords

    raw = read_re2(path)
    corners, curves, bcs = raw["corners"], raw["curves"], raw["bcs"]
    cmap = dict(CBC_MAP)
    if cbc_map:
        cmap.update(cbc_map)
    if match_tol is None:
        # .re2 corner coordinates often carry float32-level roundoff (~1e-7
        # absolute): match with a tolerance well above that noise and well
        # below the smallest GLL node separation (~0.08 * min edge at n=6)
        edges = np.linalg.norm(
            corners - np.roll(corners, -1, axis=1), axis=-1)
        match_tol = 1e-3 * float(edges.min())

    # geometry
    basis = make_basis(n)
    E = corners.shape[0]
    x = np.empty((E, n, n))
    y = np.empty((E, n, n))
    for e in range(E):
        ec = {f: c for (ee, f), c in curves.items() if ee == e}
        x[e], y[e] = gordon_hall(corners[e], ec, basis.x)

    # periodic identification: pair 'P' faces by translated midpoints —
    # derive the translation vector(s) from the matched pairs
    pfaces = [(e, f) for (e, f), (cbc, _) in bcs.items() if cbc == "P"]
    pmap = None
    if pfaces:
        mids = {}
        for e, f in pfaces:
            idx = face_index(f, n)
            mids[(e, f)] = np.array([x[e][idx].mean(), y[e][idx].mean()])
        pts = np.array(list(mids.values()))
        # translation candidates: domain extents in x and y
        spans = np.array([np.ptp(x), np.ptp(y)])
        shifts = []
        for d, L in enumerate(spans):
            lo = pts[:, d].min()
            hi = pts[:, d].max()
            if np.isclose(hi - lo, L, rtol=1e-6):
                shifts.append((d, lo, hi))

        def pmap(xx, yy):
            out = [np.array(xx, dtype=float), np.array(yy, dtype=float)]
            for d, lo, hi in shifts:
                span = hi - lo
                c = out[d]
                out[d] = np.where(np.isclose(c, hi, atol=1e-9 * span), lo, c)
            return out[0], out[1]

    bc_lookup = {(e, f): cmap.get(cbc, None)
                 for (e, f), (cbc, _) in bcs.items() if cbc != "P"}
    unknown = {cbc for (e, f), (cbc, _) in bcs.items()
               if cbc != "P" and cmap.get(cbc) is None}
    if unknown:
        raise ValueError(f"unmapped cbc codes {unknown}; pass cbc_map")
    if raw["bids"]:
        ids = sorted({b for b in raw["bids"].values()})
        if bid_map is None or any(i not in bid_map for i in ids):
            raise ValueError(
                f"boundaryID mesh (v003): pass bid_map covering ids {ids} "
                "(the reference supplies this via setbc in usrdat2)")
        bc_lookup.update({(e, f): bid_map[b]
                          for (e, f), b in raw["bids"].items()
                          if bid_map[b] != "P"})

    # BC lookup keyed by the straight endpoint midpoint — the same quantity
    # mesh_from_coords hands to bc_fn — quantized for float-safe matching
    diam = max(np.ptp(x), np.ptp(y))
    q = 1e-7 * max(diam, 1.0)

    def key_of(xm, ym):
        return (round(float(xm) / q), round(float(ym) / q))

    mid_tag = {}
    for (e, f), tag in bc_lookup.items():
        idx = face_index(f, n)
        xm = 0.5 * (x[e][idx][0] + x[e][idx][-1])
        ym = 0.5 * (y[e][idx][0] + y[e][idx][-1])
        mid_tag[key_of(xm, ym)] = tag

    def bc_fn(xm, ym, nrm):
        tag = mid_tag.get(key_of(xm, ym))
        if tag is None:
            raise ValueError(f"boundary face at ({xm:.4f},{ym:.4f}) has no "
                             ".re2 BC record")
        return tag

    if recover_blocks:
        x, y, blocks, tf = canonicalize_coords(x, y, match_tol=match_tol)
        # midpoints are rotation/permutation-invariant: bc_fn still works
        mesh = mesh_from_coords(x, y, bc_fn=bc_fn, periodic_map=pmap,
                                match_tol=match_tol)
        mesh.blocks = blocks
    else:
        mesh = mesh_from_coords(x, y, bc_fn=bc_fn, periodic_map=pmap,
                                match_tol=match_tol)
    return mesh
