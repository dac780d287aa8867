"""Structured-block recovery for ingested meshes.

Generated meshes carry their block layout (`Mesh2D.blocks`), which enables the
fast slice-exchange gather-scatter (ops/gslib2.py — zero XLA gathers). Meshes
ingested from external toolchains (reference field files / .re2, mesh.py
`mesh_from_coords`) arrive as bags of elements: this module recovers a
structured-block decomposition from the connectivity alone —

  1. canonicalize element orientations by in-plane ROTATIONS (orientation-
     preserving, so Jacobians stay positive),
  2. grow maximal logically-Cartesian rectangles over the element adjacency
     graph (corner-gid edge matching),
  3. permute elements into block raster order.

The result feeds gslib2.build_plan unchanged; TPU dssum goes from index-table
gathers (~30-80x slower) to pure slice exchanges. This is the setup half of
the reference's gslib dependency (SURVEY.md §2.4 hard part #2) for foreign
meshes.
"""

from __future__ import annotations

import numpy as np


def _corner_mats(gid: np.ndarray) -> np.ndarray:
    """(E, 2, 2) corner gids: c[e, a, b] = gid at (i = a*(n-1), j = b*(n-1))."""
    n = gid.shape[1]
    return gid[:, :: n - 1, :: n - 1]


def _edges_of(c: np.ndarray):
    """Corner-pair keys of the 4 faces of corner matrix c (2,2):
    returns {face: (g_lo, g_hi ordered along the face)} with faces
    'i-','i+','j-','j+'."""
    return {
        "i-": (c[0, 0], c[0, 1]),
        "i+": (c[1, 0], c[1, 1]),
        "j-": (c[0, 0], c[1, 0]),
        "j+": (c[0, 1], c[1, 1]),
    }


def detect_blocks(gid: np.ndarray):
    """Decompose the conforming quad mesh into structured blocks.

    Returns (perm, rots, blocks):
      perm   (E,) int — new order: element k of the canonical mesh is old
             element perm[k] (apply as arr[perm] AFTER rotating),
      rots   (E,) int — np.rot90 count applied to each OLD element's (n, n)
             node arrays,
      blocks tuple of (e0, bx, by, 'xy') in the new ordering (Mesh2D.blocks
             convention: raster index e0 + ix*by + iy).
    """
    E = gid.shape[0]
    c = _corner_mats(gid)

    # adjacency: corner-pair key -> [(elem, face)]
    adj: dict[frozenset, list] = {}
    for e in range(E):
        for face, (ga, gb) in _edges_of(c[e]).items():
            adj.setdefault(frozenset((int(ga), int(gb))), []).append((e, face))

    def neighbor(e, ga, gb):
        """Element sharing the (ga -> gb) edge with e, or None (boundary)."""
        lst = adj[frozenset((int(ga), int(gb)))]
        others = [x for x in lst if x[0] != e]
        return others[0][0] if others else None

    def orient_to(e2, want):
        """Rotation k such that rot90(c[e2], k) has (c[0,0], c[0,1]) == want
        (for p-steps) — caller passes the expected corner pair and which
        canonical face must carry it."""
        for k in range(4):
            ck = np.rot90(c[e2], k)
            if (int(ck[0, 0]), int(ck[0, 1])) == want:
                return k, ck
        return None, None

    def orient_to_q(e2, want):
        for k in range(4):
            ck = np.rot90(c[e2], k)
            if (int(ck[0, 0]), int(ck[1, 0])) == want:
                return k, ck
        return None, None

    assigned = np.full(E, False)
    rots = np.zeros(E, dtype=int)
    blocks = []
    order = []

    def step_p(e, ck, direction):
        """Neighbor of canonical element (e, ck) in +p (direction=1) or -p."""
        if direction == 1:
            ga, gb = int(ck[1, 0]), int(ck[1, 1])
        else:
            ga, gb = int(ck[0, 0]), int(ck[0, 1])
        e2 = neighbor(e, ga, gb)
        if e2 is None or assigned[e2]:
            return None
        if direction == 1:
            k2, ck2 = orient_to(e2, (ga, gb))            # its p- face
        else:
            # its p+ face must carry (ga, gb)
            for k2 in range(4):
                ck2 = np.rot90(c[e2], k2)
                if (int(ck2[1, 0]), int(ck2[1, 1])) == (ga, gb):
                    return e2, k2, ck2
            return None
        if k2 is None:
            return None
        return e2, k2, ck2

    def step_q(e, ck, direction):
        if direction == 1:
            ga, gb = int(ck[0, 1]), int(ck[1, 1])
        else:
            ga, gb = int(ck[0, 0]), int(ck[1, 0])
        e2 = neighbor(e, ga, gb)
        if e2 is None or assigned[e2]:
            return None
        if direction == 1:
            k2, ck2 = orient_to_q(e2, (ga, gb))          # its q- face
        else:
            for k2 in range(4):
                ck2 = np.rot90(c[e2], k2)
                if (int(ck2[0, 1]), int(ck2[1, 1])) == (ga, gb):
                    return e2, k2, ck2
            return None
        if k2 is None:
            return None
        return e2, k2, ck2

    for seed in range(E):
        if assigned[seed]:
            continue
        # walk to the p-/q- extremes from the seed (bounded walks)
        e, k = seed, 0
        ck = c[seed]
        for _ in range(E):
            r = step_p(e, ck, -1)
            if r is None:
                break
            e, k, ck = r
        for _ in range(E):
            r = step_q(e, ck, -1)
            if r is None:
                break
            e, k, ck = r
        corner_e, corner_k, corner_ck = e, k, ck

        # row 0: walk +p
        def build_row(e0, k0, ck0, limit=None):
            row = [(e0, k0, ck0)]
            e_, ck_ = e0, ck0
            while limit is None or len(row) < limit:
                r = step_p(e_, ck_, 1)
                if r is None:
                    break
                if any(x[0] == r[0] for x in row):        # ring closed on self
                    break
                row.append(r)
                e_, ck_ = r[0], r[2]
            return row

        row0 = build_row(corner_e, corner_k, corner_ck)
        bx = len(row0)
        grid = [row0]
        for x in row0:
            assigned[x[0]] = True
        # rows q = 1, 2, ...: each element is the q+ neighbor of the one below
        while True:
            below = grid[-1]
            r0 = step_q(below[0][0], below[0][2], 1)
            if r0 is None:
                break
            candidate = build_row(r0[0], r0[1], r0[2], limit=bx)
            ok = len(candidate) == bx
            if ok:
                for (eb, _, ckb), (ec, _, ckc) in zip(below, candidate):
                    ga = (int(ckb[0, 1]), int(ckb[1, 1]))
                    gc = (int(ckc[0, 0]), int(ckc[1, 0]))
                    if ga != gc:
                        ok = False
                        break
            if not ok:
                break
            grid.append(candidate)
            for x in candidate:
                assigned[x[0]] = True

        by = len(grid)
        e0 = len(order)
        # raster order: index = ix*by + iy  (iy = q fastest)
        for ix in range(bx):
            for iy in range(by):
                e_, k_, _ = grid[iy][ix]
                order.append(e_)
                rots[e_] = k_
        blocks.append((e0, bx, by, "xy"))

    perm = np.asarray(order)
    return perm, rots, tuple(blocks)


def apply_canonicalization(arr: np.ndarray, perm: np.ndarray,
                           rots: np.ndarray) -> np.ndarray:
    """Transform an (..., E, n, n) array into the canonical block layout:
    rotate each (old) element's node block, then reorder elements."""
    out = np.array(arr)
    for k in (1, 2, 3):
        sel = rots == k
        if np.any(sel):
            out[..., sel, :, :] = np.rot90(
                out[..., sel, :, :], k, axes=(-2, -1))
    return out[..., perm, :, :]


def canonicalize_coords(x: np.ndarray, y: np.ndarray,
                        match_tol: float | None = None):
    """Recover blocks from raw GLL coordinates; returns (x2, y2, blocks, tf)
    with tf(field) mapping any (..., E, n, n) array of the ORIGINAL element
    order/orientation into the canonical layout. match_tol: absolute
    coordinate-matching tolerance for noisy ingested geometry."""
    # provisional numbering just for adjacency detection
    from .mesh import _global_numbering
    diam = max(np.ptp(x), np.ptp(y))
    if match_tol is None:
        gid, _ = _global_numbering(x, y, None, 1e-8 * max(diam, 1.0))
    else:
        gid, _ = _global_numbering(x, y, None, match_tol, robust=True)
    perm, rots, blocks = detect_blocks(gid)

    def tf(field):
        return apply_canonicalization(np.asarray(field), perm, rots)

    return tf(x), tf(y), blocks, tf
