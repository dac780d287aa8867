"""Structured-block gather-scatter: slice-exchange dssum (zero XLA gathers).

TPU gathers cost ~30 us + 7 ns/element on v5e (measured), and the
index-table dssum (ops/gslib.py) dominated the whole time step (~616 us per
application). Every mesh this framework generates is a union of structured
element blocks (Cartesian patches, O-grid rings), so direct stiffness
decomposes into:

  1. element-interior dofs: untouched;
  2. edge-interior dofs (nodes 1..n-2 of element edges): pairwise sums via
     array SLICE exchanges — in-block neighbours and auto-detected
     block-to-block seams (including O-grid ring closure, handled as a seam
     of the block with itself);
  3. vertex dofs (element corners, any multiplicity): gather-only
     sum/broadcast over the unique corner vertices via the qsum/qcopy
     primitives (ops/gslib.py) on the tiny (4E,) corner slot array.
     (A dense NV x 4E incidence sandwich was tried first: at the reference
     cylinder mesh size that constant is ~130 MB in f64 and its two matmuls
     per dssum dominated the whole CG iteration — HBM/DRAM bound.)

All three are slices/pads/gathers: fast on TPU, fast to compile, and
transposed by JAX into the same op class (dssum is symmetric; qsum/qcopy
carry registered exact transposes). The seam table is derived purely from
the global numbering (edge-key matching), and the whole plan is verified
against the index-table dssum at build time.

This is the framework's production "gslib" (SURVEY.md §2.4 hard part #2);
ops/gslib.py remains as the unstructured fallback and build-time oracle.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

# Seam strips are tiny (O(seam-length x n) vs O(E n^2) fields) and genuinely
# cross shard boundaries; without an explicit sharding the GSPMD partitioner
# flip-flops their layout and logs "involuntary full rematerialization"
# before replicating them anyway (MULTICHIP_r02..r04 tails). Constraining
# them replicated makes that choice intentional: one all-gather of a few KB
# per seam, then purely local arithmetic.


def _hint_replicated(x, shard_hint):
    if shard_hint is None:
        return x
    from jax.sharding import NamedSharding, PartitionSpec
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(shard_hint[0], PartitionSpec()))


# ---------------------------------------------------------------------------
# host-side plan construction
# ---------------------------------------------------------------------------

_SIDES = ("0-", "0+", "1-", "1+")


def _canon_gid(mesh, blk):
    """gid of one block in canonical layout (b0, b1, k0, k1): node index k0
    varies along block axis 0."""
    e0, bx, by, orient = blk[0], blk[1], blk[2], blk[3]
    g = mesh.gid[e0:e0 + bx * by].reshape(bx, by, mesh.n, mesh.n)
    if orient == "swap":
        g = np.swapaxes(g, -1, -2)
    return g


def _side_strips(gid_b, side):
    """(t, n) node-gid strips along a block side, t = index along the side."""
    if side == "0-":
        return gid_b[0, :, 0, :]
    if side == "0+":
        return gid_b[-1, :, -1, :]
    if side == "1-":
        return gid_b[:, 0, :, 0]
    if side == "1+":
        return gid_b[:, -1, :, -1]
    raise ValueError(side)


def build_plan(mesh):
    """Returns (plan, vtab) — plan is a hashable nested tuple:
    (n, blocks, seams); seams are
    (blkA, sideA, ta0, length, blkB, sideB, tb0, step, node_flip);
    vtab = (vidx, vgid) gather tables for the corner-vertex exchange."""
    if mesh.blocks is None:
        return None, None
    n = mesh.n
    blocks = tuple(tuple(b) for b in mesh.blocks)
    gids = [_canon_gid(mesh, b) for b in blocks]

    # --- edge-key matching across block sides ---------------------------
    edge_map = {}
    pairs = []
    for bi, gb in enumerate(gids):
        for side in _SIDES:
            strips = _side_strips(gb, side)
            for t in range(strips.shape[0]):
                key = frozenset((int(strips[t, 0]), int(strips[t, -1])))
                if key in edge_map:
                    pairs.append((edge_map.pop(key), (bi, side, t)))
                else:
                    edge_map[key] = (bi, side, t)

    # group pairs into maximal runs: consecutive t on side A with the same
    # partner (block, side) and partner t forming an arithmetic +-1 sequence
    pairs.sort(key=lambda p: (p[0][0], p[0][1], p[0][2]))
    seams = []
    i = 0
    while i < len(pairs):
        a0, b0 = pairs[i]
        chain = [b0]
        j = i + 1
        while j < len(pairs):
            a1, b1 = pairs[j]
            if (a1[0], a1[1]) != (a0[0], a0[1]) \
                    or a1[2] != a0[2] + len(chain) \
                    or (b1[0], b1[1]) != (b0[0], b0[1]):
                break
            chain.append(b1)
            j += 1
        ts = [b[2] for b in chain]
        if len(ts) > 1 and all(t1 - t0 == 1 for t0, t1 in zip(ts, ts[1:])):
            step = 1
        elif len(ts) > 1 and all(t1 - t0 == -1 for t0, t1 in zip(ts, ts[1:])):
            step = -1
        elif len(ts) == 1:
            step = 1
        else:
            # non-arithmetic partner sequence: fall back to per-edge seams
            for k, b in enumerate(chain):
                seams.append(((a0[0], a0[1], a0[2] + k), b, 1, 1))
            i = j
            continue
        seams.append((a0, b0, len(chain), step))
        i = j

    # node order flip per seam (compare one element edge's gid sequence)
    seam_specs = []
    for (a, b, length, step) in seams:
        sa = _side_strips(gids[a[0]], a[1])[a[2]]
        sb = _side_strips(gids[b[0]], b[1])[b[2]]
        if np.array_equal(sa, sb):
            flip = False
        elif np.array_equal(sa, sb[::-1]):
            flip = True
        else:
            raise RuntimeError("seam node ordering mismatch — bad topology")
        seam_specs.append((a[0], a[1], a[2], length,
                           b[0], b[1], b[2], step, flip))

    # --- vertex gather tables on corner slots -----------------------------
    from .gslib import build_gs_tables
    gc = mesh.gid[:, ::n - 1, ::n - 1].reshape(-1)      # (4E,)
    verts, inv = np.unique(gc, return_inverse=True)
    vidx = build_gs_tables(inv.reshape(-1, 1), len(verts))
    vgid = inv.astype(np.int32)

    plan = (n, blocks, tuple(seam_specs))
    return plan, (vidx, vgid)


# ---------------------------------------------------------------------------
# runtime (jnp, all slices/pads/matmuls)
# ---------------------------------------------------------------------------

def _extract_block(u, blk, n):
    e0, bx, by, orient = blk[0], blk[1], blk[2], blk[3]
    B = u[..., e0:e0 + bx * by, :, :]
    B = B.reshape(B.shape[:-3] + (bx, by, n, n))
    if orient == "swap":
        B = jnp.swapaxes(B, -1, -2)
    return B


def _restore_block(B, blk, n):
    orient = blk[3]
    if orient == "swap":
        B = jnp.swapaxes(B, -1, -2)
    return B.reshape(B.shape[:-4] + (-1, n, n))


def _get_side(B, side):
    """Interior-node strips of a block side: (..., t, n-2)."""
    if side == "0-":
        return B[..., 0, :, 0, 1:-1]
    if side == "0+":
        return B[..., -1, :, -1, 1:-1]
    if side == "1-":
        return B[..., :, 0, 1:-1, 0]
    if side == "1+":
        return B[..., :, -1, 1:-1, -1]
    raise ValueError(side)


def _set_side(B, side, val):
    if side == "0-":
        return B.at[..., 0, :, 0, 1:-1].set(val)
    if side == "0+":
        return B.at[..., -1, :, -1, 1:-1].set(val)
    if side == "1-":
        return B.at[..., :, 0, 1:-1, 0].set(val)
    if side == "1+":
        return B.at[..., :, -1, 1:-1, -1].set(val)
    raise ValueError(side)


def _seam_slice(strips, t0, length, step):
    if step == 1:
        return strips[..., t0:t0 + length, :]
    # reversed partner ordering
    seg = strips[..., t0 - length + 1:t0 + 1, :]
    return jnp.flip(seg, axis=-2)


def _seam_place(strips, t0, length, step, val):
    if step == 1:
        return strips.at[..., t0:t0 + length, :].set(val)
    return strips.at[..., t0 - length + 1:t0 + 1, :].set(
        jnp.flip(val, axis=-2))


def dssum2(u, plan, vtab, shard_hint=None):
    """Direct-stiffness sum via the structured plan. u: (..., E, n, n).
    shard_hint: optional (device_mesh, axis) — replicates seam strips
    explicitly under SPMD (see _hint_replicated)."""
    from .gslib import qcopy, qsum
    n, blocks, seams = plan
    vidx, vgid = vtab
    lead = u.shape[:-3]

    # ---- 1. vertex dofs: gather-only sum/broadcast on corner slots ------
    corners = u[..., ::n - 1, ::n - 1]
    cflat = corners.reshape(lead + (-1,))
    tot = qsum(cflat, vidx, vgid)
    newc = qcopy(tot, vidx, vgid)
    newc = newc.reshape(corners.shape)
    c00 = newc[..., 0:1, 0:1]
    c01 = newc[..., 0:1, 1:2]
    c10 = newc[..., 1:2, 0:1]
    c11 = newc[..., 1:2, 1:2]
    pads = lambda a, r, c: jnp.pad(
        a, [(0, 0)] * (a.ndim - 2)
        + [(r, n - 1 - r), (c, n - 1 - c)])
    placed = (pads(c00, 0, 0) + pads(c01, 0, n - 1)
              + pads(c10, n - 1, 0) + pads(c11, n - 1, n - 1))
    cmask = jnp.zeros((n, n), u.dtype).at[0, 0].set(1).at[0, -1].set(1) \
        .at[-1, 0].set(1).at[-1, -1].set(1)
    u = u * (1 - cmask) + placed

    # ---- 2. edge-interior dofs: in-block + seam slice exchanges ---------
    Bs = [_extract_block(u, b, n) for b in blocks]
    for k, B in enumerate(Bs):
        s0 = B[..., :-1, :, -1, 1:-1] + B[..., 1:, :, 0, 1:-1]
        B = B.at[..., :-1, :, -1, 1:-1].set(s0).at[..., 1:, :, 0, 1:-1].set(s0)
        s1 = B[..., :, :-1, 1:-1, -1] + B[..., :, 1:, 1:-1, 0]
        B = B.at[..., :, :-1, 1:-1, -1].set(s1).at[..., :, 1:, 1:-1, 0].set(s1)
        Bs[k] = B

    for (ba, sa, ta0, length, bb, sb, tb0, step, flip) in seams:
        A = _hint_replicated(_get_side(Bs[ba], sa), shard_hint)
        Bv = _hint_replicated(_get_side(Bs[bb], sb), shard_hint)
        av = A[..., ta0:ta0 + length, :]
        bv = _seam_slice(Bv, tb0, length, step)
        if flip:
            bv = jnp.flip(bv, axis=-1)
        s = av + bv
        if ba == bb and sa == sb:
            raise NotImplementedError("self-matching side seam")
        A = A.at[..., ta0:ta0 + length, :].set(s)
        sflip = jnp.flip(s, axis=-1) if flip else s
        Bv = _seam_place(Bv, tb0, length, step, sflip)
        Bs[ba] = _set_side(Bs[ba], sa, A)
        Bs[bb] = _set_side(Bs[bb], sb, Bv)

    return jnp.concatenate([_restore_block(B, b, n)
                            for B, b in zip(Bs, blocks)], axis=-3)
