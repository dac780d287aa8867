"""Mesh/field ingestion tests: Nek field-file roundtrip, mesh_from_coords,
structured-block recovery (mesh_blocks.py).

Reference interop surface: nekStab exchanges all state through Nek5000
'#std' field files (core/IO.f, SURVEY.md §2 "Checkpoint I/O"); the TPU build
reads/writes that format and rebuilds its fast gather-scatter plan from the
ingested geometry alone.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from nekstab_tpu.io.nekfile import read_fld, write_fld
from nekstab_tpu.mesh import annulus_mesh, box_mesh, mesh_from_coords
from nekstab_tpu.mesh_blocks import canonicalize_coords, detect_blocks
from nekstab_tpu.models.cylinder import cylinder_mesh


def test_nekfile_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    E, n = 7, 5
    x = rng.normal(size=(E, n, n))
    y = rng.normal(size=(E, n, n))
    u = rng.normal(size=(E, n, n))
    v = rng.normal(size=(E, n, n))
    p = rng.normal(size=(E, n, n))
    t = rng.normal(size=(E, n, n))
    path = str(tmp_path / "rt0.f00001")
    write_fld(path, x=x, y=y, u=u, v=v, p=p, t=t, time=3.25, cycle=42)
    d = read_fld(path)
    assert d["time"] == 3.25 and d["cycle"] == 42 and d["n"] == n
    for k, a in (("x", x), ("y", y), ("u", u), ("v", v), ("p", p), ("t", t)):
        assert np.array_equal(d[k], a), k


def test_nekfile_f32(tmp_path):
    rng = np.random.default_rng(1)
    u = rng.normal(size=(3, 4, 4))
    path = str(tmp_path / "rt1.f00001")
    write_fld(path, u=u, v=0 * u, wdsize=4)
    d = read_fld(path)
    assert d["wdsize"] == 4
    assert np.allclose(d["u"], u, atol=1e-6)


def test_mesh_from_coords_matches_generated():
    """Rebuilding a generated mesh from its own coordinates reproduces the
    connectivity and masks."""
    m0 = box_mesh(5, 3, 2, 0.0, 1.5, 0.0, 1.0, bc_fn=lambda x, y, n: "W")
    m = mesh_from_coords(m0.x, m0.y, bc_fn=lambda x, y, n: "W")
    assert m.nglobal == m0.nglobal
    assert np.array_equal(m.mask_u, m0.mask_u)
    assert np.array_equal(m.mult, m0.mult)


def _oracle_dssum(m, u):
    from nekstab_tpu.ops.gslib import build_gs_tables, qcopy, qsum
    gs_idx = build_gs_tables(m.gid, m.nglobal)
    g = qsum(jnp.asarray(u.reshape(-1)), jnp.asarray(gs_idx),
             jnp.asarray(m.gid.reshape(-1)))
    return np.asarray(qcopy(g, jnp.asarray(gs_idx),
                            jnp.asarray(m.gid.reshape(-1)))).reshape(u.shape)


@pytest.mark.parametrize("mesh_fn,name", [
    (lambda: box_mesh(5, 4, 3, 0.0, 2.0, 0.0, 1.0,
                      bc_fn=lambda x, y, n: "W"), "box"),
    (lambda: annulus_mesh(5, n_theta=12, n_r=3), "annulus-ring"),
    (lambda: cylinder_mesh(5), "cylinder-ogrid"),
])
def test_block_recovery(mesh_fn, name):
    """Blocks recovered from raw coordinates reproduce the slice-exchange
    dssum exactly (oracle: index-table gather-scatter)."""
    m0 = mesh_fn()
    x2, y2, blocks, tf = canonicalize_coords(m0.x, m0.y)
    m = mesh_from_coords(x2, y2, bc_fn=lambda x, y, n: "W")
    m.blocks = blocks
    from nekstab_tpu.ops.gslib2 import build_plan, dssum2
    plan, Rv = build_plan(m)
    assert plan is not None
    rng = np.random.default_rng(3)
    u = rng.normal(size=(m.nelem, m.n, m.n))
    got = np.asarray(dssum2(jnp.asarray(u), plan,
                            tuple(jnp.asarray(a) for a in Rv)))
    assert np.max(np.abs(got - _oracle_dssum(m, u))) < 1e-12


def test_robust_matching_noisy_coords():
    """Float32-level coordinate noise (as found in real .re2 files) must not
    split shared dofs when a match tolerance is given."""
    m0 = box_mesh(5, 3, 2, 0.0, 1.5, 0.0, 1.0, bc_fn=lambda x, y, n: "W")
    rng = np.random.default_rng(5)
    x = m0.x + 3e-7 * rng.normal(size=m0.x.shape)
    y = m0.y + 3e-7 * rng.normal(size=m0.y.shape)
    m = mesh_from_coords(x, y, bc_fn=lambda xx, yy, n: "W", match_tol=1e-5)
    assert m.nglobal == m0.nglobal
    assert np.array_equal(np.sort(m.mult.reshape(-1)),
                          np.sort(m0.mult.reshape(-1)))


def _write_re2(path, corners, curves=(), bcs=(), version=b"#v002"):
    """Synthesize a minimal little-endian .re2 (2D) for parser tests.
    curves: (ieg, iside, radius); bcs: (ieg, iside, params5, cbc3)."""
    import struct
    E = corners.shape[0]
    hdr = (version + f" {E:8d}  2 {E:8d} hdr".encode()).ljust(80)
    with open(path, "wb") as fh:
        fh.write(hdr)
        np.asarray([6.54321], "<f4").tofile(fh)
        for e in range(E):
            rec = np.concatenate([[0.0], corners[e, :, 0], corners[e, :, 1]])
            np.asarray(rec, "<f8").tofile(fh)
        np.asarray([float(len(curves))], "<f8").tofile(fh)
        for (ieg, iside, rad) in curves:
            np.asarray([ieg, iside, rad, 0, 0, 0, 0], "<f8").tofile(fh)
            fh.write(b"C       ")
        np.asarray([float(len(bcs))], "<f8").tofile(fh)
        for (ieg, iside, params, cbc) in bcs:
            np.asarray([ieg, iside] + list(params), "<f8").tofile(fh)
            fh.write(cbc.encode().ljust(8))


def test_re2_roundtrip_parse(tmp_path):
    """Two-element strip with a circular-arc edge and explicit cbc records:
    the parser must reproduce geometry, arc centre and BC tags."""
    from nekstab_tpu.io.re2 import mesh_from_re2, read_re2
    corners = np.array([
        [[0.0, 1.0], [1.0, 1.0], [1.0, 2.0], [0.0, 2.0]],
        [[1.0, 1.0], [2.0, 1.0], [2.0, 2.0], [1.0, 2.0]],
    ])
    # arc on elem 1 face 1 (S edge (0,1)->(1,1)), radius -1.414.. centred
    # right of the directed edge: centre (0.5, 1-1) = below
    rad = np.hypot(0.5, 1.0)
    bcs = []
    for e, sides in ((1, [1, 3, 4]), (2, [1, 2, 3])):
        for s in sides:
            bcs.append((e, s, [0.0] * 5, "W"))
    path = str(tmp_path / "strip.re2")
    _write_re2(path, corners, curves=[(1, 1, -rad)], bcs=bcs)
    raw = read_re2(path)
    assert raw["nelgt"] == 2
    kind, xc, yc = raw["curves"][(0, "S")]
    assert kind == "arc"
    assert (xc, yc) == pytest.approx((0.5, 0.0), abs=1e-12)
    m = mesh_from_re2(path, n=5, recover_blocks=False)
    assert len(m.faces_with_tag("W")) == 6
    # curved S edge of elem 0 lies on the circle of radius rad about (.5, 0)
    from nekstab_tpu.mesh import face_index
    idx = face_index("S", 5)
    r = np.hypot(m.x[0][idx] - 0.5, m.y[0][idx])
    assert np.allclose(r, rad, atol=1e-12)


def test_re2_v003_boundary_ids(tmp_path):
    from nekstab_tpu.io.re2 import mesh_from_re2
    corners = np.array([
        [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]],
        [[1.0, 0.0], [2.0, 0.0], [2.0, 1.0], [1.0, 1.0]],
    ])
    import struct
    path = str(tmp_path / "bid.re2")
    # v003: MSH records with boundary id in the last param slot
    bcs = []
    for e, sides in ((1, [1, 3, 4]), (2, [1, 2, 3])):
        for s in sides:
            bid = 4 if (e, s) == (1, 4) else (2 if (e, s) == (2, 2) else 3)
            bcs.append((e, s, [0, 0, 0, 0, float(bid)], "MSH"))
    _write_re2(path, corners, bcs=bcs, version=b"#v003")
    with pytest.raises(ValueError):
        mesh_from_re2(path, n=4, recover_blocks=False)   # no bid_map
    m = mesh_from_re2(path, n=4, recover_blocks=False,
                      bid_map={2: "O", 3: "W", 4: "V"})
    assert len(m.faces_with_tag("V")) == 1
    assert len(m.faces_with_tag("O")) == 1
    assert len(m.faces_with_tag("W")) == 4 and m.has_outflow


_REF = "/root/reference/examples"


@pytest.mark.skipif(not __import__("os").path.isdir(_REF),
                    reason="reference tree not mounted")
def test_reference_meshes_ingest():
    """All three reference benchmark meshes build (cylinder v002 arcs +
    periodic; tpjet axisym; BFS v003 boundary ids) with BC counts matching
    the files' own records."""
    from nekstab_tpu.io.re2 import mesh_from_re2
    m = mesh_from_re2(f"{_REF}/cylinder/stability/direct/1cyl.re2", n=6)
    assert (m.nelem, len(m.faces_with_tag("W")),
            len(m.faces_with_tag("V")), len(m.faces_with_tag("O"))) \
        == (1996, 16, 30, 30)
    assert m.blocks is not None
    mj = mesh_from_re2(f"{_REF}/tpjet/baseflow/tdf/tpjet.re2", n=5)
    assert mj.axisym and mj.nelem == 4800 and len(mj.blocks) == 1
    mb = mesh_from_re2(f"{_REF}/back_fstep/baseflow/bfs.re2", n=5,
                       bid_map={1: "W", 2: "O", 3: "W", 4: "V"})
    assert mb.nelem == 1670 and mb.has_outflow


def test_block_recovery_scrambled():
    """Recovery is invariant to element order and orientation: scramble a
    mesh (permute elements, rotate node blocks) and recover a working plan."""
    m0 = box_mesh(5, 4, 3, 0.0, 2.0, 0.0, 1.0, bc_fn=lambda x, y, n: "W")
    rng = np.random.default_rng(7)
    perm = rng.permutation(m0.nelem)
    rots = rng.integers(0, 4, m0.nelem)
    x, y = np.array(m0.x[perm]), np.array(m0.y[perm])
    for e in range(m0.nelem):
        x[e] = np.rot90(x[e], rots[e])
        y[e] = np.rot90(y[e], rots[e])
    x2, y2, blocks, tf = canonicalize_coords(x, y)
    m = mesh_from_coords(x2, y2, bc_fn=lambda xx, yy, n: "W")
    m.blocks = blocks
    from nekstab_tpu.ops.gslib2 import build_plan, dssum2
    plan, Rv = build_plan(m)
    u = np.random.default_rng(8).normal(size=(m.nelem, m.n, m.n))
    got = np.asarray(dssum2(jnp.asarray(u), plan,
                            tuple(jnp.asarray(a) for a in Rv)))
    assert np.max(np.abs(got - _oracle_dssum(m, u))) < 1e-12
