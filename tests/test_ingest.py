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
    got = np.asarray(dssum2(jnp.asarray(u), plan, jnp.asarray(Rv)))
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
    got = np.asarray(dssum2(jnp.asarray(u), plan, jnp.asarray(Rv)))
    assert np.max(np.abs(got - _oracle_dssum(m, u))) < 1e-12
