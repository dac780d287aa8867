import numpy as np

from nekstab_tpu.mesh import box_mesh, build_mesh


def _bc_all_wall(x, y, nrm):
    return "W"


def test_box_mesh_counts_and_multiplicity():
    n, nx, ny = 5, 3, 4
    m = box_mesh(n, nx, ny, 0.0, 1.0, 0.0, 2.0, bc_fn=_bc_all_wall)
    assert m.nelem == nx * ny
    # unique dofs of a conforming tensor grid
    assert m.nglobal == (nx * (n - 1) + 1) * (ny * (n - 1) + 1)
    # interior vertex shared by 4 elements
    assert m.mult.max() == 4
    assert m.mult.min() == 1
    # corner coordinates match between sharing elements (numbering consistency)
    flat_x = m.x.ravel()
    flat_y = m.y.ravel()
    for g in (0, m.nglobal // 2, m.nglobal - 1):
        sel = (m.gid == g).ravel()
        assert np.allclose(flat_x[sel], flat_x[sel][0], atol=1e-12)
        assert np.allclose(flat_y[sel], flat_y[sel][0], atol=1e-12)


def test_box_mesh_boundary_masks():
    n = 4
    m = box_mesh(n, 2, 2, 0.0, 1.0, 0.0, 1.0, bc_fn=_bc_all_wall)
    on_bdry = (np.isclose(m.x, 0) | np.isclose(m.x, 1)
               | np.isclose(m.y, 0) | np.isclose(m.y, 1))
    assert np.array_equal(m.mask_u == 0, on_bdry)
    assert np.array_equal(m.mask_v == 0, on_bdry)
    assert np.all(m.mask_p == 1)
    assert not m.has_outflow
    assert len(m.bc_faces) == 8


def test_periodic_box_numbering():
    n, nx, ny = 4, 3, 3
    m = box_mesh(n, nx, ny, 0.0, 1.0, 0.0, 1.0,
                 periodic_x=True, periodic_y=True)
    assert m.nglobal == (nx * (n - 1)) * (ny * (n - 1))
    assert len(m.bc_faces) == 0  # fully periodic: no boundary faces
    assert np.all(m.mask_u == 1) and np.all(m.mask_v == 1)


def test_mixed_bc_tags():
    def bc(x, y, nrm):
        if np.isclose(x, 2.0):
            return "O"
        if np.isclose(y, 0.0) or np.isclose(y, 1.0):
            return "SYM"
        return "V"

    m = box_mesh(5, 4, 2, 0.0, 2.0, 0.0, 1.0, bc_fn=bc)
    assert m.has_outflow
    # outflow face: velocity free, pressure pinned
    out = np.isclose(m.x, 2.0)
    corner = out & (np.isclose(m.y, 0.0) | np.isclose(m.y, 1.0))
    assert np.all(m.mask_p[out] == 0)
    assert np.all(m.mask_u[out & ~corner] == 1)
    # SYM top/bottom: v masked, u free except inflow corners
    sym = (np.isclose(m.y, 0.0) | np.isclose(m.y, 1.0))
    assert np.all(m.mask_v[sym] == 0)
    inflow = np.isclose(m.x, 0.0)
    assert np.all(m.mask_u[inflow] == 0)
    assert np.all(m.mask_u[sym & ~inflow & ~out] == 1)


def test_curved_element_jacobian():
    # annular quarter ring built from two curved elements
    from nekstab_tpu.ops.context import geometry_factors
    r0, r1 = 0.5, 1.0
    th = np.linspace(0, np.pi / 2, 3)
    corners = []
    curves = {}
    for e in range(2):
        t0, t1 = th[e], th[e + 1]
        c0 = [r0 * np.cos(t0), r0 * np.sin(t0)]
        c1 = [r1 * np.cos(t0), r1 * np.sin(t0)]
        c2 = [r1 * np.cos(t1), r1 * np.sin(t1)]
        c3 = [r0 * np.cos(t1), r0 * np.sin(t1)]
        corners.append([c0, c1, c2, c3])
        curves[(e, "E")] = ("arc", 0.0, 0.0)   # c1->c2 outer arc
        curves[(e, "W")] = ("arc", 0.0, 0.0)   # c0->c3 inner arc
    m = build_mesh(6, np.array(corners), curves=curves, bc_fn=_bc_all_wall)
    g = geometry_factors(m)
    assert np.all(g["jac"] > 0)
    # area of the quarter annulus
    area = g["bm"].sum()
    exact = np.pi / 4 * (r1 ** 2 - r0 ** 2)
    assert np.isclose(area, exact, rtol=1e-6)
