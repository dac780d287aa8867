"""Circular-cylinder flow: mesh generator + FlowSystem builder.

The flagship benchmark case (reference examples/cylinder/*): uniform inflow
past a D=1 cylinder; at Re=50 the steady base flow's leading global mode is
sigma = 1.567373e-2, omega = +/- 7.565285e-1 (BASELINE.md, reference
Spectre_NSd_conv.dat). The reference mesh is a 1996-element Nek5000 .re2
(not reproducible bit-for-bit); this generator builds an equivalent-topology
curvilinear mesh: an O-grid ring (circular-arc inner faces) blended to a
square, embedded in a graded Cartesian frame with a refined wake band.

Default domain and sponge follow the reference case: x in [-15, 35],
y in [-15, 15], sponge widths 5 on the x-extremes, strength 1.7
(examples/cylinder/stability/direct/1cyl.par:8-11).
"""

from __future__ import annotations

import numpy as np

from ..config import NSConfig
from ..driver import FlowSystem
from ..mesh import Mesh2D, build_mesh, dirichlet_values, _grade
from ..solver.stepper import CaseFields, zero_case_fields
from ..utils.sponge import sponge_fun_box

import jax.numpy as jnp


def _ring_vertices(radius: float, a: float, nq: int, n_ring: int,
                   ring_ratio: float):
    """Vertices of the O-grid between circle r=radius and square [-a,a]^2.

    Returns (pts (4nq, n_ring+1, 2), thetas): boundary walk CCW starting at
    angle -135deg (SW corner), square side split into nq segments."""
    s = np.linspace(-a, a, nq + 1)
    bnd = []
    # CCW starting at SW corner (-a,-a): south, east, north, west
    for i in range(nq):                      # south: y=-a, x rising
        bnd.append((s[i], -a))
    for i in range(nq):                      # east: x=a, y rising
        bnd.append((a, s[i]))
    for i in range(nq):                      # north: y=a, x falling
        bnd.append((s[nq - i], a))
    for i in range(nq):                      # west: x=-a, y falling
        bnd.append((-a, s[nq - i]))
    bnd = np.array(bnd)                      # (4nq, 2)
    th = np.arctan2(bnd[:, 1], bnd[:, 0])
    circ = radius * np.stack([np.cos(th), np.sin(th)], axis=1)
    t = _grade(0.0, 1.0, n_ring, ring_ratio)
    pts = circ[:, None, :] + t[None, :, None] * (bnd - circ)[:, None, :]
    return pts


def cylinder_mesh(n: int = 6, *, radius: float = 0.5, a: float = 2.5,
                  xmin: float = -15.0, xmax: float = 35.0,
                  ymin: float = -15.0, ymax: float = 15.0,
                  nq: int = 8, n_ring: int = 5, ring_ratio: float = 4.0,
                  nx_left: int = 5, nx_right: int = 16, ny_side: int = 5,
                  grade_left: float = 0.2, grade_right: float = 5.0,
                  grade_side: float = 5.0) -> Mesh2D:
    """O-grid + Cartesian frame cylinder mesh.

    nq: elements per square side (ring has 4*nq*n_ring elements);
    grade_*: geometric cell-size ratio across each outer band (small cells
    toward the cylinder/wake axis)."""
    ring = _ring_vertices(radius, a, nq, n_ring, ring_ratio)
    npts = 4 * nq
    corners = []
    curves = {}
    blocks = [(0, npts, n_ring, "swap")]
    e = 0
    for i in range(npts):
        ip = (i + 1) % npts
        for j in range(n_ring):
            # CCW quad: walking the ring CCW, (tangent, outward) is
            # negatively oriented, so order (inner_i, outer_i, outer_ip,
            # inner_ip); the cylinder arc is then the W face (c0 -> c3)
            c0 = ring[i, j]
            c1 = ring[i, j + 1]
            c2 = ring[ip, j + 1]
            c3 = ring[ip, j]
            corners.append([c0, c1, c2, c3])
            if j == 0:
                curves[(e, "W")] = ("arc", 0.0, 0.0)
            e += 1

    # Cartesian frame around the square: 8 structured patches (3x3 grid of
    # line segments minus the O-grid hole) — block metadata for gslib2
    s = np.linspace(-a, a, nq + 1)
    xl = _grade(xmin, -a, nx_left, grade_left)
    xr = _grade(a, xmax, nx_right, grade_right)
    yb = _grade(ymin, -a, ny_side, 1.0 / grade_side)
    yt = _grade(a, ymax, ny_side, grade_side)
    xsegs = [xl, s, xr]
    ysegs = [yb, s, yt]
    for py in range(3):
        for px in range(3):
            if px == 1 and py == 1:
                continue
            xv, yv = xsegs[px], ysegs[py]
            blocks.append((e, len(yv) - 1, len(xv) - 1, "swap"))
            for jy in range(len(yv) - 1):
                for ix in range(len(xv) - 1):
                    x0, x1 = xv[ix], xv[ix + 1]
                    y0, y1 = yv[jy], yv[jy + 1]
                    corners.append([[x0, y0], [x1, y0], [x1, y1], [x0, y1]])
                    e += 1

    def bc(x, y, nrm):
        if np.isclose(x, xmax):
            return "O"
        if np.isclose(x, xmin) or np.isclose(y, ymax) or np.isclose(y, ymin):
            return "V"
        return "W"               # cylinder surface

    m = build_mesh(n, np.asarray(corners), curves=curves, bc_fn=bc)
    m.blocks = tuple(blocks)
    return m


def cylinder_system(n: int = 6, re: float = 50.0, dt: float = 2.5e-3,
                    *, sponge_xl: float = 5.0, sponge_xr: float = 5.0,
                    sponge_strength: float = 1.7, dtype=jnp.float64,
                    vtol: float = 1e-9, ptol: float = 1e-7,
                    axis_name: str | None = None, dealias: bool | int = False,
                    host_direct: bool = False, scheme: str = "pnpn",
                    pressure_precond: bool | str = True,
                    **mesh_kw) -> FlowSystem:
    """FlowSystem for the cylinder benchmark (freestream u=(1,0), outflow at
    x=xmax, box sponge at the x-extremes as the reference case)."""
    mesh = cylinder_mesh(n, **mesh_kw)
    cfg = NSConfig(re=re, dt=dt, vtol=vtol, ptol=ptol)
    spng = sponge_fun_box(mesh.x, mesh.y, xl=sponge_xl, xr=sponge_xr)
    sys = FlowSystem(mesh, cfg, None, dtype=dtype, axis_name=axis_name,
                     sponge_fun=spng, sponge_strength=sponge_strength,
                     dealias=dealias, host_direct=host_direct, scheme=scheme,
                     pressure_precond=pressure_precond)
    ctx = sys.ctx
    u_bc = jnp.asarray(dirichlet_values(
        mesh, {"V": lambda x, y: (np.ones_like(x), np.zeros_like(x))}),
        ctx.dtype)
    ones = jnp.ones_like(ctx.bm)
    u_inf = jnp.stack([ones, jnp.zeros_like(ctx.bm)])
    sys.case = CaseFields(u_bc=u_bc, f=jnp.zeros_like(u_inf),
                          sponge=sponge_strength * sys.sponge_fun,
                          sponge_ref=u_inf)
    return sys


def cylinder_reference_system(fld_path: str, *, re: float = 50.0,
                              dt: float = 2.5e-3,
                              sponge_xl: float = 5.0, sponge_xr: float = 5.0,
                              sponge_strength: float = 1.7,
                              dtype=jnp.float64,
                              vtol: float = 1e-9, ptol: float = 1e-7,
                              dealias: bool | int = True,
                              pressure_precond: bool = True,
                              host_direct: bool = False,
                              scheme: str = "pnpn",
                              **cfg_kw):
    """FlowSystem on the REFERENCE discretization: ingest the curved GLL
    geometry carried by a reference field file (e.g. the shipped converged
    base flow BF_1cyl0.f00001, examples/cylinder/stability/direct) via
    io/nekfile.py + mesh_from_coords, with the reference case's BCs and box
    sponge (1cyl.par: sponge L/R = userParam08/09 = 5, strength = 1.7).
    Returns (sys, base_u): the system and the file's velocity field — so the
    eigensolver can run about the reference's own converged base flow for a
    like-for-like gold-value comparison (BASELINE.md)."""
    from ..io.nekfile import read_fld
    from ..mesh import mesh_from_coords
    from ..mesh_blocks import canonicalize_coords

    d = read_fld(fld_path)
    # recover the structured-block layout so the fast slice-exchange
    # gather-scatter applies (mesh_blocks.py; ~5 blocks for this mesh)
    x, y, blocks, tf = canonicalize_coords(d["x"], d["y"])
    xmax = x.max()
    ymin, ymax = y.min(), y.max()

    def bc(xm, ym, nrm):
        if np.hypot(xm, ym) < 1.0:
            return "W"                      # cylinder wall (D=1 at origin)
        if xm > xmax - 1e-6 * max(abs(xmax), 1.0):
            return "O"
        return "V"                          # inflow Dirichlet

    # the reference case is PERIODIC in y (1cyl.re2 'P' faces at y = +/-16);
    # fold the top boundary onto the bottom in the global numbering
    def pmap(xx, yy):
        return xx, np.where(np.isclose(yy, ymax, atol=1e-9 * (ymax - ymin)),
                            ymin, yy)

    mesh = mesh_from_coords(x, y, bc_fn=bc, periodic_map=pmap)
    mesh.blocks = blocks
    cfg = NSConfig(re=re, dt=dt, vtol=vtol, ptol=ptol, **cfg_kw)
    spng = sponge_fun_box(mesh.x, mesh.y, xl=sponge_xl, xr=sponge_xr)
    sys = FlowSystem(mesh, cfg, None, dtype=dtype, sponge_fun=spng,
                     sponge_strength=sponge_strength, dealias=dealias,
                     host_direct=host_direct, scheme=scheme,
                     pressure_precond=pressure_precond)
    ctx = sys.ctx
    u_bc = jnp.asarray(dirichlet_values(
        mesh, {"V": lambda xx, yy: (np.ones_like(xx), np.zeros_like(xx))}),
        ctx.dtype)
    base_u = jnp.asarray(np.stack([tf(d["u"]), tf(d["v"])]), ctx.dtype)
    # sponge REFERENCE field = the loaded state, the reference's semantics
    # (spng_init copies vx -> spng_vr at init, core/utils.f:244): the DNS/
    # Newton sponge force str*ramp*(spng_vr - u) then VANISHES at the
    # loaded base flow. Sponging toward freestream instead (the r1-r4
    # convention) converges to a measurably different base flow and was
    # ~96% of the four-round gold eigenvalue gap: dsigma +9.5e-4 -> +3.9e-5
    # (out/gold/gap_diagnosis_pnpn2.json, round 5).
    sys.case = CaseFields(u_bc=u_bc, f=jnp.zeros_like(base_u),
                          sponge=sponge_strength * sys.sponge_fun,
                          sponge_ref=base_u)
    return sys, base_u


def freestream_ic(sys: FlowSystem):
    """Uniform (1,0) initial condition respecting the Dirichlet BCs."""
    ctx = sys.ctx
    ones = jnp.ones_like(ctx.bm)
    u = jnp.stack([ones, jnp.zeros_like(ctx.bm)])
    return ctx.mask_vel * u + (1 - ctx.mask_vel) * sys.case.u_bc
