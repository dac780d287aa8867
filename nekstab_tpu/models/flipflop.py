"""Flip-flop: two side-by-side circular cylinders in a cross-flow.

Reference case family: examples/flip_flop (bistable gap-flow "flip-flop"
instability of the two-cylinder wake). Mesh: two O-grid rings (circular-arc
inner faces) around cylinders centred at (0, +/- sep/2), embedded in one
graded Cartesian frame whose line sets conform to both ring squares.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import NSConfig
from ..driver import FlowSystem
from ..mesh import Mesh2D, build_mesh, dirichlet_values, _grade
from ..solver.stepper import CaseFields
from ..utils.sponge import sponge_fun_box
from .cylinder import _ring_vertices


def flipflop_mesh(n: int = 6, *, radius: float = 0.5, sep: float = 1.5,
                  a: float = 0.7, xmin: float = -10.0, xmax: float = 30.0,
                  ymin: float = -10.0, ymax: float = 10.0,
                  nq: int = 6, n_ring: int = 3, ring_ratio: float = 3.0,
                  nx_left: int = 4, nx_right: int = 12, ny_outer: int = 4,
                  ny_gap: int = 2, grade_left: float = 0.25,
                  grade_right: float = 5.0, grade_side: float = 4.0) -> Mesh2D:
    """Two-cylinder mesh; cylinders at (0, +/- sep/2), diameter 2*radius.
    Requires sep/2 - a > 0 (non-overlapping ring squares)."""
    c1, c2 = -sep / 2.0, sep / 2.0
    if c2 - a <= c1 + a:
        raise ValueError("ring squares overlap: increase sep or decrease a")
    corners = []
    curves = {}
    blocks = []
    e = 0
    for cy in (c1, c2):
        ring = _ring_vertices(radius, a, nq, n_ring, ring_ratio)
        ring = ring + np.array([0.0, cy])
        npts = 4 * nq
        blocks.append((e, npts, n_ring, "swap"))
        for i in range(npts):
            ip = (i + 1) % npts
            for j in range(n_ring):
                c0 = ring[i, j]
                cc1 = ring[i, j + 1]
                cc2 = ring[ip, j + 1]
                cc3 = ring[ip, j]
                corners.append([c0, cc1, cc2, cc3])
                if j == 0:
                    curves[(e, "W")] = ("arc", 0.0, cy)
                e += 1

    s = np.linspace(-a, a, nq + 1)
    xl = _grade(xmin, -a, nx_left, grade_left)
    xr = _grade(a, xmax, nx_right, grade_right)
    yb = _grade(ymin, c1 - a, ny_outer, 1.0 / grade_side)
    yt = _grade(c2 + a, ymax, ny_outer, grade_side)
    ygap = np.linspace(c1 + a, c2 - a, ny_gap + 1)
    xsegs = [xl, s, xr]
    ysegs = [yb, c1 + s, ygap, c2 + s, yt]
    # 3x5 patch grid minus the two ring holes — block metadata for gslib2
    for py in range(5):
        for px in range(3):
            if px == 1 and py in (1, 3):
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
        return "W"

    m = build_mesh(n, np.asarray(corners), curves=curves, bc_fn=bc)
    m.blocks = tuple(blocks)
    return m


def flipflop_system(n: int = 6, re: float = 60.0, dt: float = 2.5e-3, *,
                    sponge_xl: float = 4.0, sponge_xr: float = 4.0,
                    sponge_strength: float = 1.7, dtype=jnp.float64,
                    vtol: float = 1e-9, ptol: float = 1e-7,
                    **mesh_kw) -> FlowSystem:
    mesh = flipflop_mesh(n, **mesh_kw)
    cfg = NSConfig(re=re, dt=dt, vtol=vtol, ptol=ptol)
    spng = sponge_fun_box(mesh.x, mesh.y, xl=sponge_xl, xr=sponge_xr)
    sys_ = FlowSystem(mesh, cfg, None, dtype=dtype, sponge_fun=spng,
                      sponge_strength=sponge_strength)
    ctx = sys_.ctx
    u_bc = jnp.asarray(dirichlet_values(
        mesh, {"V": lambda x, y: (np.ones_like(x), np.zeros_like(x))}),
        ctx.dtype)
    ones = jnp.ones_like(ctx.bm)
    u_inf = jnp.stack([ones, jnp.zeros_like(ctx.bm)])
    sys_.case = CaseFields(u_bc=u_bc, f=jnp.zeros_like(u_inf),
                           sponge=sponge_strength * sys_.sponge_fun,
                           sponge_ref=u_inf)
    return sys_
