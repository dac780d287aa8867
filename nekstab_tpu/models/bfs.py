"""Backward-facing step: transient-growth benchmark geometry.

Reference config: examples/back_fstep/transient_growth (Re=500,
direct-adjoint Arnoldi with k_dim=64, tol 1e-8 — BASELINE.md). Geometry:
inlet half-channel y in [0,1] for x<0, expansion to y in [-1,1] at the step
x=0 (step height 1), parabolic inflow, outflow at x=L_out.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import NSConfig
from ..driver import FlowSystem
from ..mesh import box_corners, build_mesh, dirichlet_values, _grade
from ..solver.stepper import CaseFields


def bfs_mesh(n: int = 6, *, l_in: float = 5.0, l_out: float = 25.0,
             nx_in: int = 4, nx_out: int = 14, ny_half: int = 4,
             grade_out: float = 4.0):
    """Conforming two-block BFS mesh (shared y-lines on the overlap)."""
    yv_up = np.linspace(0.0, 1.0, ny_half + 1)
    yv_lo = np.linspace(-1.0, 0.0, ny_half + 1)
    xv_in = np.linspace(-l_in, 0.0, nx_in + 1)
    xv_out = _grade(0.0, l_out, nx_out, grade_out)
    corners = np.concatenate([
        box_corners(xv_in, yv_up),                       # inlet block
        box_corners(xv_out, np.concatenate([yv_lo[:-1], yv_up])),  # outlet
    ])
    blocks = ((0, ny_half, nx_in, "swap"),
              (ny_half * nx_in, 2 * ny_half, nx_out, "swap"))

    def bc(x, y, nrm):
        if np.isclose(x, l_out):
            return "O"
        if np.isclose(x, -l_in):
            return "V"
        return "W"   # channel walls + step face + inlet bottom

    m = build_mesh(n, corners, bc_fn=bc)
    m.blocks = blocks
    return m


def bfs_system(n: int = 6, re: float = 500.0, dt: float = 2e-3, *,
               dtype=jnp.float64, vtol: float = 1e-9, ptol: float = 1e-8,
               axis_name: str | None = None, **mesh_kw) -> FlowSystem:
    mesh = bfs_mesh(n, **mesh_kw)
    cfg = NSConfig(re=re, dt=dt, vtol=vtol, ptol=ptol)
    sys_ = FlowSystem(mesh, cfg, None, dtype=dtype, axis_name=axis_name)
    ctx = sys_.ctx

    def inflow(x, y):
        # parabolic profile in the inlet half-channel, peak velocity 1
        return np.where((y >= 0) & (y <= 1), 4.0 * y * (1.0 - y), 0.0), \
            np.zeros_like(x)

    u_bc = jnp.asarray(dirichlet_values(mesh, {"V": inflow}), ctx.dtype)
    z2 = jnp.zeros_like(u_bc)
    sys_.case = CaseFields(u_bc=u_bc, f=z2, sponge=jnp.zeros_like(ctx.bm),
                           sponge_ref=z2)
    return sys_


def bfs_reference_system(re2_path: str, n: int = 6, re: float = 500.0,
                         dt: float = 2e-3, *, dtype=jnp.float64,
                         vtol: float = 1e-9, ptol: float = 1e-8,
                         dealias: bool | int = True,
                         sponge_xl: float = 5.0, sponge_xr: float = 10.0,
                         sponge_strength: float = 2.0,
                         host_direct: bool = False, scheme: str = "pnpn",
                         **cfg_kw) -> FlowSystem:
    """FlowSystem on the REFERENCE back_fstep discretization: ingest the
    v003 .re2 (examples/back_fstep/baseflow/bfs.re2) with the boundary-id
    table the reference sets in bfs.usr usrdat2 (setbc: 4 -> inflow 'v',
    2 -> outflow 'O', 3 -> wall 'W'), the same parabolic inflow
    4 y (1 - y) (compute_inflow, bfs.usr), and the transient-growth case's
    box sponge (bfs.par userParam08-10: left 5, right 10, strength 2)."""
    from ..io.re2 import mesh_from_re2
    from ..utils.sponge import sponge_fun_box
    mesh = mesh_from_re2(re2_path, n=n,
                         bid_map={1: "W", 2: "O", 3: "W", 4: "V"})
    cfg = NSConfig(re=re, dt=dt, vtol=vtol, ptol=ptol, **cfg_kw)
    spng = sponge_fun_box(mesh.x, mesh.y, xl=sponge_xl, xr=sponge_xr)
    sys_ = FlowSystem(mesh, cfg, None, dtype=dtype, dealias=dealias,
                      sponge_fun=spng, sponge_strength=sponge_strength,
                      host_direct=host_direct, scheme=scheme)
    ctx = sys_.ctx

    def inflow(x, y):
        return 4.0 * y * (1.0 - y), np.zeros_like(x)

    u_bc = jnp.asarray(dirichlet_values(mesh, {"V": inflow}), ctx.dtype)
    z2 = jnp.zeros_like(u_bc)
    sys_.case = CaseFields(u_bc=u_bc, f=z2,
                           sponge=sponge_strength * sys_.sponge_fun,
                           sponge_ref=z2)
    return sys_
