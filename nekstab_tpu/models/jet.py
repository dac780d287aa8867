"""Axisymmetric round jet (the reference tpjet case).

Reference: examples/tpjet — axisymmetric (Nek5000 ifaxis) incompressible jet
at Re=2005 with the hyperbolic-tangent nozzle-exit profile
    u(r) = 1/2 (1 - tanh[(1/(4 theta0)) (r - 1/(4 r))]),  theta0 = 0.025
(examples/tpjet/.../tpjet.usr set_rjet via core/utils.f:576-587) and a
harmonically pulsed inlet u_bc * (1 + a cos(2 pi St t)), St = uparam(5) = 0.60,
a = 0.05 (tpjet.usr userbc). Base-flow modes: TDF-forced periodic orbit
(uparam 1.4) / Newton UPO (2.2); Floquet stability on top.

The reference ships the mesh as a binary .re2; here the meridional (x, r)
domain is generated programmatically with grading that concentrates elements
in the shear layer (r ~ 0.5) and near the nozzle.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import NSConfig
from ..driver import FlowSystem
from ..mesh import box_mesh, dirichlet_values
from ..solver.stepper import CaseFields
from ..utils.sponge import sponge_fun_box

THETA0 = 0.025
PULSE_AMPLITUDE = 0.05


def rjet_profile(r: np.ndarray, theta0: float = THETA0) -> np.ndarray:
    """Tanh round-jet profile; the r -> 0 limit is 1 (the 1/(4r) pole makes
    tanh -> -1 on the axis)."""
    r = np.asarray(r, dtype=float)
    rs = np.where(r < 1e-12, 1e-12, r)
    u = 0.5 * (1.0 - np.tanh((1.0 / (4.0 * theta0)) * (rs - 1.0 / (4.0 * rs))))
    return np.where(r < 1e-12, 1.0, u)


def _graded_lines(L: float, R: float, nx: int, nr: int):
    """Vertex lines: axial concentration at the nozzle, radial concentration
    in the shear layer around r = 0.5."""
    # axial: geometric stretch away from x=0
    t = np.linspace(0.0, 1.0, nx + 1)
    xv = L * (np.exp(2.2 * t) - 1.0) / (np.exp(2.2) - 1.0)
    # radial: half the elements inside r<=1 (GLL-like clustering near 0.5)
    n_in = max(2, nr // 2)
    n_out = nr - n_in
    rv_in = 0.5 * (1.0 - np.cos(np.linspace(0.0, np.pi, n_in + 1)))  # [0,1]
    t2 = np.linspace(0.0, 1.0, n_out + 1)[1:]
    rv_out = 1.0 + (R - 1.0) * (np.exp(2.0 * t2) - 1.0) / (np.exp(2.0) - 1.0)
    rv = np.concatenate([rv_in, rv_out])
    return xv, rv


def jet_system(n: int = 7, re: float = 2005.0, dt: float = 2.5e-3,
               *, L: float = 40.0, R: float = 5.0, nx: int = 20, nr: int = 8,
               sponge_xr: float = 10.0, sponge_strength: float = 1.0,
               theta0: float = THETA0, dtype=jnp.float64,
               vtol: float = 1e-9, ptol: float = 1e-8,
               dealias: bool | int = True, **cfg_kw) -> FlowSystem:
    """FlowSystem for the pulsed axisymmetric jet: inflow 'V' at x=0 (tanh
    profile + optional harmonic pulsing via case.u_bc_osc), axis 'A' at r=0,
    outflow 'O' at x=L and at the lateral far field r=R (entrainment),
    outflow sponge as the reference case."""

    def bc(x, y, nrm):
        if y < 1e-8:
            return "A"
        if x < 1e-8:
            return "V"
        return "O"

    xv, rv = _graded_lines(L, R, nx, nr)
    mesh = box_mesh(n, nx, nr, 0.0, L, 0.0, R, bc_fn=bc, xv=xv, yv=rv)
    assert mesh.axisym
    cfg = NSConfig(re=re, dt=dt, vtol=vtol, ptol=ptol, **cfg_kw)
    spng = sponge_fun_box(mesh.x, mesh.y, xr=sponge_xr)
    sys = FlowSystem(mesh, cfg, None, dtype=dtype, sponge_fun=spng,
                     sponge_strength=sponge_strength, dealias=dealias)
    ctx = sys.ctx

    u_bc = jnp.asarray(dirichlet_values(
        mesh, {"V": lambda x, y: (rjet_profile(y, theta0),
                                  np.zeros_like(y))}), ctx.dtype)
    # sponge target: the (steady) inlet profile advected downstream
    uref = jnp.stack([jnp.asarray(rjet_profile(np.asarray(ctx.ycoord),
                                               theta0), ctx.dtype),
                      jnp.zeros_like(ctx.bm)])
    sys.case = CaseFields(u_bc=u_bc, f=jnp.zeros_like(uref),
                          sponge=sponge_strength * sys.sponge_fun,
                          sponge_ref=uref,
                          u_bc_osc=PULSE_AMPLITUDE * u_bc)
    return sys


def jet_reference_system(re2_path: str, n: int = 7, re: float = 2005.0,
                         dt: float = 2e-3, *, sponge_xr: float = 10.0,
                         sponge_strength: float = 1.0,
                         theta0: float = THETA0, dtype=jnp.float64,
                         vtol: float = 1e-9, ptol: float = 1e-8,
                         dealias: bool | int = True,
                         host_direct: bool = False,
                         **cfg_kw) -> FlowSystem:
    """FlowSystem on the REFERENCE tpjet discretization: ingest the .re2
    (examples/tpjet/baseflow/tdf/tpjet.re2 — 4800 elements, one structured
    block, axis 'A' faces) with the reference's tanh inlet profile and
    pulsed-inlet shape (tpjet.usr userbc), viscosity -2005 (tpjet.par)."""
    from ..io.re2 import mesh_from_re2
    mesh = mesh_from_re2(re2_path, n=n)
    assert mesh.axisym, "tpjet mesh must carry axis 'A' faces"
    cfg = NSConfig(re=re, dt=dt, vtol=vtol, ptol=ptol, **cfg_kw)
    spng = sponge_fun_box(mesh.x, mesh.y, xr=sponge_xr)
    sys = FlowSystem(mesh, cfg, None, dtype=dtype, sponge_fun=spng,
                     sponge_strength=sponge_strength, dealias=dealias,
                     host_direct=host_direct)
    ctx = sys.ctx
    u_bc = jnp.asarray(dirichlet_values(
        mesh, {"V": lambda x, y: (rjet_profile(y, theta0),
                                  np.zeros_like(y))}), ctx.dtype)
    uref = jnp.stack([jnp.asarray(rjet_profile(np.asarray(ctx.ycoord),
                                               theta0), ctx.dtype),
                      jnp.zeros_like(ctx.bm)])
    sys.case = CaseFields(u_bc=u_bc, f=jnp.zeros_like(uref),
                          sponge=sponge_strength * sys.sponge_fun,
                          sponge_ref=uref,
                          u_bc_osc=PULSE_AMPLITUDE * u_bc)
    return sys


def jet_ic(sys: FlowSystem):
    """Initial condition: the inlet profile everywhere (reference useric,
    tpjet.usr: ux = ubb, uy = 0)."""
    ctx = sys.ctx
    u = jnp.stack([jnp.asarray(rjet_profile(np.asarray(ctx.ycoord)),
                               ctx.dtype), jnp.zeros_like(ctx.bm)])
    return ctx.mask_vel * u + (1 - ctx.mask_vel) * sys.case.u_bc


def pulse_wave(st: float = 0.60):
    """bc_wave(t) for the harmonically pulsed inlet: cos(2 pi St t)
    (amplitude carried by case.u_bc_osc)."""
    return lambda t: np.cos(2.0 * np.pi * st * t)
