"""Kovasznay flow: steady analytic Navier-Stokes solution on a channel.

Validation case for the steady solvers (Newton, SFD): the exact solution
    u = 1 - e^{lam x} cos(2 pi y),  v = (lam / 2 pi) e^{lam x} sin(2 pi y)
    lam = Re/2 - sqrt(Re^2/4 + 4 pi^2)
is imposed as Dirichlet data on the whole boundary; the discrete steady state
must converge to it spectrally.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import NSConfig
from ..driver import FlowSystem
from ..mesh import box_mesh, dirichlet_values
from ..solver.stepper import CaseFields


def kovasznay_lambda(re: float) -> float:
    return re / 2.0 - np.sqrt(re * re / 4.0 + 4.0 * np.pi ** 2)


def kovasznay_exact(re: float, x, y):
    lam = kovasznay_lambda(re)
    u = 1.0 - np.exp(lam * x) * np.cos(2 * np.pi * y)
    v = lam / (2 * np.pi) * np.exp(lam * x) * np.sin(2 * np.pi * y)
    return u, v


def channel_system(n: int = 7, nelx: int = 4, nely: int = 4,
                   re: float = 40.0, dt: float = 2e-3, *,
                   dtype=jnp.float64, vtol: float = 1e-11,
                   ptol: float = 1e-10, scheme: str = "pnpn",
                   host_direct: bool = False) -> FlowSystem:
    mesh = box_mesh(n, nelx, nely, -0.5, 1.0, -0.5, 0.5,
                    bc_fn=lambda x, y, nrm: "V")
    cfg = NSConfig(re=re, dt=dt, vtol=vtol, ptol=ptol)
    sys = FlowSystem(mesh, cfg, None, dtype=dtype, scheme=scheme,
                     host_direct=host_direct)
    ctx = sys.ctx
    u_bc = jnp.asarray(
        dirichlet_values(mesh, {"V": lambda x, y: kovasznay_exact(re, x, y)}),
        ctx.dtype)
    z2 = jnp.zeros_like(u_bc)
    sys.case = CaseFields(u_bc=u_bc, f=z2, sponge=jnp.zeros_like(ctx.bm),
                          sponge_ref=z2)
    return sys
