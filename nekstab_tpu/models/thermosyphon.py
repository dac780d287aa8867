"""Thermosyphon: Boussinesq natural convection in a closed annular loop.

Reference case: examples/thersyphon (annulus r in [1,2], 32x8 elements,
no-slip walls with temperature Dirichlet T = (1 + tanh(-20 y))/2 — hot
bottom / cold top — buoyancy f_y = Ra * Pr * T, viscosity nu = Pr,
conductivity 1; tsyphon.usr userf/userbc/useric + tsyphon.par). The state
carries temperature as a third component q = (u, v, T) (solver/stepper.py).

Non-dimensional mapping to NSConfig: nu = Pr  ->  re = 1/Pr, and the scalar
diffusivity kappa = nu/cfg.pr = 1  ->  cfg.pr = Pr; gvec = (0, Ra * Pr).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import NSConfig
from ..driver import FlowSystem
from ..mesh import annulus_mesh, dirichlet_values
from ..solver.stepper import CaseFields


def wall_temperature(x, y):
    return 0.5 * (1.0 + np.tanh(-20.0 * y))


def thermosyphon_system(n: int = 6, ra: float = 500.0, pr: float = 5.0,
                        dt: float = 2e-4, *, n_theta: int = 32, n_r: int = 8,
                        r_in: float = 1.0, r_out: float = 2.0,
                        dtype=jnp.float64, vtol: float = 1e-10,
                        ptol: float = 1e-9,
                        axis_name: str | None = None) -> FlowSystem:
    mesh = annulus_mesh(n, r_in=r_in, r_out=r_out, n_theta=n_theta, n_r=n_r)
    cfg = NSConfig(re=1.0 / pr, dt=dt, vtol=vtol, ptol=ptol,
                   boussinesq=True, pr=pr, gvec=(0.0, ra * pr))
    sys_ = FlowSystem(mesh, cfg, None, dtype=dtype, axis_name=axis_name)
    ctx = sys_.ctx

    def wall(x, y):
        return np.zeros_like(x), np.zeros_like(x), wall_temperature(x, y)

    u_bc = jnp.asarray(dirichlet_values(mesh, {"W": wall}, ncomp=3),
                       ctx.dtype)
    z = jnp.zeros_like(u_bc)
    sys_.case = CaseFields(u_bc=u_bc, f=z, sponge=jnp.zeros_like(ctx.bm),
                           sponge_ref=z)
    return sys_


def conduction_ic(sys_: FlowSystem):
    """Quiescent initial state: u = 0, T = wall profile extended to the bulk
    (useric, tsyphon.usr)."""
    ctx = sys_.ctx
    x, y = np.asarray(ctx.xcoord), np.asarray(ctx.ycoord)
    t0 = wall_temperature(x, y)
    q = np.zeros(ctx.mask_vel.shape)
    q[2] = t0
    return jnp.asarray(q, ctx.dtype)
