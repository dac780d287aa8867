"""Regularized lid-driven cavity (enclosed flow, no sponge/outflow).

Reference configs: lid-driven cavity linear stability (direct + adjoint +
structural sensitivity) is one of the driver benchmark configs
(BASELINE.json). The lid velocity is regularized, u(x) = 16 x^2 (1-x)^2, so
the corner singularities of the sharp lid do not pollute spectral convergence.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..config import NSConfig
from ..driver import FlowSystem
from ..mesh import box_mesh, dirichlet_values
from ..solver.stepper import CaseFields


def cavity_system(n: int = 7, nel: int = 6, re: float = 1000.0,
                  dt: float = 2e-3, *, dtype=jnp.float64,
                  vtol: float = 1e-10, ptol: float = 1e-9,
                  axis_name: str | None = None, host_direct: bool = False,
                  scheme: str = "pnpn") -> FlowSystem:
    mesh = box_mesh(n, nel, nel, 0.0, 1.0, 0.0, 1.0,
                    bc_fn=lambda x, y, nrm: "V")
    cfg = NSConfig(re=re, dt=dt, vtol=vtol, ptol=ptol)
    sys = FlowSystem(mesh, cfg, None, dtype=dtype, axis_name=axis_name,
                     host_direct=host_direct, scheme=scheme)
    ctx = sys.ctx

    def lid(x, y):
        on_lid = np.isclose(y, 1.0)
        return np.where(on_lid, 16.0 * x ** 2 * (1 - x) ** 2, 0.0), \
            np.zeros_like(x)

    u_bc = jnp.asarray(dirichlet_values(mesh, {"V": lid}), ctx.dtype)
    z2 = jnp.zeros_like(u_bc)
    sys.case = CaseFields(u_bc=u_bc, f=z2, sponge=jnp.zeros_like(ctx.bm),
                          sponge_ref=z2)
    return sys


def cavity_reference_system(re2_path: str, n: int = 6, re: float = 3600.0,
                            aspect: float = 1.5, dt: float = 2e-3, *,
                            dtype=jnp.float64, vtol: float = 1e-10,
                            ptol: float = 1e-9, dealias: bool | int = True,
                            host_direct: bool = False, scheme: str = "pnpn",
                            **cfg_kw) -> FlowSystem:
    """FlowSystem at the REFERENCE lid-driven-cavity configuration: ingest
    examples/lid_driven/cav.re2 (100 elements, 10x10, sharp unit lid on the
    'v' faces — cav.usr userbc ux=1), rescale y to [0, aspect] exactly as
    cav.usr usrdat2 (rescale_x(ym1, 0, uparam(10)), uparam10 = 1.5 in
    cav.par), Re = 3600 (cav.par viscosity = -3600)."""
    from ..io.re2 import mesh_from_re2

    mesh = mesh_from_re2(re2_path, n=n)
    # reference usrdat2: y -> [0, aspect]; x shift to [0,1] (dynamics
    # invariant; keeps the corner at the origin like the generated cavity)
    y0, y1 = mesh.y.min(), mesh.y.max()
    mesh.y = (mesh.y - y0) / (y1 - y0) * aspect
    mesh.x = mesh.x - mesh.x.min()
    cfg = NSConfig(re=re, dt=dt, vtol=vtol, ptol=ptol, **cfg_kw)
    sys = FlowSystem(mesh, cfg, None, dtype=dtype, dealias=dealias,
                     host_direct=host_direct, scheme=scheme)
    ctx = sys.ctx

    def lid(x, y):
        return np.ones_like(x), np.zeros_like(x)

    u_bc = jnp.asarray(dirichlet_values(mesh, {"V": lid}), ctx.dtype)
    z2 = jnp.zeros_like(u_bc)
    sys.case = CaseFields(u_bc=u_bc, f=z2, sponge=jnp.zeros_like(ctx.bm),
                          sponge_ref=z2)
    return sys
