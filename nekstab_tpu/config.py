"""Typed runtime configuration.

Replaces the reference's three-tier config (compile-time SIZE constants,
`.par` INI userParams, and `nekStab_usrchk` overrides + bcast ceremony —
SURVEY.md §5 "Config / flag system") with frozen dataclasses that are hashable
and passed to `jax.jit` as static arguments.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class NSConfig:
    """Incompressible Navier-Stokes stepper configuration.

    The sampling period of the exponential propagator is tau = dt * nsteps
    (the reference recomputes dt from endTime/targetCFL in
    prepare_linearized_solver, core/matvec.f:1-52; here dt is explicit).
    """

    re: float                 # Reynolds number (nu = 1/re)
    dt: float                 # time step (constant)
    torder: int = 3           # BDF/EXT order (ramps up over the first steps)
    vtol: float = 1e-10       # velocity Helmholtz CG relative tolerance
    vmaxit: int = 200
    ptol: float = 1e-8        # pressure Poisson CG relative tolerance
    pmaxit: int = 800
    boussinesq: bool = False  # temperature coupling (thermal cases)
    pr: float = 1.0           # Prandtl number (Boussinesq)
    gvec: tuple[float, float] = (0.0, 1.0)  # buoyancy direction * strength

    @property
    def nu(self) -> float:
        return 1.0 / self.re


@dataclasses.dataclass(frozen=True)
class ArnoldiConfig:
    """Krylov / eigensolver configuration (reference: NEKSTAB common block
    k_dim/eigen_tol/schur_tgt/schur_del, core/NEKSTAB:9-55)."""

    k_dim: int = 100
    eigen_tol: float = 1e-6
    schur_tgt: int = 2        # <=0: one-shot Arnoldi, >0: Krylov-Schur restart
    schur_del: float = 0.1
    maxmodes: int = 20
    max_restarts: int = 50


DTYPES = {"float32": jnp.float32, "float64": jnp.float64}
