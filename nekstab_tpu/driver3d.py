"""3D driver: wires Mesh3D + config + case into stability operators.

The 3D counterpart of driver.FlowSystem — same inverted architecture (the
framework owns the time loop, the case is data; SURVEY.md §1) and the same
operator-space surface, so every L4 algorithm (Arnoldi, Krylov-Schur,
Newton-Krylov, SFD/BoostConv/TDF — all operator-agnostic pytree code)
applies to 3D problems unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .config import NSConfig
from .mesh3d import Mesh3D
from .ops.sem3d import SemContext3D, make_context3d
from .algorithms.arnoldi import ArnoldiSpace
from .solver.stepper3d import (CaseFields3, initial_state3, make_advance3,
                               make_adjoint_propagator3,
                               make_linear_propagator3, zero_case_fields3)


class FlowSystem3:
    """A discretized 3D flow problem plus cached jitted propagators."""

    def __init__(self, mesh: Mesh3D, cfg: NSConfig,
                 case: CaseFields3 | None, *, dtype=jnp.float64,
                 sponge_fun: np.ndarray | None = None,
                 sponge_strength: float = 0.0):
        self.mesh = mesh
        self.cfg = cfg
        self.ctx: SemContext3D = make_context3d(
            mesh, dtype=dtype, sponge_ramp=sponge_fun,
            nscalars=1 if cfg.boussinesq else 0)
        if sponge_fun is None:
            self.sponge_fun = jnp.zeros_like(self.ctx.bm)
        else:
            self.sponge_fun = jnp.asarray(sponge_fun, self.ctx.dtype)
        self.case = case if case is not None else zero_case_fields3(self.ctx)
        if sponge_strength != 0.0 and case is not None:
            import dataclasses
            self.case = dataclasses.replace(
                case, sponge=sponge_strength * self.sponge_fun)
        self._cache = {}

    @property
    def dot(self):
        ctx = self.ctx
        return lambda a, b: jnp.sum(a * ctx.bm_eig * b)

    @property
    def dot_full(self):
        ctx = self.ctx
        return lambda a, b: jnp.sum(a * ctx.bm * b)

    def _get(self, key, builder):
        if key not in self._cache:
            self._cache[key] = builder()
        return self._cache[key]

    def initial_state(self, u0, p0=None):
        return initial_state3(self.ctx, u0, p0)

    def nonlinear_advance(self, nsteps: int, collect: bool = False):
        return self._get(("adv", nsteps, collect), lambda: jax.jit(
            make_advance3(self.ctx, self.cfg, self.mesh.has_outflow, nsteps,
                          collect=collect)))

    def linear_propagator(self, nsteps: int):
        return self._get(("lin", nsteps), lambda: jax.jit(
            make_linear_propagator3(self.ctx, self.cfg,
                                    self.mesh.has_outflow, nsteps)))

    def adjoint_propagator(self, nsteps: int):
        return self._get(("adj", nsteps), lambda: jax.jit(
            make_adjoint_propagator3(self.ctx, self.cfg,
                                     self.mesh.has_outflow, nsteps)))

    def direct_space(self, base_u, nsteps: int) -> ArnoldiSpace:
        prop = self.linear_propagator(nsteps)
        sp = self.sponge_fun
        return ArnoldiSpace(matvec=lambda v: prop(base_u, sp, v)[0],
                            dot=self.dot)

    def adjoint_space(self, base_u, nsteps: int) -> ArnoldiSpace:
        adj = self.adjoint_propagator(nsteps)
        sp = self.sponge_fun
        return ArnoldiSpace(matvec=lambda v: adj(base_u, sp, v)[0],
                            dot=self.dot)

    def transient_growth_space(self, base_u, nsteps: int) -> ArnoldiSpace:
        prop = self.linear_propagator(nsteps)
        adj = self.adjoint_propagator(nsteps)
        sp = self.sponge_fun

        def matvec(v):
            w, _ = prop(base_u, sp, v)
            return adj(base_u, sp, w)[0]

        return ArnoldiSpace(matvec=matvec, dot=self.dot_full)
