"""Run monitors: CFL, watchdog, per-chunk timing/ETA logging.

TPU-native replacement for the reference's `nekStab_comment` (per-step
timing, ETA, CFL>10 kill switch, core/usr_extra.f:292-354) and the NaN check
in the inner product (core/krylov_subspace.f:53). The design is chunked: the
device computes cheap in-graph diagnostics (CFL, energy) alongside each
jitted advance chunk; the host inspects them between chunks — no per-step
host sync, so the hot loop stays on-device.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from ..ops.context import SemContext
from ..ops.gather_scatter import glmax


class WatchdogError(RuntimeError):
    """Raised when the run diverges (CFL blow-up or NaN energy)."""


def cfl(ctx: SemContext, u: jnp.ndarray, dt: float) -> jnp.ndarray:
    """Convective CFL number max |u . grad_xi| dt / dxi_min over the mesh:
    velocity is mapped to reference coordinates through the metric so the
    estimate accounts for element size, stretching and curvature; dxi_min is
    the smallest GLL spacing on [-1,1] (the reference uses Nek5000's
    `compute_cfl`, consumed by core/usr_extra.f:306-313)."""
    n = ctx.n
    from ..quadrature import make_basis
    dxi = float(np.min(np.diff(make_basis(n).x)))
    ur = jnp.abs(u[0] * ctx.rx + u[1] * ctx.ry)
    us = jnp.abs(u[0] * ctx.sx + u[1] * ctx.sy)
    return glmax(ctx, jnp.maximum(ur, us)) * dt / dxi


@dataclass
class RunMonitor:
    """Chunked run logger + divergence watchdog.

    Usage:
        mon = RunMonitor(ctx, dt=cfg.dt, total_steps=nsteps, tag="DNS")
        for chunk in ...:
            state, energy = adv(case, state)
            mon.check(state.u, energy)   # raises WatchdogError on blow-up
    """

    ctx: SemContext
    dt: float
    total_steps: int
    tag: str = "DNS"
    cfl_limit: float = 10.0          # reference kill switch threshold
    logger: object = print
    log_every: int = 1               # log every k-th chunk
    t0: float = field(default_factory=time.time)
    steps_done: int = 0
    _chunks: int = 0

    def check(self, u, energy=None, nsteps_chunk: int | None = None):
        """Inspect one finished chunk; returns the CFL. Raises WatchdogError
        on NaN energy or CFL above cfl_limit (reference core/usr_extra.f:306:
        'cfl > 10., STOPPING')."""
        c = float(cfl(self.ctx, u, self.dt))
        e = None if energy is None else float(np.asarray(energy).reshape(-1)[-1])
        if e is not None and not np.isfinite(e):
            raise WatchdogError(f"[{self.tag}] energy is not finite: {e}")
        if not np.isfinite(c) or c > self.cfl_limit:
            raise WatchdogError(
                f"[{self.tag}] CFL {c:.3f} exceeds {self.cfl_limit} - "
                f"diverging run stopped (step {self.steps_done})")
        if nsteps_chunk is not None:
            self.steps_done += nsteps_chunk
        self._chunks += 1
        if self.logger is not None and self._chunks % self.log_every == 0:
            wall = time.time() - self.t0
            rate = self.steps_done / wall if wall > 0 and self.steps_done else 0
            eta = ((self.total_steps - self.steps_done) / rate
                   if rate > 0 else float("nan"))
            msg = (f"[{self.tag}] step {self.steps_done}/{self.total_steps} "
                   f"t={self.steps_done * self.dt:.3f} CFL={c:.3f}")
            if e is not None:
                msg += f" E={e:.6e}"
            if rate > 0:
                msg += f" {rate:.1f} steps/s ETA {eta:.0f}s"
            self.logger(msg)
        return c
