"""Newton-Krylov for (unforced) periodic orbits: period-augmented system.

Reference: UPO modes uparam 2.1/2.2 — state extended with the period T
(krylov_vector%time, core/krylov_subspace.f:10-15), Newton on
F(u, T) = Phi_T(u) - u with the phase condition <du0/dt, du> = 0 closing the
bordered system (core/newton_krylov.f + newton_linearized_map,
core/matvec.f:381-475 — there the period column is finite-differenced via
compute_bvec; here the whole Jacobian action, period derivative included, is
one exact jax.jvp through the propagator with dt = T/nsteps traced).

Extended vectors are (u, T) pytrees; the inner GMRES runs on them through the
generic algorithm layer.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..config import NSConfig
from ..ops.gather_scatter import glsc3
from ..solver.stepper import initial_state, make_advance_dt
from .arnoldi import ArnoldiSpace
from .gmres import gmres


@dataclass
class UPOResult:
    u: jnp.ndarray
    period: float
    residuals: list = field(default_factory=list)
    converged: bool = False
    niter: int = 0
    orbit: jnp.ndarray | None = None   # (nsteps, 2, E, n, n) final orbit


def newton_upo(sys_, u0, T0: float, nsteps: int, *, tol: float = 1e-8,
               maxiter: int = 30, k_dim: int = 64, gmres_rtol: float = 1e-4,
               collect_orbit: bool = True,
               logger: Callable = print) -> UPOResult:
    """Solve Phi_T(u) - u = 0, <du/dt|_0, du> = 0 for (u, T).

    sys_ : FlowSystem; nsteps is fixed and dt = T/nsteps varies with T
    (the reference instead fixes dt and adjusts nsteps,
    core/matvec.f:26-43 — a traced dt is the jit-friendly equivalent).
    """
    ctx = sys_.ctx
    case = sys_.case
    adv = sys_._get(("upo_adv", nsteps), lambda: jax.jit(
        make_advance_dt(ctx, sys_.cfg, sys_.mesh.has_outflow, nsteps)))
    adv_collect = sys_._get(("upo_advc", nsteps), lambda: jax.jit(
        make_advance_dt(ctx, sys_.cfg, sys_.mesh.has_outflow, nsteps,
                        collect=True)))

    def phi(u, T):
        st, _ = adv(case, initial_state(ctx, u), T / nsteps)
        return st.u

    def residual_fn(u, T):
        return phi(u, T) - u

    resid_jit = sys_._get(("upo_res", nsteps), lambda: jax.jit(residual_fn))
    jvp_jit = sys_._get(("upo_jvp", nsteps), lambda: jax.jit(
        lambda u, T, v, s: jax.jvp(residual_fn, (u, T), (v, s))[1]))

    # phase-condition vector: du/dt at t=0 via one short step
    one_step = sys_._get(("upo_one", 1), lambda: jax.jit(
        make_advance_dt(ctx, sys_.cfg, sys_.mesh.has_outflow, 1)))

    def dudt(u, dt_small):
        st, _ = one_step(case, initial_state(ctx, u), dt_small)
        return (st.u - u) / dt_small

    u, T = u0, float(T0)
    hist = []
    orbit = None
    for it in range(1, maxiter + 1):
        f = resid_jit(u, T)
        rnorm = float(jnp.sqrt(glsc3(ctx, f, ctx.bm, f)))
        hist.append(rnorm)
        logger(f"[newton_upo] iter={it} |F|={rnorm:.6e} T={T:.8f}")
        if rnorm < tol:
            if collect_orbit:
                st, orbit = adv_collect(case, initial_state(ctx, u),
                                        T / nsteps)
            return UPOResult(u=u, period=T, residuals=hist, converged=True,
                             niter=it, orbit=orbit)
        c = dudt(u, T / nsteps)

        def matvec(vs):
            v, s = vs
            dF = jvp_jit(u, T, v, s)
            phase = glsc3(ctx, c, ctx.bm, v)
            return (dF, phase)

        def dot(a, b):
            return glsc3(ctx, a[0], ctx.bm, b[0]) + a[1] * b[1]

        space = ArnoldiSpace(matvec=matvec, dot=dot)
        rhs = (f, jnp.asarray(0.0, f.dtype))
        rtol_eff = min(0.1, max(gmres_rtol, 0.1 * rnorm))
        (du, dT), info = gmres(space, rhs, ksize=k_dim, rtol=rtol_eff,
                               logger=logger)
        u = u - du
        T = float(T - dT)
    return UPOResult(u=u, period=T, residuals=hist, converged=False,
                     niter=maxiter, orbit=orbit)
