"""Newton-Krylov solver for fixed points (and periodic orbits) of the flow map.

Reference: core/newton_krylov.f:5-167. The outer Newton loop runs host-side;
each iteration evaluates the nonlinear residual F(q) = Phi_tau(q) - q with one
jitted nonlinear propagation and solves J dq = F(q) by time-stepper GMRES with
the linearized propagator about the current iterate; then q <- q - dq.

Dynamic-tolerance tightening (`ifdyntol`, core/newton_krylov.f:412-447) is
reproduced: the inner solves' tolerance tracks a decade below the current
Newton residual until the user tolerance is reached.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import numpy as np

from .arnoldi import ArnoldiSpace
from .gmres import gmres


@dataclass
class NewtonResult:
    q: object
    residuals: list = field(default_factory=list)
    converged: bool = False
    niter: int = 0


def newton_krylov(residual_fn: Callable, jacobian_matvec: Callable,
                  dot: Callable, q0, tol: float = 1e-9, maxiter: int = 30,
                  k_dim: int = 64, gmres_rtol: float = 1e-6,
                  gmres_max_outer: int = 5, dyntol: bool = True,
                  callback: Callable | None = None,
                  logger: Callable = print) -> NewtonResult:
    """Solve F(q) = Phi(q) - q = 0.

    residual_fn(q) -> F(q) (pytree like q)
    jacobian_matvec(q) -> callable v -> (dPhi/dq - I) v at the iterate q
    dot -> global (mass-weighted) inner product
    """
    import jax

    q = q0
    res_hist = []
    for it in range(1, maxiter + 1):
        f = residual_fn(q)
        rnorm = float(np.sqrt(dot(f, f)))
        res_hist.append(rnorm)
        logger(f"[newton] iter={it} |F|={rnorm:.6e} (tol {tol:.1e})")
        if callback is not None:
            callback(it, q, rnorm)
        if rnorm < tol:
            return NewtonResult(q=q, residuals=res_hist, converged=True,
                                niter=it)
        # dynamic inner tolerance: a decade below the current residual,
        # floored at the target (cf. spec_tole, core/newton_krylov.f:412-447)
        rtol_eff = gmres_rtol
        if dyntol:
            # inexact-Newton forcing: a decade below the current residual,
            # clamped to [gmres_rtol, 0.1]
            rtol_eff = min(0.1, max(gmres_rtol, 0.1 * rnorm))
        space = ArnoldiSpace(matvec=jacobian_matvec(q), dot=dot)
        dq, info = gmres(space, f, ksize=k_dim, rtol=rtol_eff,
                         max_outer=gmres_max_outer, logger=logger)
        # backtracking line search (globalization the reference lacks —
        # its Newton assumes a good startFrom file): halve the step until
        # sufficient decrease, keep the best trial if none qualifies
        s_step, best = 1.0, None
        for _ in range(6):
            q_try = jax.tree.map(lambda a, b, s=s_step: a - s * b, q, dq)
            f_try = residual_fn(q_try)
            r_try = float(np.sqrt(dot(f_try, f_try)))
            if best is None or (np.isfinite(r_try) and r_try < best[1]):
                best = (q_try, r_try)
            if np.isfinite(r_try) and r_try < (1.0 - 1e-4 * s_step) * rnorm:
                break
            s_step *= 0.5
            logger(f"[newton]   backtrack: |F(q - {2 * s_step:g} dq)| = "
                   f"{r_try:.3e} >= {rnorm:.3e}")
        q = best[0]
    f = residual_fn(q)
    rnorm = float(np.sqrt(dot(f, f)))
    res_hist.append(rnorm)
    return NewtonResult(q=q, residuals=res_hist, converged=rnorm < tol,
                        niter=maxiter)
