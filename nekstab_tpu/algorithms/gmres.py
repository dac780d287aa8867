"""Restarted GMRES over an abstract operator (time-stepper GMRES).

Reference: `ts_gmres`, core/newton_krylov.f:175-296 (Saad, Iterative Methods,
alg. 6.9). Builds the Arnoldi basis one column at a time through the same
CGS2 factorization as the eigensolver and solves the small least-squares
problem host-side each step (reference `lstsq` via vendored DGELS,
core/lapack_wrapper.f:287).
"""

from __future__ import annotations

from typing import Callable

import numpy as np

from .arnoldi import (ArnoldiSpace, arnoldi_factorization, tree_alloc,
                      tree_axpy, tree_combine, tree_scale, tree_set,
                      tree_zeros_like, _basis_prefix)


def gmres(space: ArnoldiSpace, rhs, ksize: int, x0=None, rtol: float = 1e-8,
          max_outer: int = 10, logger: Callable = print):
    """Solve A x = rhs with restarted GMRES(ksize). Returns (x, info dict).

    The residual tracked host-side is the least-squares residual
    ||beta e1 - Hbar y||, identical to the true residual in exact arithmetic
    (reference logs it to residu_gmres.dat, core/newton_krylov.f:263-267).
    """
    import jax

    bnorm = float(space.norm(rhs))
    if bnorm == 0.0:
        return rhs, dict(converged=True, niter=0, residual=0.0)
    tol_abs = rtol * bnorm

    x = tree_zeros_like(rhs) if x0 is None else x0
    total_mv = 0
    hist = []
    for outer in range(max_outer):
        if x0 is None and outer == 0:
            r = rhs
        else:
            ax = space.matvec(x)
            r = jax.tree.map(lambda b, a: b - a, rhs, ax)
            total_mv += 1
        beta = float(space.norm(r))
        if beta <= tol_abs:
            return x, dict(converged=True, niter=total_mv, residual=beta,
                           history=hist)
        Q = tree_alloc(r, ksize + 1)
        Q = tree_set(Q, 0, tree_scale(1.0 / beta, r))
        H = np.zeros((ksize + 1, ksize))
        y = None
        res = beta
        j = 0
        for j in range(1, ksize + 1):
            Q, _ = arnoldi_factorization(space, Q, H, j, j)
            total_mv += 1
            e1 = np.zeros(j + 1)
            e1[0] = beta
            y, *_ = np.linalg.lstsq(H[: j + 1, :j], e1, rcond=None)
            res = float(np.linalg.norm(e1 - H[: j + 1, :j] @ y))
            hist.append(res)
            if j % 25 == 0:
                logger(f"[gmres]   k={j} residual={res:.3e}")
            if res <= tol_abs:
                break
        dx = tree_combine(_basis_prefix(Q, j), np.ascontiguousarray(y))
        x = tree_axpy(1.0, dx, x)
        logger(f"[gmres] outer={outer} k={j} residual={res:.3e} "
               f"(target {tol_abs:.3e})")
        if res <= tol_abs:
            return x, dict(converged=True, niter=total_mv, residual=res,
                           history=hist)
        # stagnation guard: when a full restart cycle improves the residual
        # by less than 2x, the solve has hit its floor (matvec/orthogonalization
        # roundoff) and further restarts are pure waste — observed: a Newton
        # dyntol target of 1e-6 x |F| at |F| ~ 1e-9 sits below the f64 floor
        # and blind restarting (as the reference's ts_gmres does,
        # core/newton_krylov.f:305-328) would burn max_outer full cycles
        if res > 0.5 * beta:
            logger(f"[gmres] stagnated at {res:.3e} "
                   f"(outer improvement {beta / max(res, 1e-300):.2f}x) "
                   "- stopping restarts")
            return x, dict(converged=False, niter=total_mv, residual=res,
                           history=hist)
    return x, dict(converged=False, niter=total_mv, residual=res, history=hist)
