"""Preconditioned conjugate gradients wrapped in `lax.custom_linear_solve`.

The implicit Helmholtz and pressure-Poisson solves of the stepper go through
this wrapper so that the *entire* linearized time step is transposable by
`jax.linear_transpose`: the transpose of a symmetric solve is the same solve
(the TPU-native route to the reference's hand-written adjoint solver,
core/matvec.f:249-326 — here the discrete adjoint is exact by construction).

The reference's equivalents are Nek5000's hmholtz/CG with diagonal or XXT
preconditioning (SURVEY.md L1, §7 "hard parts #1").
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
from jax import lax


def pcg(matvec: Callable, b, *, dot: Callable, precond: Callable | None = None,
        rtol: float = 1e-10, atol: float = 0.0, maxiter: int = 200,
        project: Callable | None = None):
    """Jacobi/whatever-preconditioned CG, x0 = 0, fixed-shape while_loop.

    `dot` must implement the global inner product (psum across shards and
    1/multiplicity weighting for redundantly-stored SEM dofs so the operator
    is self-adjoint in it). `project` removes a known nullspace (constant
    pressure mode) from b and from the running residual.
    """
    if precond is None:
        precond = lambda r: r
    if project is None:
        project = lambda x: x

    b = project(b)
    bnorm2 = dot(b, b)
    tol2 = jnp.maximum(rtol * rtol * bnorm2, jnp.asarray(atol * atol, bnorm2.dtype))

    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = precond(r0)
    rz0 = dot(r0, z0)

    def cond(carry):
        _, r, _, _, k = carry
        return jnp.logical_and(k < maxiter, dot(r, r) > tol2)

    def body(carry):
        x, r, p, rz, k = carry
        ap = matvec(p)
        pap = dot(p, ap)
        alpha = rz / jnp.where(pap == 0, 1.0, pap)
        x = x + alpha * p
        r = project(r - alpha * ap)
        z = precond(r)
        rz_new = dot(r, z)
        beta = rz_new / jnp.where(rz == 0, 1.0, rz)
        p = z + beta * p
        return (x, r, p, rz_new, k + 1)

    x, *_ = lax.while_loop(cond, body, (x0, r0, z0, rz0, jnp.int32(0)))
    return x


def solve_spd(matvec: Callable, b, *, dot: Callable,
              precond: Callable | None = None, rtol: float = 1e-10,
              atol: float = 0.0, maxiter: int = 200,
              project: Callable | None = None):
    """Solve the SPD system matvec(x) = b; transposable (symmetric=True)."""

    def solve_fn(mv, rhs):
        return pcg(mv, rhs, dot=dot, precond=precond, rtol=rtol, atol=atol,
                   maxiter=maxiter, project=project)

    return lax.custom_linear_solve(matvec, b, solve_fn, symmetric=True)


def solve_spd_direct(matvec: Callable, b, host_fn: Callable, extra=(),
                     project: Callable | None = None):
    """Solve the SPD system with a host-side direct factorization
    (hostsolve/direct.py) through `jax.pure_callback`, wrapped in
    `custom_linear_solve(symmetric=True)` so transposes and jvps reuse the
    same factorized solve — the f64 accuracy path on hosts without fast f64
    matmul. `extra` are additional traced scalars forwarded to the callback
    (e.g. g0/dt selecting the Helmholtz factorization)."""
    import jax

    if project is None:
        project = lambda x: x
    extra = tuple(lax.stop_gradient(e) for e in extra)

    def solve_fn(mv, rhs):
        sol = jax.pure_callback(
            host_fn, jax.ShapeDtypeStruct(rhs.shape, rhs.dtype), rhs, *extra)
        return project(sol)

    return lax.custom_linear_solve(matvec, project(b), solve_fn,
                                   symmetric=True)
