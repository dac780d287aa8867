"""3D semi-implicit incompressible Navier-Stokes stepper + linearized twin.

The same BDF-k/EXT-k KIO91 splitting as solver/stepper.py (see its module
docstring for the scheme and the reference mapping, core/matvec.f:222), on
3-component hex-element fields (ops/sem3d). The implicit solves run on
ASSEMBLED global dof vectors through the gather-only qsum/qcopy primitives
with Jacobi-preconditioned CG — the correctness-first 3D configuration
(docs/DESIGN_3D.md §3: the overlap-Schwarz/fast-diagonalization fine level
and the structured slice-exchange dssum are the planned 3D performance
work). Everything is expressed through linear ops + solve_spd, so
`jax.linear_transpose` of the linearized step gives the exact discrete
adjoint, as in 2D.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..config import NSConfig
from ..ops.sem3d import (SemContext3D, assemble3, convect3, curl3, grad3,
                         scatter3, weak_div3, weak_laplacian3)
from .stepper import timestep_coeffs
from .cg import solve_spd


@partial(jax.tree_util.register_dataclass,
         data_fields=["u_bc", "f", "sponge", "sponge_ref"], meta_fields=[])
@dataclasses.dataclass(frozen=True)
class CaseFields3:
    u_bc: jnp.ndarray        # (3, E, n, n, n) Dirichlet values
    f: jnp.ndarray           # (3, E, n, n, n) steady body force
    sponge: jnp.ndarray      # (E, n, n, n)
    sponge_ref: jnp.ndarray  # (3, E, n, n, n)


def zero_case_fields3(ctx: SemContext3D) -> CaseFields3:
    z = jnp.zeros(ctx.mask_vel.shape, ctx.dtype)
    return CaseFields3(u_bc=z, f=z, sponge=jnp.zeros_like(ctx.bm),
                       sponge_ref=z)


class NSState3(NamedTuple):
    u: jnp.ndarray      # (3, E, n, n, n)
    p: jnp.ndarray      # (E, n, n, n)
    ulag: jnp.ndarray   # (2, 3, E, n, n, n)
    nlag: jnp.ndarray
    cclag: jnp.ndarray  # (2, 3, E, n, n, n) curl-curl lags


def initial_state3(ctx: SemContext3D, u0: jnp.ndarray,
                   p0: jnp.ndarray | None = None) -> NSState3:
    p0 = jnp.zeros_like(ctx.bm) if p0 is None else p0
    z = jnp.zeros((2,) + u0.shape, u0.dtype)
    zcc = jnp.zeros((2, 3) + u0.shape[1:], u0.dtype)
    return NSState3(u=u0, p=p0, ulag=jnp.stack([u0, u0]), nlag=z, cclag=zcc)


def curl_curl3(ctx: SemContext3D, u: jnp.ndarray) -> jnp.ndarray:
    """curl(curl u) — only its Dirichlet-face trace enters (KIO91
    rotational pressure BC)."""
    return curl3(ctx, curl3(ctx, u[:3]))


def _gdot(a, b):
    return jnp.vdot(a, b)


def _pressure_solver3(ctx: SemContext3D, cfg: NSConfig, has_outflow: bool):
    def amat(g):
        gl = scatter3(ctx, ctx.maskg_p * g)
        return ctx.maskg_p * assemble3(ctx, weak_laplacian3(ctx, gl))

    def precond(r):
        return ctx.maskg_p * r / ctx.diag_ag

    if has_outflow:
        def project(g):
            return ctx.maskg_p * g
    else:
        def project(g):
            return g - jnp.sum(g) / ctx.nglobal

    def solve(rhs_local):
        rhs = project(assemble3(ctx, rhs_local))
        g = solve_spd(amat, rhs, dot=_gdot, precond=precond, rtol=cfg.ptol,
                      maxiter=cfg.pmaxit, project=project)
        return scatter3(ctx, ctx.maskg_p * g)

    return solve


def make_step3(ctx: SemContext3D, cfg: NSConfig, has_outflow: bool):
    """One nonlinear 3D NS time step (cf. stepper.make_step)."""
    nu = cfg.nu
    ncomp = 3 + (1 if cfg.boussinesq else 0)
    nu_c = jnp.asarray([nu] * 3 + [nu / cfg.pr] * (ncomp - 3),
                       ctx.dtype)[:, None, None, None, None]
    nu_g = nu_c[:, :, 0, 0, 0]
    psolve = _pressure_solver3(ctx, cfg, has_outflow)

    def helm_local(w, g0, dt):
        return (g0 / dt) * ctx.bm * w + nu_c * weak_laplacian3(ctx, w)

    def step(case: CaseFields3, state: NSState3, ab, eb, fextra=None,
             dt=None):
        if dt is None:
            dt = cfg.dt
        u = state.u
        ncur = (-convect3(ctx, u, u) + case.f
                + case.sponge * (case.sponge_ref - u))
        if cfg.boussinesq:
            gv = jnp.asarray((list(cfg.gvec) + [0.0])[:3],
                             u.dtype)[:, None, None, None, None]
            ncur = ncur.at[:3].add(gv * u[3])
        if fextra is not None:
            ncur = ncur + fextra
        uhat = (ab[1] * u + ab[2] * state.ulag[0] + ab[3] * state.ulag[1]
                + dt * (eb[0] * ncur + eb[1] * state.nlag[0]
                        + eb[2] * state.nlag[1]))
        g0 = ab[0]

        cc = curl_curl3(ctx, u)
        cc_ext = (eb[0] * cc + eb[1] * state.cclag[0]
                  + eb[2] * state.cclag[1])
        bflux = sum(ctx.bwn[c] * case.u_bc[c] for c in range(3))
        brot = nu * sum(ctx.bwn[c] * cc_ext[c] for c in range(3))
        dp = psolve((weak_div3(ctx, uhat[0], uhat[1], uhat[2])
                     - g0 * bflux) / dt
                    - brot - weak_laplacian3(ctx, state.p))
        p = state.p + dp
        gradp = jnp.stack(grad3(ctx, p))
        if ncomp > 3:
            gradp = jnp.concatenate(
                [gradp, jnp.zeros((ncomp - 3,) + p.shape, p.dtype)])

        u_b = (1.0 - ctx.mask_vel) * case.u_bc if case.u_bc.shape[0] == ncomp \
            else (1.0 - ctx.mask_vel) * jnp.concatenate(
                [case.u_bc, jnp.zeros((ncomp - 3,) + p.shape, p.dtype)])
        rhs_loc = ctx.bm * (uhat / dt - gradp) - helm_local(u_b, g0, dt)

        def hmat(g):
            gl = scatter3(ctx, ctx.maskg_vel * g)
            return ctx.maskg_vel * assemble3(ctx, helm_local(gl, g0, dt))

        def hprecond(r):
            return ctx.maskg_vel * r / ((g0 / dt) * ctx.bmg
                                        + nu_g * ctx.diag_ag)

        def hproject(g):
            return ctx.maskg_vel * g

        rhs_v = ctx.maskg_vel * assemble3(ctx, rhs_loc)
        ug = solve_spd(hmat, rhs_v, dot=_gdot, precond=hprecond,
                       rtol=cfg.vtol, maxiter=cfg.vmaxit, project=hproject)
        unew = scatter3(ctx, ctx.maskg_vel * ug) + u_b

        return NSState3(u=unew, p=p,
                        ulag=jnp.stack([u, state.ulag[0]]),
                        nlag=jnp.stack([ncur, state.nlag[0]]),
                        cclag=jnp.stack([cc, state.cclag[0]])), ncur

    return step


def make_advance3(ctx: SemContext3D, cfg: NSConfig, has_outflow: bool,
                  nsteps: int, collect: bool = False):
    step = make_step3(ctx, cfg, has_outflow)
    ab_seq, eb_seq = timestep_coeffs(nsteps, cfg.torder, np.float64)
    ab_seq = jnp.asarray(ab_seq, ctx.dtype)
    eb_seq = jnp.asarray(eb_seq, ctx.dtype)

    def advance(case: CaseFields3, state: NSState3):
        def body(st, xs):
            ab, eb = xs
            new_state, _ = step(case, st, ab, eb)
            energy = 0.5 * jnp.sum(new_state.u[:3] ** 2 * ctx.bm)
            out = (energy, st.u) if collect else energy  # PRE-step
            return new_state, out

        return lax.scan(body, state, (ab_seq, eb_seq))

    return advance


# ---------------------------------------------------------------------------
# linearized + adjoint propagators
# ---------------------------------------------------------------------------

def make_linear_step3(ctx: SemContext3D, cfg: NSConfig, has_outflow: bool):
    nu = cfg.nu
    dt = cfg.dt
    ncomp = 3 + (1 if cfg.boussinesq else 0)
    nu_c = jnp.asarray([nu] * 3 + [nu / cfg.pr] * (ncomp - 3),
                       ctx.dtype)[:, None, None, None, None]
    nu_g = nu_c[:, :, 0, 0, 0]
    psolve = _pressure_solver3(ctx, cfg, has_outflow)

    def helm_local(w, g0):
        return (g0 / dt) * ctx.bm * w + nu_c * weak_laplacian3(ctx, w)

    def lstep(base_u, sponge, state: NSState3, ab, eb):
        u = state.u
        ncur = (-convect3(ctx, base_u, u) - convect3(ctx, u, base_u)
                - sponge * u)
        uhat = (ab[1] * u + ab[2] * state.ulag[0] + ab[3] * state.ulag[1]
                + dt * (eb[0] * ncur + eb[1] * state.nlag[0]
                        + eb[2] * state.nlag[1]))
        g0 = ab[0]
        cc = curl_curl3(ctx, u)
        cc_ext = (eb[0] * cc + eb[1] * state.cclag[0]
                  + eb[2] * state.cclag[1])
        brot = nu * sum(ctx.bwn[c] * cc_ext[c] for c in range(3))
        dp = psolve(weak_div3(ctx, uhat[0], uhat[1], uhat[2]) / dt - brot
                    - weak_laplacian3(ctx, state.p))
        p = state.p + dp
        gradp = jnp.stack(grad3(ctx, p))
        if ncomp > 3:
            gradp = jnp.concatenate(
                [gradp, jnp.zeros((ncomp - 3,) + p.shape, p.dtype)])
        rhs_loc = ctx.bm * (uhat / dt - gradp)

        def hmat(g):
            gl = scatter3(ctx, ctx.maskg_vel * g)
            return ctx.maskg_vel * assemble3(ctx, helm_local(gl, g0))

        def hprecond(r):
            return ctx.maskg_vel * r / ((g0 / dt) * ctx.bmg
                                        + nu_g * ctx.diag_ag)

        def hproject(g):
            return ctx.maskg_vel * g

        rhs_v = ctx.maskg_vel * assemble3(ctx, rhs_loc)
        ug = solve_spd(hmat, rhs_v, dot=_gdot, precond=hprecond,
                       rtol=cfg.vtol, maxiter=cfg.vmaxit, project=hproject)
        unew = scatter3(ctx, ctx.maskg_vel * ug)

        return NSState3(u=unew, p=p,
                        ulag=jnp.stack([u, state.ulag[0]]),
                        nlag=jnp.stack([ncur, state.nlag[0]]),
                        cclag=jnp.stack([cc, state.cclag[0]]))

    return lstep


def make_linear_propagator3(ctx: SemContext3D, cfg: NSConfig,
                            has_outflow: bool, nsteps: int):
    """prop(base_u, sponge, u0) -> (u_tau, p_tau); base_u steady
    (3, E, n, n, n) or a Floquet orbit (nsteps, 3, E, n, n, n)."""
    lstep = make_linear_step3(ctx, cfg, has_outflow)
    ab, eb = timestep_coeffs(nsteps, cfg.torder, np.float64)
    ab_seq = jnp.asarray(ab, ctx.dtype)
    eb_seq = jnp.asarray(eb, ctx.dtype)

    def prop(base_u, sponge, u0, p0=None):
        floquet = base_u.ndim == 6
        if p0 is None:
            p0 = jnp.zeros_like(ctx.bm)
        z = jnp.zeros((2,) + u0.shape, u0.dtype)
        zcc = jnp.zeros((2, 3) + u0.shape[1:], u0.dtype)
        state = NSState3(u=u0, p=p0, ulag=jnp.stack([u0, u0]),
                         nlag=z, cclag=zcc)

        def body(st, xs):
            if floquet:
                a, e, bu = xs
            else:
                a, e = xs
                bu = base_u
            return lstep(bu, sponge, st, a, e), None

        xs = (ab_seq, eb_seq, base_u) if floquet else (ab_seq, eb_seq)
        final, _ = lax.scan(body, state, xs)
        return final.u, final.p

    return prop


def make_adjoint_propagator3(ctx: SemContext3D, cfg: NSConfig,
                             has_outflow: bool, nsteps: int):
    """B-weighted exact discrete adjoint via jax.linear_transpose
    (cf. solver/linearized.make_adjoint_propagator)."""
    prop = make_linear_propagator3(ctx, cfg, has_outflow, nsteps)

    def adj(base_u, sponge, v):
        def fwd_vel(u0):
            return prop(base_u, sponge, u0)[0]

        transpose = jax.linear_transpose(fwd_vel, jnp.zeros_like(v))
        (w,) = transpose(ctx.bm * v)
        from ..ops.sem3d import dssum3
        u_adj = dssum3(ctx, w) / dssum3(ctx, jnp.broadcast_to(
            ctx.bm, w.shape))
        return u_adj, jnp.zeros_like(ctx.bm)

    return adj
