"""PN/PN-2 stepper: velocity on GLL(n), pressure on Gauss(n-2), exact
discrete incompressibility via the consistent Poisson operator E = D W D^T.

This is the discretization family of the reference's benchmark cases
(lx2 = lx1 - 2, examples/cylinder/stability/direct/SIZE; Nek5000's
non-split path): the pressure is DISCONTINUOUS on interior Gauss points, so
there is no pressure boundary condition and no splitting boundary error —
the stepper's fixed point satisfies the coupled discrete steady equations
exactly (D u = 0 to solver precision), and the linearization's eigenvalues
converge to the PN/PN-2 spatial eigenvalues with only the O(dt^3) BDF3/EXT3
temporal bias. The companion PnPn/KIO91 splitting stepper
(solver/stepper.py) remains the TPU throughput path.

Scheme (BDF-k/EXT-k, incremental pressure with EXT extrapolation):
  1. uhat  = sum_j alpha_j u^{n-j} + dt sum_j beta_j N(u^{n-j})
  2. p_ext = sum_j beta_j p^{n-j}                   (same EXT row)
  3. H u*  = B uhat/dt - D^T p_ext  (+ Dirichlet lifting)
  4. E dp  = (g0/dt) D u*,   E = D (M/Bg) D^T       (SPD, no BC)
  5. u^{n+1} = u* - (dt/g0) scatter(M qsum(D^T dp)/Bg),  p^{n+1} = p_ext + dp

Everything flows through `solve_spd` / `solve_spd_direct`
(custom_linear_solve, symmetric=True), so jax.linear_transpose of the
linearized step remains the exact discrete adjoint.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..config import NSConfig
from ..ops.context import SemContext
from ..ops.gather_scatter import assemble, scatter
from ..ops.tensorprod import (PREC, deriv_r, deriv_r_t, deriv_s, deriv_s_t,
                              weak_laplacian)
from .stepper import CaseFields, _gdot, convect, solve_spd_local, \
    timestep_coeffs


class NSState2(NamedTuple):
    u: jnp.ndarray      # (2, E, n, n)
    p: jnp.ndarray      # (E, n-2, n-2) mesh-2 pressure
    ulag: jnp.ndarray   # (2, 2, E, n, n)
    nlag: jnp.ndarray   # (2, 2, E, n, n)
    plag: jnp.ndarray   # (2, E, n-2, n-2) previous pressures


def initial_state2(ctx: SemContext, u0: jnp.ndarray,
                   p0: jnp.ndarray | None = None) -> NSState2:
    n2 = ctx.n - 2
    shape2 = (ctx.bm.shape[0], n2, n2)
    p0 = jnp.zeros(shape2, u0.dtype) if p0 is None else p0
    z = jnp.zeros((2,) + u0.shape, u0.dtype)
    return NSState2(u=u0, p=p0, ulag=jnp.stack([u0, u0]), nlag=z,
                    plag=jnp.stack([p0, p0]))


# ---------------------------------------------------------------------------
# mesh-2 divergence / gradient-transpose operators
# ---------------------------------------------------------------------------

def _interp2(j2, u):
    # PREC: true f32 on TPU (bf16 lowering destabilizes the operator path,
    # ops/tensorprod.py); no-op at f64 on the host
    t = jnp.einsum("ai,...ij->...aj", j2, u, precision=PREC)
    return jnp.einsum("bj,...aj->...ab", j2, t, precision=PREC)


def _interp2_t(j2, w):
    t = jnp.einsum("ai,...aj->...ij", j2, w, precision=PREC)
    return jnp.einsum("bj,...ib->...ij", j2, t, precision=PREC)


def div2(ctx: SemContext, u: jnp.ndarray) -> jnp.ndarray:
    """(D u)[e, a, b]: weak divergence against the mesh-2 pressure basis."""
    j2, w2, met2, _ = ctx.p2
    ys, xs, yr, xr = met2[0], met2[1], met2[2], met2[3]
    ur = _interp2(j2, deriv_r(ctx.D, u[0]))
    us = _interp2(j2, deriv_s(ctx.D, u[0]))
    vr = _interp2(j2, deriv_r(ctx.D, u[1]))
    vs = _interp2(j2, deriv_s(ctx.D, u[1]))
    return w2 * (ur * ys - us * yr - vr * xs + vs * xr)


def div2_t(ctx: SemContext, p: jnp.ndarray) -> jnp.ndarray:
    """D^T p: velocity-space functional (2, E, n, n) — the exact transpose
    of div2 (the PN/PN-2 pressure-gradient term)."""
    j2, w2, met2, _ = ctx.p2
    ys, xs, yr, xr = met2[0], met2[1], met2[2], met2[3]
    t = w2 * p
    fu = (deriv_r_t(ctx.D, _interp2_t(j2, t * ys))
          - deriv_s_t(ctx.D, _interp2_t(j2, t * yr)))
    fv = (-deriv_r_t(ctx.D, _interp2_t(j2, t * xs))
          + deriv_s_t(ctx.D, _interp2_t(j2, t * xr)))
    return jnp.stack([fu, fv])


def _winv_apply(ctx: SemContext, f: jnp.ndarray) -> jnp.ndarray:
    """W f = scatter(maskg * qsum(f) / Bg): masked assembled inverse mass,
    the B^-1 inside E (continuous output)."""
    g = assemble(ctx, f)
    return scatter(ctx, ctx.maskg_vel[:2] * g / ctx.bmg)


def make_e_solver(ctx: SemContext, cfg: NSConfig, has_outflow: bool):
    """Solve E dp = rhs on the mesh-2 pressure space."""
    ediag = ctx.p2[3]

    def emat(p):
        return div2(ctx, _winv_apply(ctx, div2_t(ctx, p)))

    def precond(r):
        return r / ediag

    if has_outflow:
        project = None
    else:
        npd = ediag.size

        def project(p):
            return p - jnp.sum(p) / npd

    if ctx.hsolve is not None:
        from .cg import solve_spd_direct
        hs = ctx.hsolve

        def solve(rhs):
            return solve_spd_direct(emat, rhs, hs.solve_e, project=project)

        return solve

    def solve(rhs):
        return solve_spd_local(emat, rhs, _gdot, precond, cfg.ptol,
                               cfg.pmaxit, project)

    return solve


# ---------------------------------------------------------------------------
# nonlinear step
# ---------------------------------------------------------------------------

def _helm_solve(ctx, cfg, nu_c, rhs_loc, g0, dt):
    """Viscous Helmholtz solve on the assembled global dofs (shared by the
    nonlinear and linearized steps; mirrors stepper.py's fallback branch)."""
    nu_g = nu_c[:, :, 0, 0]

    def helm_local(w):
        return (g0 / dt) * ctx.bm * w + nu_c * weak_laplacian(ctx, w)

    def hmat(g):
        gl = scatter(ctx, ctx.maskg_vel * g)
        return ctx.maskg_vel * assemble(ctx, helm_local(gl))

    def hprecond(r):
        return ctx.maskg_vel * r / ((g0 / dt) * ctx.bmg + nu_g * ctx.diag_ag)

    def hproject(g):
        return ctx.maskg_vel * g

    rhs_v = ctx.maskg_vel * assemble(ctx, rhs_loc)
    if ctx.hsolve is not None:
        from .cg import solve_spd_direct
        hfn = ctx.hsolve.make_helm_fn(tuple(float(v) for v in np.ravel(nu_c)))
        ug = solve_spd_direct(hmat, rhs_v, hfn, extra=(g0 / dt,),
                              project=hproject)
    else:
        ug = solve_spd_local(hmat, rhs_v, _gdot, hprecond, cfg.vtol,
                             cfg.vmaxit, hproject)
    return scatter(ctx, ctx.maskg_vel * ug)


def make_step2(ctx: SemContext, cfg: NSConfig, has_outflow: bool):
    if cfg.boussinesq:
        raise NotImplementedError("pnpn2 + Boussinesq: use the pnpn scheme")
    nu = cfg.nu
    nu_c = jnp.asarray([nu, nu], ctx.dtype)[:, None, None, None]
    esolve = make_e_solver(ctx, cfg, has_outflow)

    def helm_local(w, g0, dt):
        return (g0 / dt) * ctx.bm * w + nu_c * weak_laplacian(ctx, w)

    def step(case: CaseFields, state: NSState2, ab, eb, fextra=None, dt=None,
             bcw=None):
        if dt is None:
            dt = cfg.dt
        u_bc = case.u_bc
        if case.u_bc_osc is not None and bcw is not None:
            u_bc = u_bc + bcw * case.u_bc_osc
        u = state.u
        ncur = (-convect(ctx, u, u) + case.f
                + case.sponge * (case.sponge_ref - u))
        if fextra is not None:
            ncur = ncur + fextra
        uhat = (ab[1] * u + ab[2] * state.ulag[0] + ab[3] * state.ulag[1]
                + dt * (eb[0] * ncur + eb[1] * state.nlag[0]
                        + eb[2] * state.nlag[1]))
        g0 = ab[0]
        # FIRST-order pressure extrapolation (standard incremental form,
        # Guermond & Shen 2006): the EXT3 row (3,-3,1) on the pressure is
        # unstable for this non-rotational splitting — measured: a
        # sign-alternating parasitic mode growing 57x per 0.5 TU at
        # dt=1e-2 and 381x at dt=5e-3 (worse as dt shrinks), which is
        # also what stalled the r4 time-stepper Newton-GMRES. p_ext = p^n
        # is stable; the temporal eigenvalue bias is quantified against
        # the assembled-matrix answer (tests/test_steady.py, RESULTS.md).
        p_ext = state.p

        u_b = (1.0 - ctx.mask_vel) * u_bc
        rhs_loc = (ctx.bm * uhat / dt - div2_t(ctx, p_ext)
                   - helm_local(u_b, g0, dt))
        ustar = _helm_solve(ctx, cfg, nu_c, rhs_loc, g0, dt) + u_b

        dp = esolve((g0 / dt) * div2(ctx, ustar))
        unew = ustar - (dt / g0) * _winv_apply(ctx, div2_t(ctx, dp))
        p = p_ext + dp

        return NSState2(u=unew, p=p,
                        ulag=jnp.stack([u, state.ulag[0]]),
                        nlag=jnp.stack([ncur, state.nlag[0]]),
                        plag=jnp.stack([state.p, state.plag[0]])), ncur

    return step


def make_advance2(ctx: SemContext, cfg: NSConfig, has_outflow: bool,
                  nsteps: int, collect: bool = False):
    from ..ops.gather_scatter import glsc3
    step = make_step2(ctx, cfg, has_outflow)
    ab_seq, eb_seq = timestep_coeffs(nsteps, cfg.torder, np.float64)
    ab_seq = jnp.asarray(ab_seq, ctx.dtype)
    eb_seq = jnp.asarray(eb_seq, ctx.dtype)

    def advance(case: CaseFields, state: NSState2, bcw_seq=None):
        def body(st, xs):
            ab, eb = xs[0], xs[1]
            bcw = xs[2] if len(xs) > 2 else None
            st2, _ = step(case, st, ab, eb, bcw=bcw)
            energy = 0.5 * glsc3(ctx, st2.u, ctx.bm, st2.u)
            out = (energy, st.u) if collect else energy  # PRE-step
            return st2, out

        xs = (ab_seq, eb_seq) if bcw_seq is None else (ab_seq, eb_seq, bcw_seq)
        return lax.scan(body, state, xs)

    return advance


# ---------------------------------------------------------------------------
# linearized / adjoint propagators
# ---------------------------------------------------------------------------

def make_linear_step2(ctx: SemContext, cfg: NSConfig, has_outflow: bool):
    nu = cfg.nu
    dt = cfg.dt
    nu_c = jnp.asarray([nu, nu], ctx.dtype)[:, None, None, None]
    esolve = make_e_solver(ctx, cfg, has_outflow)

    def lstep(base_u, sponge, state: NSState2, ab, eb, fextra=None):
        u = state.u
        ncur = (-convect(ctx, base_u, u) - convect(ctx, u, base_u)
                - sponge * u)
        if fextra is not None:
            ncur = ncur + fextra
        uhat = (ab[1] * u + ab[2] * state.ulag[0] + ab[3] * state.ulag[1]
                + dt * (eb[0] * ncur + eb[1] * state.nlag[0]
                        + eb[2] * state.nlag[1]))
        g0 = ab[0]
        p_ext = state.p          # first-order: see make_step2 note
        rhs_loc = ctx.bm * uhat / dt - div2_t(ctx, p_ext)
        ustar = _helm_solve(ctx, cfg, nu_c, rhs_loc, g0, dt)
        dp = esolve((g0 / dt) * div2(ctx, ustar))
        unew = ustar - (dt / g0) * _winv_apply(ctx, div2_t(ctx, dp))
        return NSState2(u=unew, p=p_ext + dp,
                        ulag=jnp.stack([u, state.ulag[0]]),
                        nlag=jnp.stack([ncur, state.nlag[0]]),
                        plag=jnp.stack([state.p, state.plag[0]]))

    return lstep


def make_linear_propagator2(ctx: SemContext, cfg: NSConfig, has_outflow: bool,
                            nsteps: int):
    from .orbit import FourierOrbit, orbit_at
    lstep = make_linear_step2(ctx, cfg, has_outflow)
    ab, eb = timestep_coeffs(nsteps, cfg.torder, np.float64)
    ab_seq = jnp.asarray(ab, ctx.dtype)
    eb_seq = jnp.asarray(eb, ctx.dtype)

    def prop(base_u, sponge, u0, p0=None):
        fourier = isinstance(base_u, FourierOrbit)
        floquet = (not fourier) and base_u.ndim == 5
        state = initial_state2(ctx, u0, p0)

        def body(st, xs):
            if floquet:
                abx, ebx, bu = xs
            elif fourier:
                abx, ebx, j = xs
                bu = orbit_at(base_u, j, nsteps)
            else:
                abx, ebx = xs
                bu = base_u
            return lstep(bu, sponge, st, abx, ebx), None

        if floquet:
            xs = (ab_seq, eb_seq, base_u)
        elif fourier:
            xs = (ab_seq, eb_seq, jnp.arange(nsteps))
        else:
            xs = (ab_seq, eb_seq)
        final, _ = lax.scan(body, state, xs)
        return final.u, final.p

    return prop


def make_adjoint_propagator2(ctx: SemContext, cfg: NSConfig,
                             has_outflow: bool, nsteps: int):
    from ..ops.gather_scatter import dssum
    prop = make_linear_propagator2(ctx, cfg, has_outflow, nsteps)

    def adj(base_u, sponge, v):
        def fwd_vel(u0):
            return prop(base_u, sponge, u0)[0]

        transpose = jax.linear_transpose(fwd_vel, jnp.zeros_like(v))
        (w,) = transpose(ctx.bm * v)
        u_adj = dssum(ctx, w) / dssum(ctx, ctx.bm)
        return u_adj, None

    return adj
