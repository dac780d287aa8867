"""Linearized and adjoint Navier-Stokes propagators.

Replaces the reference's `forward_linearized_map` / `adjoint_linearized_map`
(core/matvec.f:163-326). The TPU-first difference: the adjoint is NOT a
hand-discretized adjoint PDE solver — it is the exact transpose of the jitted
linearized propagator via `jax.linear_transpose`, conjugated by the mass
matrix, so <L u, v>_B = <u, L* v>_B holds to machine precision (the reference
achieves ~2e-5 direct/adjoint eigenvalue agreement, BASELINE.md; here it is
exact by construction).

The linearized step shares the splitting structure of solver/stepper.py with
advection linearized about a frozen (or time-varying/Floquet) base flow:
    N'(u') = -(U.grad)u' - (u'.grad)U - sponge*u'
and homogeneous Dirichlet BCs. The step is linear in the perturbation state,
and the whole nsteps-propagation is a linear lax.scan, which JAX transposes
into the reversed adjoint scan automatically.

Perturbation pressure is carried inside the propagation but the Krylov
operator maps velocity -> velocity (final pressure returned as a passive
payload; the reference stores pr in its krylov_vector but gives it zero
weight in all inner products, core/krylov_subspace.f:24-56).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..config import NSConfig
from ..ops.context import SemContext
from ..ops.gather_scatter import assemble, dssum, scatter
from ..ops.tensorprod import grad, weak_div, weak_laplacian
from .stepper import (NSState, _gdot, _pressure_solver, _pvary_globals,
                      convect, curl_curl, solve_spd_local, timestep_coeffs)


def make_linear_step(ctx: SemContext, cfg: NSConfig, has_outflow: bool):
    """Returns lstep(base_u, sponge, pstate, ab, eb) -> pstate', linear in
    pstate (an NSState of the perturbation)."""
    nu = cfg.nu
    dt = cfg.dt
    ncomp = 2 + (1 if cfg.boussinesq else 0)
    nu_c = jnp.asarray([nu, nu] + [nu / cfg.pr] * (ncomp - 2),
                       ctx.dtype)[:, None, None, None]
    nu_g = nu_c[:, :, 0, 0]
    ctx = _pvary_globals(ctx)
    psolve = _pressure_solver(ctx, cfg, has_outflow)

    def helm_local(w, g0):
        out = (g0 / dt) * ctx.bm * w + nu_c * weak_laplacian(ctx, w)
        if ctx.axdiag is not None:
            out = out.at[1].add(nu * ctx.axdiag * w[1])
        return out

    def lstep(base_u, sponge, state: NSState, ab, eb, fextra=None):
        u = state.u
        # linearized advection + sponge damping (forcing hook analog of
        # nekStab_forcing's perturbation branch, core/utils.f:149-180)
        ncur = (-convect(ctx, base_u, u) - convect(ctx, u, base_u)
                - sponge * u)
        if cfg.boussinesq:
            gv = jnp.asarray(cfg.gvec, u.dtype)[:, None, None, None]
            ncur = ncur.at[:2].add(gv * u[2])
        if fextra is not None:
            ncur = ncur + fextra
        uhat = (ab[1] * u + ab[2] * state.ulag[0] + ab[3] * state.ulag[1]
                + dt * (eb[0] * ncur + eb[1] * state.nlag[0]
                        + eb[2] * state.nlag[1]))
        g0 = ab[0]

        # rotational pressure-BC term, linearized (u_bc' = 0 so no g_n flux)
        cc = curl_curl(ctx, u)
        cc_ext = (eb[0] * cc + eb[1] * state.cclag[0]
                  + eb[2] * state.cclag[1])
        brot = nu * (ctx.bwn[0] * cc_ext[0] + ctx.bwn[1] * cc_ext[1])
        dp = psolve(weak_div(ctx, uhat[0], uhat[1]) / dt - brot
                    - weak_laplacian(ctx, state.p))
        p = state.p + dp
        px, py = grad(ctx, p)
        gradp = jnp.stack([px, py])
        if ncomp > 2:
            gradp = jnp.concatenate(
                [gradp, jnp.zeros((ncomp - 2,) + px.shape, px.dtype)])

        rhs_loc = ctx.bm * (uhat / dt - gradp)
        if ctx.gs2_plan is not None:
            mv = ctx.mask_vel

            def hmat(y):
                return mv * dssum(ctx, helm_local(dssum(ctx, mv * y), g0))

            def hprecond(r):
                # C P C^T sandwich (see stepper.make_pressure_precond_gs2)
                t = ctx.multinv * dssum(ctx, mv * r)
                z = t / ((g0 / dt) * ctx.bm_assembled + nu_c * ctx.diag_a)
                return mv * dssum(ctx, ctx.multinv * z)

            def hproject(y):
                return mv * y

            b = mv * dssum(ctx, rhs_loc)
            y = solve_spd_local(hmat, b, _gdot, hprecond, cfg.vtol,
                                cfg.vmaxit, hproject)
            unew = dssum(ctx, mv * y)
        else:
            def hmat(g):
                gl = scatter(ctx, ctx.maskg_vel * g)
                return ctx.maskg_vel * assemble(ctx, helm_local(gl, g0))

            def hprecond(r):
                return ctx.maskg_vel * r / ((g0 / dt) * ctx.bmg
                                            + nu_g * ctx.diag_ag)

            def hproject(g):
                return ctx.maskg_vel * g

            rhs_v = ctx.maskg_vel * assemble(ctx, rhs_loc)
            if ctx.hsolve is not None:
                from .cg import solve_spd_direct
                hfn = ctx.hsolve.make_helm_fn(
                    tuple(float(v) for v in np.ravel(nu_c)))
                ug = solve_spd_direct(hmat, rhs_v, hfn, extra=(g0 / dt,),
                                      project=hproject)
            else:
                ug = solve_spd_local(hmat, rhs_v, _gdot, hprecond, cfg.vtol,
                                     cfg.vmaxit, hproject)
            unew = scatter(ctx, ctx.maskg_vel * ug)

        return NSState(u=unew, p=p,
                       ulag=jnp.stack([u, state.ulag[0]]),
                       nlag=jnp.stack([ncur, state.nlag[0]]),
                       cclag=jnp.stack([cc, state.cclag[0]]))

    return lstep


def _coeff_seqs(ctx, cfg, nsteps):
    ab, eb = timestep_coeffs(nsteps, cfg.torder, np.float64)
    return jnp.asarray(ab, ctx.dtype), jnp.asarray(eb, ctx.dtype)


def make_linear_propagator(ctx: SemContext, cfg: NSConfig, has_outflow: bool,
                           nsteps: int, shard=None):
    """Returns prop(base_u, sponge, u0, p0) -> (u_tau, p_tau): the action of
    exp(tau L) on a velocity perturbation, tau = nsteps*dt, about a frozen
    base flow (reference 'forward_linearized_map' with a cold BDF start).

    base_u may be (2,E,n,n) (steady), (nsteps,2,E,n,n) (Floquet orbit replay,
    reference core/matvec.f:200-236), or a FourierOrbit (compressed periodic
    orbit, reconstructed per step inside the scan — solver/orbit.py).

    shard: optional (state_shardings, vel_sharding) from ShardedFlowSystem —
    re-asserted on the scan carry (and the Floquet orbit slice) every step so
    GSPMD's sharding propagation cannot drift inside the loop (the
    MULTICHIP_r02/r03 'involuntary full rematerialization' warnings)."""
    from .orbit import FourierOrbit, orbit_at
    lstep = make_linear_step(ctx, cfg, has_outflow)
    ab_seq, eb_seq = _coeff_seqs(ctx, cfg, nsteps)

    def prop(base_u, sponge, u0, p0=None):
        fourier = isinstance(base_u, FourierOrbit)
        floquet = (not fourier) and base_u.ndim == 5
        if p0 is None:
            p0 = jnp.zeros_like(ctx.bm)
        z = jnp.zeros((2,) + u0.shape, u0.dtype)
        zcc = jnp.zeros((2, 2) + u0.shape[1:], u0.dtype)
        state = NSState(u=u0, p=p0, ulag=jnp.stack([u0, u0]),
                        nlag=z, cclag=zcc)

        def body(st, xs):
            if shard is not None:
                st = lax.with_sharding_constraint(st, shard[0])
            if floquet:
                ab, eb, bu = xs
                if shard is not None:
                    bu = lax.with_sharding_constraint(bu, shard[1])
            elif fourier:
                ab, eb, j = xs
                bu = orbit_at(base_u, j, nsteps)
            else:
                ab, eb = xs
                bu = base_u
            return lstep(bu, sponge, st, ab, eb), None

        if floquet:
            xs = (ab_seq, eb_seq, base_u)
        elif fourier:
            xs = (ab_seq, eb_seq, jnp.arange(nsteps))
        else:
            xs = (ab_seq, eb_seq)
        final, _ = lax.scan(body, state, xs)
        return final.u, final.p

    return prop


def make_linear_chunk(ctx: SemContext, cfg: NSConfig, has_outflow: bool,
                      shard=None):
    """Chunked building block of the linearized propagator: one lax.scan
    over a chunk of steps with the BDF/EXT coefficient rows as TRACED
    arguments — so a single compiled executable serves every chunk position
    (startup ramp included) and every total step count. The driver composes
    chunks host-side (driver.linear_propagator(chunk=...)): compile time is
    bounded by the chunk size instead of scaling with nsteps (the 549 s
    BENCH_r03 compile), and the same executable is reused across bench /
    Newton / eigensolve sampling periods.

    chunk(base_u, sponge, state, ab_seq (c,4), eb_seq (c,3)) -> state', and
    is linear in `state` (transposable for the chunked adjoint)."""
    lstep = make_linear_step(ctx, cfg, has_outflow)

    def chunk(base_u, sponge, state, ab_seq, eb_seq, j_seq=None,
              total_n=None):
        """base_u: steady (2,E,n,n), an orbit CHUNK (c,2,E,n,n) scanned in
        lockstep with the coefficient rows (Floquet replay), or a
        FourierOrbit with j_seq the (c,) snapshot indices and total_n the
        full period length (compressed Floquet replay)."""
        from .orbit import FourierOrbit, orbit_at
        fourier = isinstance(base_u, FourierOrbit)
        orbit = (not fourier) and base_u.ndim == 5

        def body(st, xs):
            if shard is not None:
                st = lax.with_sharding_constraint(st, shard[0])
            if fourier:
                ab, eb, j = xs
                bu = orbit_at(base_u, j, total_n)
            elif orbit:
                ab, eb, bu = xs
                if shard is not None:
                    bu = lax.with_sharding_constraint(bu, shard[1])
            else:
                ab, eb = xs
                bu = base_u
            return lstep(bu, sponge, st, ab, eb), None

        if fourier:
            xs = (ab_seq, eb_seq, j_seq)
        elif orbit:
            xs = (ab_seq, eb_seq, base_u)
        else:
            xs = (ab_seq, eb_seq)
        final, _ = lax.scan(body, state, xs)
        return final

    return chunk


def zero_pstate(ctx: SemContext, u0: jnp.ndarray) -> NSState:
    """Cold-start perturbation state for the linearized propagator."""
    z = jnp.zeros((2,) + u0.shape, u0.dtype)
    zcc = jnp.zeros((2, 2) + u0.shape[1:], u0.dtype)
    return NSState(u=u0, p=jnp.zeros_like(ctx.bm),
                   ulag=jnp.stack([u0, u0]), nlag=z, cclag=zcc)


def make_adjoint_propagator(ctx: SemContext, cfg: NSConfig, has_outflow: bool,
                            nsteps: int, shard=None):
    """Returns adj(base_u, sponge, v) -> (u_adj, p_aux): action of the
    B-weighted adjoint exp(tau L)^dagger = B^-1 T^T B via linear_transpose,
    projected back onto the continuous subspace with the B-orthogonal
    averaging dssum(.)/dssum(B) (reference 'adjoint_linearized_map',
    core/matvec.f:249-326 — there a separately discretized adjoint PDE)."""
    prop = make_linear_propagator(ctx, cfg, has_outflow, nsteps, shard=shard)

    # axisymmetric meshes: conjugate by the strictly positive adjoint weight
    # B~ (bm with its axis zeros floored, ops/context.py) — exactly similar
    # to the transpose, so the adjoint spectrum matches the direct spectrum
    # to machine precision even with the degenerate r-weighted measure
    bmw = ctx.bm if ctx.bm_adj is None else ctx.bm_adj

    def adj(base_u, sponge, v):
        def fwd_vel(u0):
            return prop(base_u, sponge, u0)[0]

        transpose = jax.linear_transpose(fwd_vel, jnp.zeros_like(v))
        (w,) = transpose(bmw * v)
        u_adj = dssum(ctx, w) / dssum(ctx, bmw)
        return u_adj, jnp.zeros_like(ctx.bm)

    return adj


def make_forced_response(ctx: SemContext, cfg: NSConfig, has_outflow: bool,
                         nsteps: int):
    """resp(base_u, sponge, f) = perturbation velocity after nsteps of the
    linearized equations with zero IC and *steady* body force f: the discrete
    int_0^tau exp((tau-s)L) f ds (reference feeds fcx each step,
    initialize_rhs_ts_steady_force_sensitivity, core/sensitivity.f:380-422)."""
    lstep = make_linear_step(ctx, cfg, has_outflow)
    ab_seq, eb_seq = _coeff_seqs(ctx, cfg, nsteps)

    def resp(base_u, sponge, f):
        z = jnp.zeros_like(f)
        zz = jnp.zeros((2,) + z.shape, f.dtype)
        zcc = jnp.zeros((2, 2) + z.shape[1:], f.dtype)
        state = NSState(u=z, p=jnp.zeros_like(ctx.bm), ulag=zz, nlag=zz,
                        cclag=zcc)

        def body(st, xs):
            ab, eb = xs
            return lstep(base_u, sponge, st, ab, eb, fextra=f), None

        final, _ = lax.scan(body, state, (ab_seq, eb_seq))
        return final.u

    return resp


def make_adjoint_forced_response(ctx: SemContext, cfg: NSConfig,
                                 has_outflow: bool, nsteps: int):
    """aresp(base_u, sponge, w) = the B-adjoint of the steady-forcing
    response: int_0^tau exp((tau-s) L^dagger) w ds — used as the rhs of the
    steady-force-sensitivity solve (reference core/sensitivity.f:296-369)."""
    resp = make_forced_response(ctx, cfg, has_outflow, nsteps)

    bmw = ctx.bm if ctx.bm_adj is None else ctx.bm_adj

    def aresp(base_u, sponge, w):
        def fwd(f):
            return resp(base_u, sponge, f)

        transpose = jax.linear_transpose(fwd, jnp.zeros_like(w))
        (g,) = transpose(bmw * w)
        return dssum(ctx, g) / dssum(ctx, bmw)

    return aresp
