"""Semi-implicit incompressible Navier-Stokes stepper (BDF-k/EXT-k splitting).

TPU-native replacement for the Nek5000 `nek_advance` the reference treats as a
black box (SURVEY.md L1, core/matvec.f:222). Scheme: classic high-order
splitting (Karniadakis-Israeli-Orszag 1991, as in Nek5000's PnPn path):

  1. explicit BDF sum + extrapolated advection/forcing:
         uhat = sum_j alpha_j u^{n-j} + dt * sum_j beta_j N(u^{n-j})
  2. pressure Poisson (incremental):  A p^{n+1} = dssum(weak_div(uhat))/dt
  3. velocity Helmholtz:  [ (g0/dt) B + nu A ] u^{n+1} = B (uhat/dt - grad p)

with the BDF/EXT order ramping 1->torder over the first steps (the per-matvec
"cold start" the reference also performs, core/matvec.f:163-243).

Everything is expressed through the linear SEM ops + `solve_spd`
(lax.custom_linear_solve), so the linearized twin of this step
(solver/linearized.py) is exactly transposable.

Velocity components are stacked (2, E, n, n); both Helmholtz solves run as one
batched CG (larger GEMMs, one collective per iteration instead of two).
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
from ..ops.context import SemContext
from ..ops.gather_scatter import assemble, scatter, glsc3
# PREC/bmatvec: ALL preconditioner contractions (element Schwarz blocks,
# vertex-Q1 restrict/prolong, dense coarse solve, spectral deflation) run at
# true f32 like the operator path. At DEFAULT they lower to one-pass bf16 on
# the MXU under the vmap-batched block propagator (batched matvec -> real
# GEMM), which breaks the preconditioner's symmetry/consistency at ~1e-2 —
# PCG with a nonsymmetric preconditioner genuinely diverges, the BENCH_r03
# block-path blow-up (lead |mu| ~ 7.2e8 while the sequential path was
# stable). Bisected with tools/block_vs_seq.py: all-HIGHEST restores
# block==sequential; coarse-only pinning does not.
from ..ops.tensorprod import PREC, bmatvec, grad, weak_div, weak_laplacian

# BDF rows [gamma0, a1, a2, a3] and EXT rows [b1, b2, b3], order 1..3
BDF_TABLE = np.array([
    [1.0, 1.0, 0.0, 0.0],
    [1.5, 2.0, -0.5, 0.0],
    [11.0 / 6.0, 3.0, -1.5, 1.0 / 3.0],
])
EXT_TABLE = np.array([
    [1.0, 0.0, 0.0],
    [2.0, -1.0, 0.0],
    [3.0, -3.0, 1.0],
])


def timestep_coeffs(nsteps: int, torder: int, dtype) -> tuple[np.ndarray, np.ndarray]:
    """Per-step BDF/EXT coefficient sequences with startup ramp (host-side)."""
    orders = np.minimum(np.arange(nsteps), torder - 1)
    return (BDF_TABLE[orders].astype(dtype), EXT_TABLE[orders].astype(dtype))


@partial(jax.tree_util.register_dataclass,
         data_fields=["u_bc", "f", "sponge", "sponge_ref", "u_bc_osc"],
         meta_fields=[])
@dataclasses.dataclass(frozen=True)
class CaseFields:
    """Per-case field data: BC values, steady body force, sponge layer
    (reference: userbc/userf callbacks + spng_* arrays, core/utils.f:149-328).

    u_bc_osc supports time-periodic Dirichlet forcing: the effective BC is
    u_bc + w(t) * u_bc_osc with a per-step scalar sequence w (the reference's
    pulsed-inlet userbc, examples/tpjet/tpjet.usr userbc pert factor)."""

    u_bc: jnp.ndarray        # (2, E, n, n) Dirichlet values (only (1-mask) used)
    f: jnp.ndarray           # (2, E, n, n) steady body force
    sponge: jnp.ndarray      # (E, n, n) sponge ramp chi(x) * strength, >= 0
    sponge_ref: jnp.ndarray  # (2, E, n, n) sponge target state
    u_bc_osc: jnp.ndarray | None = None  # (2, E, n, n) oscillatory BC shape


def zero_case_fields(ctx: SemContext) -> CaseFields:
    # component count from the mask stack (2 velocity + nscalars)
    z2 = jnp.zeros(ctx.mask_vel.shape, ctx.dtype)
    return CaseFields(u_bc=z2, f=z2, sponge=jnp.zeros_like(ctx.bm),
                      sponge_ref=z2)


class NSState(NamedTuple):
    u: jnp.ndarray      # (2, E, n, n)
    p: jnp.ndarray      # (E, n, n)
    ulag: jnp.ndarray   # (2, 2, E, n, n) previous velocities [n-1, n-2]
    nlag: jnp.ndarray   # (2, 2, E, n, n) previous explicit terms
    cclag: jnp.ndarray  # (2, 2, E, n, n) previous curl-curl terms (KIO91
                        # rotational pressure BC, extrapolated like nlag)


def initial_state(ctx: SemContext, u0: jnp.ndarray,
                  p0: jnp.ndarray | None = None) -> NSState:
    p0 = jnp.zeros_like(ctx.bm) if p0 is None else p0
    z = jnp.zeros((2,) + u0.shape, u0.dtype)
    # curl-curl lags are velocity-only (2 components) even with scalars
    zcc = jnp.zeros((2, 2) + u0.shape[1:], u0.dtype)
    return NSState(u=u0, p=p0, ulag=jnp.stack([u0, u0]), nlag=z, cclag=zcc)


def curl_curl(ctx: SemContext, u: jnp.ndarray) -> jnp.ndarray:
    """curl(curl u) = (d omega/dy, -d omega/dx), omega = v_x - u_y (2D).
    Axisymmetric (y = r): (curl omega e_theta)_x = d omega/dr + omega/r; the
    omega/r correction uses the safe reciprocal radius (omega = 0 on the axis
    for smooth axisymmetric flow). Only its trace on Dirichlet faces enters
    (rotational pressure BC)."""
    om = grad(ctx, u[1])[0] - grad(ctx, u[0])[1]
    omx, omy = grad(ctx, om)
    cc = jnp.stack([omy, -omx])
    if ctx.rinv is not None:
        cc = cc.at[0].add(ctx.rinv * om)
    return cc


def convect(ctx: SemContext, c: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """(c . grad) u for stacked fields u (k, E, n, n), velocity c (2, E, n, n).
    Over-integrated on the Gauss grid when the context carries a dealias rule
    (reference: Nek5000 lxd grid), else collocation."""
    if ctx.jd is not None:
        from ..ops.tensorprod import convect_dealiased
        return convect_dealiased(ctx, c, u)
    gx, gy = grad(ctx, u)
    return c[0] * gx + c[1] * gy


def _gdot(a, b):
    """Euclidean dot on (replicated) global dof vectors. No psum: after
    `assemble` every shard holds the identical full global vector."""
    return jnp.vdot(a, b)


def _pvary_globals(ctx: SemContext) -> SemContext:
    """Mark the replicated global-vector context arrays as device-varying
    under shard_map so they mix cleanly with sharded values (no-op single
    device; the arrays really are replicated)."""
    if ctx.axis_name is None:
        return ctx
    pv = lambda x: lax.pvary(x, ctx.axis_name)
    return dataclasses.replace(ctx, maskg_vel=pv(ctx.maskg_vel),
                               maskg_p=pv(ctx.maskg_p),
                               diag_ag=pv(ctx.diag_ag), bmg=pv(ctx.bmg))


def _pressure_solver(ctx: SemContext, cfg: NSConfig, has_outflow: bool):
    """Pressure Poisson solve, Euclidean-symmetric so that
    lax.custom_linear_solve(symmetric=True) transposes it exactly (the key to
    the machine-precision discrete adjoint). Takes a *local* rhs functional,
    returns the solution as a continuous local field.

    Two formulations:
    * structured meshes (ctx.gs2_plan): local-space form
      A_sym = M S A_loc S M with S the slice-exchange dssum (ops/gslib2.py)
      — no XLA gathers anywhere in the CG loop;
    * fallback: assembled global dof vectors via the index-table qsum/qcopy.
    """
    if ctx.gs2_plan is not None:
        return _pressure_solver_gs2(ctx, cfg, has_outflow)

    def amat(g):
        gl = scatter(ctx, ctx.maskg_p * g)
        return ctx.maskg_p * assemble(ctx, weak_laplacian(ctx, gl))

    nn = ctx.n * ctx.n
    mloc = ctx.multinv.reshape(-1, nn)

    def precond(r):
        # fine level: overlapping-Schwarz patches, element-Schwarz
        # pseudo-inverses or Jacobi; coarse level: spectral deflation
        # Z C^-1 Z^T r (p_defl_z is (m, G) here)
        if ctx.p_oschwarz is not None:
            from ..ops.gather_scatter import halo_rows, halo_rows_t
            t = ctx.multinv * scatter(ctx, r)   # W on both sides: symmetric
            H = halo_rows(ctx, t)
            lead = t.shape[:-3]
            E = t.shape[-3]
            xp = jnp.concatenate([t.reshape(lead + (E, nn)),
                                  H.reshape(lead + (E, -1))], axis=-1)
            zp = bmatvec(ctx.p_oschwarz, xp)
            zl = (zp[..., :nn].reshape(t.shape)
                  + halo_rows_t(ctx, zp[..., nn:].reshape(H.shape)))
            z = assemble(ctx, ctx.multinv * zl)
        elif ctx.p_schwarz is not None:
            rl = scatter(ctx, r).reshape(-1, nn) * mloc
            ze = bmatvec(ctx.p_schwarz, rl)
            z = assemble(ctx, (ze * mloc).reshape(ctx.bm.shape))
        else:
            z = r / ctx.diag_ag
        if ctx.p_defl_z is not None:
            c = jnp.einsum("mg,g->m", ctx.p_defl_z, r, precision=PREC)
            z = z + jnp.einsum("mg,m->g", ctx.p_defl_z,
                               ctx.p_defl_c @ c, precision=PREC)
        if ctx.p_vfem is not None:
            # vertex-Q1 coarse grid (ops/precond.build_vertex_coarse)
            from ..ops.gslib import qcopy, qsum
            Jb, vidx, vgid, Aci = ctx.p_vfem
            t = (scatter(ctx, r) * ctx.multinv).reshape(-1, nn)
            rv = qsum(jnp.einsum("qa,eq->ea", Jb, t,
                                 precision=PREC).reshape(-1), vidx, vgid)
            zc = qcopy(bmatvec(Aci, rv), vidx, vgid).reshape(-1, 4)
            zl = (jnp.einsum("qa,ea->eq", Jb, zc,
                             precision=PREC).reshape(ctx.bm.shape)
                  * ctx.multinv)
            z = z + assemble(ctx, zl)
        return ctx.maskg_p * z

    if has_outflow:
        def project(g):
            return ctx.maskg_p * g
    else:
        def project(g):
            # remove the constant nullspace (all-Neumann pressure problem);
            # uniform mean on global dofs — a symmetric projector
            return g - jnp.sum(g) / ctx.nglobal

    if ctx.hsolve is not None:
        from .cg import solve_spd_direct
        hs = ctx.hsolve

        def solve(rhs_local):
            rhs = project(assemble(ctx, rhs_local))
            g = solve_spd_direct(amat, rhs, hs.solve_p, project=project)
            return scatter(ctx, ctx.maskg_p * g)

        return solve

    def solve(rhs_local):
        rhs = project(assemble(ctx, rhs_local))
        g = solve_spd_local(amat, rhs, _gdot, precond, cfg.ptol, cfg.pmaxit,
                            project)
        return scatter(ctx, ctx.maskg_p * g)

    return solve


def make_pressure_precond_gs2(ctx: SemContext):
    """The local-space (gs2) pressure preconditioner application — exposed
    for diagnostics (tools/) and reused by the stepper.

    The core (Schwarz/Jacobi fine level + coarse corrections) is sandwiched
    as C P C^T with C = M S W (mask, dssum, inverse multiplicity): the
    local-space operator A_sym = M S A S M annihilates everything outside
    the continuous subspace range(M S), and a preconditioner that leaks
    into that nullspace feeds CG search directions with p^T A p ~ 0 —
    observed as erratic/stalling residuals. The sandwich keeps P symmetric
    PSD and its range inside range(M S)."""
    from ..ops.gather_scatter import dssum as _dssum
    mask = ctx.mask_p
    nn = ctx.n * ctx.n

    def _core(r):
        # fine level: overlapping-Schwarz patches (exact inverses of the
        # assembled-operator patch submatrices, halo width 1 — the
        # Fischer/Lottes semg-style smoother; ops/precond.
        # build_overlap_schwarz), or element Schwarz (multiplicity-weighted
        # on both sides => Euclidean-symmetric), or point Jacobi; coarse
        # level: spectral deflation zc = Z C^-1 Z^T r — two skinny GEMMs;
        # under sharding the only communication is the psum of the (m,)
        # coefficients (replaces an all_gather-based dense (E, E) coarse
        # inverse)
        if ctx.p_oschwarz is not None:
            from ..ops.gather_scatter import halo_rows, halo_rows_t
            t = mask * r
            H = halo_rows(ctx, t)
            lead = t.shape[:-3]
            E = t.shape[-3]
            xp = jnp.concatenate([t.reshape(lead + (E, nn)),
                                  H.reshape(lead + (E, -1))], axis=-1)
            zp = bmatvec(ctx.p_oschwarz, xp)
            z = (zp[..., :nn].reshape(t.shape)
                 + halo_rows_t(ctx, zp[..., nn:].reshape(H.shape)))
        elif ctx.p_schwarz is not None:
            rl = (ctx.multinv * (mask * r)).reshape(-1, nn)
            ze = bmatvec(ctx.p_schwarz, rl)
            z = (ze.reshape(ctx.bm.shape)) * ctx.multinv
        else:
            z = (mask * r) / ctx.diag_a
        if ctx.p_defl_z is not None:
            c = jnp.einsum("meij,eij->m", ctx.p_defl_z, r, precision=PREC)
            if ctx.axis_name is not None:
                c = jax.lax.psum(c, ctx.axis_name)
            z = z + jnp.einsum("m,meij->eij", ctx.p_defl_c @ c, ctx.p_defl_z,
                               precision=PREC)
        if ctx.p_vfem is not None:
            # vertex-Q1 coarse grid (ops/precond.build_vertex_coarse):
            # restrict to element corners (one small GEMM), assemble the
            # NV vertex residual (gather-only qsum), dense coarse solve,
            # prolong back — the reference's semg coarse-grid role
            from ..ops.gslib import qcopy, qsum
            Jb, vidx, vgid, Aci = ctx.p_vfem
            t = (ctx.multinv * (mask * r)).reshape(-1, nn)
            rv = qsum(jnp.einsum("qa,eq->ea", Jb, t,
                                 precision=PREC).reshape(-1), vidx, vgid)
            zc = qcopy(bmatvec(Aci, rv), vidx, vgid).reshape(-1, 4)
            z = z + (jnp.einsum("qa,ea->eq", Jb, zc,
                                precision=PREC).reshape(ctx.bm.shape)
                     * ctx.multinv)
        return mask * z

    def precond(r):
        t = ctx.multinv * _dssum(ctx, mask * r)
        z = _core(t)
        return mask * _dssum(ctx, ctx.multinv * z)

    return precond


def _pressure_solver_gs2(ctx: SemContext, cfg: NSConfig, has_outflow: bool):
    from ..ops.gather_scatter import dssum

    mask = ctx.mask_p

    def amat(y):
        return mask * dssum(ctx, weak_laplacian(ctx, dssum(ctx, mask * y)))

    precond = make_pressure_precond_gs2(ctx)

    if has_outflow:
        def project(y):
            return mask * y
    else:
        # enclosed flow: the null direction of A_sym = S A S is y* = multinv
        # (S multinv = ones). Consistency requires r perp multinv; remove the
        # incompatible component as a UNIFORM assembled shift (subtract
        # c * ones with c = <multinv, y>/nglobal — then <multinv, y'> = 0 and
        # the physics correction is the standard constant compatibility fix)
        minv = ctx.multinv

        def project(y):
            return y - jnp.vdot(minv, y) / ctx.nglobal

    def solve(rhs_local):
        b = project(mask * dssum(ctx, rhs_local))
        y = solve_spd_local(amat, b, _gdot, precond, cfg.ptol, cfg.pmaxit,
                            project)
        return dssum(ctx, mask * y)

    return solve


def solve_spd_local(amat, rhs, dot, precond, rtol, maxiter, project=None):
    from .cg import solve_spd
    return solve_spd(amat, rhs, dot=dot, precond=precond, rtol=rtol,
                     maxiter=maxiter, project=project)


def make_step(ctx: SemContext, cfg: NSConfig, has_outflow: bool):
    """Returns step(case, state, ab, eb, fextra=None) -> (state', ncur) — one
    nonlinear NS time step; ab/eb are the BDF/EXT coefficient rows for this
    step; fextra is an optional extra body force (SFD/TDF/BoostConv feedback,
    the nekStab_forcing hook of the reference, core/utils.f:149-180)."""
    nu = cfg.nu
    ncomp = 2 + (1 if cfg.boussinesq else 0)
    # per-component diffusivity: velocity nu, temperature nu/Pr (Boussinesq)
    nu_c = jnp.asarray([nu, nu] + [nu / cfg.pr] * (ncomp - 2),
                       ctx.dtype)[:, None, None, None]
    nu_g = nu_c[:, :, 0, 0]                      # (ncomp, 1) for global masks
    ctx = _pvary_globals(ctx)
    psolve = _pressure_solver(ctx, cfg, has_outflow)

    def helm_local(w, g0, dt):
        out = (g0 / dt) * ctx.bm * w + nu_c * weak_laplacian(ctx, w)
        if ctx.axdiag is not None:
            # axisymmetric radial momentum: + nu * int phi v/r  (the v/r^2
            # term of the cylindrical vector Laplacian, one r cancelled)
            out = out.at[1].add(nu * ctx.axdiag * w[1])
        return out

    def step(case: CaseFields, state: NSState, ab, eb, fextra=None, dt=None,
             bcw=None):
        if dt is None:
            dt = cfg.dt
        u_bc = case.u_bc
        if case.u_bc_osc is not None and bcw is not None:
            u_bc = u_bc + bcw * case.u_bc_osc
        # explicit term N(u^n) = -(u.grad)u + f + sponge
        u = state.u
        ncur = (-convect(ctx, u, u) + case.f
                + case.sponge * (case.sponge_ref - u))
        if cfg.boussinesq:
            # buoyancy force g * theta on the momentum components
            gv = jnp.asarray(cfg.gvec, u.dtype)[:, None, None, None]
            ncur = ncur.at[:2].add(gv * u[2])
        if fextra is not None:
            ncur = ncur + fextra
        uhat = (ab[1] * u + ab[2] * state.ulag[0] + ab[3] * state.ulag[1]
                + dt * (eb[0] * ncur + eb[1] * state.nlag[0]
                        + eb[2] * state.nlag[1]))
        g0 = ab[0]

        # incremental pressure Poisson; the g0*(u_bc.n) surface term imposes
        # the prescribed normal velocity on the projected field (essential for
        # inflow/through-flow), and the extrapolated nu*(curl curl u).n term
        # is the KIO91 rotational pressure BC (kills the O(nu) splitting
        # boundary error of the non-rotational form)
        cc = curl_curl(ctx, u)
        cc_ext = (eb[0] * cc + eb[1] * state.cclag[0]
                  + eb[2] * state.cclag[1])
        bflux = ctx.bwn[0] * u_bc[0] + ctx.bwn[1] * u_bc[1]
        brot = nu * (ctx.bwn[0] * cc_ext[0] + ctx.bwn[1] * cc_ext[1])
        dp = psolve((weak_div(ctx, uhat[0], uhat[1]) - g0 * bflux) / dt
                    - brot - weak_laplacian(ctx, state.p))
        p = state.p + dp
        px, py = grad(ctx, p)
        gradp = jnp.stack([px, py])
        if ncomp > 2:    # no pressure gradient in the scalar equations
            gradp = jnp.concatenate(
                [gradp, jnp.zeros((ncomp - 2,) + px.shape, px.dtype)])

        # viscous Helmholtz with Dirichlet lifting
        u_b = (1.0 - ctx.mask_vel) * u_bc
        rhs_loc = ctx.bm * (uhat / dt - gradp) - helm_local(u_b, g0, dt)

        if ctx.gs2_plan is not None:
            from ..ops.gather_scatter import dssum
            mv = ctx.mask_vel

            def hmat(y):
                return mv * dssum(ctx, helm_local(dssum(ctx, mv * y), g0, dt))

            def hprecond(r):
                # C P C^T sandwich: keep the preconditioner's range inside
                # the continuous subspace (see make_pressure_precond_gs2)
                t = ctx.multinv * dssum(ctx, mv * r)
                z = t / ((g0 / dt) * ctx.bm_assembled + nu_c * ctx.diag_a)
                return mv * dssum(ctx, ctx.multinv * z)

            def hproject(y):
                return mv * y

            b = mv * dssum(ctx, rhs_loc)
            y = solve_spd_local(hmat, b, _gdot, hprecond, cfg.vtol,
                                cfg.vmaxit, hproject)
            unew = dssum(ctx, mv * y) + u_b
        else:
            def hmat(g):
                gl = scatter(ctx, ctx.maskg_vel * g)
                return ctx.maskg_vel * assemble(ctx, helm_local(gl, g0, dt))

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
            unew = scatter(ctx, ctx.maskg_vel * ug) + u_b

        new_state = NSState(u=unew, p=p,
                            ulag=jnp.stack([u, state.ulag[0]]),
                            nlag=jnp.stack([ncur, state.nlag[0]]),
                            cclag=jnp.stack([cc, state.cclag[0]]))
        return new_state, ncur

    return step


def make_advance(ctx: SemContext, cfg: NSConfig, has_outflow: bool,
                 nsteps: int, collect: bool = False, shard=None):
    """Returns advance(case, state) -> (state', aux): nsteps of the nonlinear
    stepper under lax.scan. aux = per-step kinetic energy; with collect=True
    additionally the full velocity trajectory (orbit storage for Floquet/UPO,
    reference core/matvec.f:200-236). shard: optional (state_shardings, _)
    re-asserted on the carry each step (see make_linear_propagator)."""
    step = make_step(ctx, cfg, has_outflow)
    ab_seq, eb_seq = timestep_coeffs(nsteps, cfg.torder, np.float64)
    ab_seq = jnp.asarray(ab_seq, ctx.dtype)
    eb_seq = jnp.asarray(eb_seq, ctx.dtype)

    def advance(case: CaseFields, state: NSState, bcw_seq=None):
        def body(st, xs):
            if shard is not None:
                st = lax.with_sharding_constraint(st, shard[0])
            ab, eb = xs[0], xs[1]
            bcw = xs[2] if len(xs) > 2 else None
            new_state, _ = step(case, st, ab, eb, bcw=bcw)
            energy = 0.5 * glsc3(ctx, new_state.u, ctx.bm, new_state.u)
            # trajectory samples are the PRE-step states u_j: the orbit
            # replay linearizes step j about u_j (validated against the
            # exact jvp to 6e-8; the after-step convention biased the
            # Floquet trivial multiplier by ~6e-3 at dt=1e-2 — round 5)
            out = (energy, st.u) if collect else energy
            return new_state, out

        xs = (ab_seq, eb_seq) if bcw_seq is None else (ab_seq, eb_seq, bcw_seq)
        return lax.scan(body, state, xs)

    return advance


def make_advance_chunk(ctx: SemContext, cfg: NSConfig, has_outflow: bool,
                       shard=None, collect: bool = False):
    """Chunked building block of the nonlinear advance: one scan over a
    chunk of steps with the BDF/EXT coefficient rows as traced arguments,
    so one compiled executable serves every chunk position and every total
    step count (see solver/linearized.make_linear_chunk — same rationale:
    compile time bounded by the chunk size). Returns
    chunk(case, state, ab_seq, eb_seq) -> (state', energies (c,)); with
    collect=True the aux is (energies, trajectory chunk), exactly the
    make_advance(collect=True) aux split per chunk — so orbit collection
    (Floquet/UPO) no longer needs one monolithic multi-thousand-step device
    program (the axon relay kills single calls beyond its execution-time
    limit: observed 'TPU worker process crashed' on a 2500-step collect)."""
    step = make_step(ctx, cfg, has_outflow)

    def chunk(case: CaseFields, state: NSState, ab_seq, eb_seq):
        def body(st, xs):
            if shard is not None:
                st = lax.with_sharding_constraint(st, shard[0])
            ab, eb = xs
            new_state, _ = step(case, st, ab, eb)
            energy = 0.5 * glsc3(ctx, new_state.u, ctx.bm, new_state.u)
            out = (energy, st.u) if collect else energy   # PRE-step state
            return new_state, out

        return lax.scan(body, state, (ab_seq, eb_seq))

    return chunk


def make_advance_dt_chunk(ctx: SemContext, cfg: NSConfig, has_outflow: bool,
                          collect: bool = False):
    """Chunked building block of the traced-dt nonlinear advance (the UPO
    period map, where dt = T/nsteps is a Newton unknown): one scan over a
    chunk of steps with dt traced and the BDF/EXT rows as arguments —
    bounded per-call execution time (axon relay limit; see
    make_advance_chunk) and one executable for every chunk position.
    chunk(case, state, dt, ab_seq, eb_seq) -> (state', traj|None)."""
    step = make_step(ctx, cfg, has_outflow)

    def chunk(case: CaseFields, state: NSState, dt, ab_seq, eb_seq):
        def body(st, xs):
            ab, eb = xs
            new_state, _ = step(case, st, ab, eb, dt=dt)
            out = st.u if collect else None               # PRE-step state
            return new_state, out

        return lax.scan(body, state, (ab_seq, eb_seq))

    return chunk


def make_advance_dt(ctx: SemContext, cfg: NSConfig, has_outflow: bool,
                    nsteps: int, collect: bool = False):
    """Like make_advance but with the time step as a *traced* argument:
    advance(case, state, dt) — used by the periodic-orbit Newton where the
    period T = nsteps*dt is an unknown (reference UPO mode 2.1,
    core/newton_krylov.f:79-88, core/matvec.f:381-475)."""
    step = make_step(ctx, cfg, has_outflow)
    ab_seq, eb_seq = timestep_coeffs(nsteps, cfg.torder, np.float64)
    ab_seq = jnp.asarray(ab_seq, ctx.dtype)
    eb_seq = jnp.asarray(eb_seq, ctx.dtype)

    def advance(case: CaseFields, state: NSState, dt):
        def body(st, coeffs):
            ab, eb = coeffs
            new_state, _ = step(case, st, ab, eb, dt=dt)
            out = st.u if collect else None               # PRE-step state
            return new_state, out

        return lax.scan(body, state, (ab_seq, eb_seq))

    return advance
