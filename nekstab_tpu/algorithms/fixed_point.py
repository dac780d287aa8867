"""Base-flow stabilizers: SFD, BoostConv, TDF.

Reference: core/fixedp.f (SFD :114-242, BoostConv :282-393, TDF :2-112).
Here the framework owns the time loop (SURVEY.md §1): each stabilizer runs
jitted chunks of the nonlinear stepper with its feedback force injected via
the `fextra` hook, and a thin host loop checks convergence between chunks
(residual = ||u^n - u^{n-1}||_B per step, written to residu.dat-style logs by
the caller).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..config import NSConfig
from ..ops.context import SemContext
from ..ops.gather_scatter import glsc3
from ..solver.stepper import (CaseFields, NSState, make_step, timestep_coeffs)


def sfd_params(st_freq: float, sigma: float, casacuberta: bool = False
               ) -> tuple[float, float]:
    """(cutoff, gain) of the SFD filter/feedback from the estimated
    instability Strouhal number and growth rate.

    Akervik 2006: cutoff = omega/2, gain = -2 sigma;
    Casacuberta 2018 (JCP 375:481-497): optimal
      cutoff = (sqrt(omega^2+sigma^2) - sigma)/2,
      gain  = -(sqrt(omega^2+sigma^2) + sigma)/2.
    (reference core/fixedp.f:135-152, driven by uparam(4:5))
    """
    omega = abs(st_freq) * 2.0 * np.pi
    sigma = abs(sigma)
    if casacuberta:
        s = np.hypot(omega, sigma)
        return 0.5 * (s - sigma), -0.5 * (s + sigma)
    return 0.5 * omega, -2.0 * sigma


@dataclass
class StabilizerResult:
    state: NSState
    residuals: np.ndarray      # per-step ||u^n - u^{n-1}||_B
    converged: bool
    aux: dict = field(default_factory=dict)


def _step_norm(ctx, du):
    return jnp.sqrt(glsc3(ctx, du, ctx.bm, du))


def make_sfd_chunk(ctx: SemContext, cfg: NSConfig, has_outflow: bool,
                   nsteps: int, cutoff: float, gain: float):
    """Jitted SFD chunk: nsteps with low-pass-filtered feedback
    f = gain * (u - qbar), d(qbar)/dt = cutoff * (u - qbar).
    (The reference integrates the filter with AB3, core/fixedp.f:171-193;
    forward Euler has the same fixed point u = qbar = steady state.)"""
    step = make_step(ctx, cfg, has_outflow)
    ab, eb = (jnp.asarray(c, ctx.dtype)
              for c in timestep_coeffs(nsteps, cfg.torder, np.float64))

    def chunk(case: CaseFields, state: NSState, qbar):
        def body(carry, coeffs):
            st, qb = carry
            f = gain * (st.u - qb)
            st2, _ = step(case, st, coeffs[0], coeffs[1], fextra=f)
            qb2 = qb + cutoff * cfg.dt * (st2.u - qb)
            res = _step_norm(ctx, st2.u - st.u)
            return (st2, qb2), res
        (st, qb), res = lax.scan(body, (state, qbar), (ab, eb))
        return st, qb, res

    return jax.jit(chunk)


def sfd(ctx: SemContext, cfg: NSConfig, case: CaseFields, has_outflow: bool,
        state: NSState, *, st_freq: float = 0.2, sigma: float = 0.05,
        casacuberta: bool = False, tol: float = 1e-9, chunk_steps: int = 200,
        max_chunks: int = 500, dyntol: bool = False,
        residu_path: str | None = None, logger: Callable = print,
        callback: Callable | None = None) -> StabilizerResult:
    """Selective frequency damping to a steady base flow
    (reference SFD, core/fixedp.f:114-242).

    dyntol: staged inner-solve tolerances — the implicit-solver tolerances
    track a decade below the current residual (floored at cfg.vtol/ptol),
    so early transients don't pay converged-solve cost (spec_tole_sfd,
    core/fixedp.f:244-280). Each stage rebuilds the jitted chunk.
    residu_path: append per-chunk `t residu` rows (the reference's
    residu.dat, core/fixedp.f:206-219).
    Continuation across Re (the reference's SFD continuation mode) is a
    re-call with a new cfg and the previous result's state/qbar.
    """
    import dataclasses
    cutoff, gain = sfd_params(st_freq, sigma, casacuberta)
    logger(f"[sfd] cutoff={cutoff:.4f} gain={gain:.4f} "
           f"({'Casacuberta' if casacuberta else 'Akervik'})")
    series = None
    if residu_path is not None:
        from ..io.spectra import AsciiSeries
        series = AsciiSeries(residu_path, header="t residu tol")
    def stage_tols(res):
        v = 10.0 ** np.floor(np.log10(max(0.1 * res, 1e-300)))
        return (max(min(v, 1e-4), cfg.vtol), max(min(v, 1e-4), cfg.ptol))
    cur = (cfg.vtol, cfg.ptol) if not dyntol else stage_tols(1.0)
    ecfg = dataclasses.replace(cfg, vtol=cur[0], ptol=cur[1])
    chunk = make_sfd_chunk(ctx, ecfg, has_outflow, chunk_steps, cutoff, gain)
    qbar = state.u
    hist = []
    converged = False
    for i in range(max_chunks):
        state, qbar, res = chunk(case, state, qbar)
        res = np.asarray(res)
        hist.append(res)
        t_now = cfg.dt * chunk_steps * (i + 1)
        logger(f"[sfd] chunk={i} t={t_now:.2f} residu={res[-1]:.4e} "
               f"(vtol {cur[0]:.1e})")
        if series is not None:
            series.append(t_now, res[-1], cur[0])
        if callback is not None:
            callback(i, state, res)
        if res[-1] < tol:
            converged = True
            break
        if not np.isfinite(res[-1]):
            raise FloatingPointError("SFD diverged (NaN residual)")
        if dyntol:
            new = stage_tols(float(res[-1]))
            if new != cur:
                cur = new
                ecfg = dataclasses.replace(cfg, vtol=cur[0], ptol=cur[1])
                chunk = make_sfd_chunk(ctx, ecfg, has_outflow, chunk_steps,
                                       cutoff, gain)
    return StabilizerResult(state=state, residuals=np.concatenate(hist),
                            converged=converged,
                            aux=dict(qbar=qbar, cutoff=cutoff, gain=gain))


# ---------------------------------------------------------------------------
# BoostConv (Citro et al. JCP 2017; reference core/fixedp.f:282-393)
# ---------------------------------------------------------------------------

class BoostConvState(NamedTuple):
    Y: jnp.ndarray       # (snp, 2, E, n, n) input-residual subspace
    X: jnp.ndarray       # (snp, 2, E, n, n) boosted-residual subspace
    rot: jnp.ndarray     # current ring slot (int32)
    count: jnp.ndarray   # number of calls so far


def boostconv_init(ctx: SemContext, snapshots: int) -> BoostConvState:
    z = jnp.zeros((snapshots, 2) + ctx.bm.shape, ctx.dtype)
    return BoostConvState(Y=z, X=z, rot=jnp.int32(0), count=jnp.int32(0))


def make_boostconv_core(ctx: SemContext, snapshots: int):
    """One BoostConv residual transformation r -> r' (boostconv_core,
    core/fixedp.f:331-393): maintain subspaces of input/output residual
    differences, B-orthonormalize Y (MGS), project the current residual and
    extrapolate with the stored boosted residuals."""

    def bdot(a, b):
        return glsc3(ctx, a, ctx.bm, b)

    @jax.jit
    def core(state: BoostConvState, r):
        Y, X, rot, count = state

        def first_call(_):
            Y2 = Y.at[0].set(r)
            X2 = X.at[0].set(r)
            return r, BoostConvState(Y2, X2, jnp.int32(0), count + 1)

        def update(_):
            Y2 = Y.at[rot].add(-r)            # y_rot <- y_rot - r
            X2 = X.at[rot].add(-Y2[rot])      # x_rot <- x_rot - y_rot
            # B-orthonormalize Y2 (modified Gram-Schmidt), R upper triangular
            def mgs_col(carry, j):
                Q, R = carry
                v = Y2[j]
                def body(i, acc):
                    vv, R = acc
                    h = jnp.where(i < j, bdot(Q[i], vv), 0.0)
                    vv = vv - h * Q[i]
                    R = R.at[i, j].set(h)
                    return vv, R
                v, R = lax.fori_loop(0, snapshots, body, (v, R))
                nrm = jnp.sqrt(bdot(v, v))
                safe = jnp.maximum(nrm, 1e-30)
                Q = Q.at[j].set(v / safe)
                R = R.at[j, j].set(nrm)
                return (Q, R), None
            Q0 = jnp.zeros_like(Y2)
            R0 = jnp.zeros((snapshots, snapshots), ctx.dtype)
            (Q, R), _ = lax.scan(mgs_col, (Q0, R0), jnp.arange(snapshots))
            c = jax.vmap(lambda q: bdot(r, q))(Q)
            # solve R ccb = c (upper triangular, guarded diagonal)
            diag = jnp.diagonal(R)
            Rsafe = R + jnp.diag(jnp.where(jnp.abs(diag) < 1e-28,
                                           1.0, 0.0))
            ccb = jax.scipy.linalg.solve_triangular(Rsafe, c, lower=False)
            ccb = jnp.where(jnp.abs(diag) < 1e-28, 0.0, ccb)
            rot2 = (rot + 1) % snapshots
            Y3 = Y2.at[rot2].set(r)
            rboost = r + jnp.tensordot(ccb, X2, axes=(0, 0))
            X3 = X2.at[rot2].set(rboost)
            return rboost, BoostConvState(Y3, X3, rot2, count + 1)

        return lax.cond(count == 0, first_call, update, None)

    return core


def boostconv(ctx: SemContext, cfg: NSConfig, case: CaseFields,
              has_outflow: bool, state: NSState, *, skip: int = 10,
              snapshots: int = 10, tol: float = 1e-9, max_outer: int = 2000,
              residu_path: str | None = None, logger: Callable = print,
              callback: Callable | None = None) -> StabilizerResult:
    """BoostConv convergence acceleration to a steady state (reference
    core/fixedp.f:282-329: every bst_skp steps the one-step increment
    u^n - u^{n-1} is boosted through the residual subspace and re-applied)."""
    series = None
    if residu_path is not None:
        from ..io.spectra import AsciiSeries
        series = AsciiSeries(residu_path, header="t residu")
    step = make_step(ctx, cfg, has_outflow)
    ab, eb = (jnp.asarray(c, ctx.dtype)
              for c in timestep_coeffs(skip, cfg.torder, np.float64))
    core = make_boostconv_core(ctx, snapshots)

    @jax.jit
    def chunk(case, state):
        def body(st, coeffs):
            st2, _ = step(case, st, coeffs[0], coeffs[1])
            return st2, None
        st, _ = lax.scan(body, state, (ab, eb))
        return st

    bstate = boostconv_init(ctx, snapshots)
    hist = []
    converged = False
    for it in range(max_outer):
        state = chunk(case, state)
        r = state.u - state.ulag[0]
        res = float(_step_norm(ctx, r))
        hist.append(res)
        rboost, bstate = core(bstate, r)
        state = state._replace(u=state.ulag[0] + rboost)
        if series is not None:
            series.append(cfg.dt * skip * (it + 1), res)
        if it % 10 == 0:
            logger(f"[boostconv] outer={it} residu={res:.4e}")
        if callback is not None:
            callback(it, state, res)
        if res < tol:
            converged = True
            break
        if not np.isfinite(res):
            raise FloatingPointError("BoostConv diverged")
    return StabilizerResult(state=state, residuals=np.asarray(hist),
                            converged=converged)


# ---------------------------------------------------------------------------
# TDF — time-delayed feedback for (forced) periodic orbits
# (reference core/fixedp.f:2-112)
# ---------------------------------------------------------------------------

def tdf(ctx: SemContext, cfg: NSConfig, case: CaseFields, has_outflow: bool,
        state: NSState, *, period: float, gain: float | None = None,
        tol: float = 1e-7, max_periods: int = 200,
        residu_path: str | None = None, logger: Callable = print,
        callback: Callable | None = None,
        bc_wave: Callable | None = None,
        chunk_steps: int | None = None) -> StabilizerResult:
    """Time-delayed feedback stabilization of a periodic orbit with target
    period T: f(t) = gain * (u(t) - u(t-T)), default gain the theoretically
    optimal -0.04432 * 2 pi / T (reference core/fixedp.f:37). The time step
    is adjusted so T = norbit * dt exactly (core/fixedp.f:24-35).

    bc_wave(t) (T-periodic scalar) drives a pulsed Dirichlet inlet through
    case.u_bc_osc — the reference's forced-orbit jet (tpjet userbc).
    chunk_steps: split each period's scan into pieces of at most this many
    steps (one jitted chunk executable, ring buffer donated): physical
    orbit lengths (tpjet: 667 steps) exceed the remote-TPU relay's
    per-call execution limit as a monolithic scan (cf. driver.chunk_steps)."""
    import dataclasses
    norbit = int(np.ceil(period / cfg.dt))
    dt = period / norbit
    cfg = dataclasses.replace(cfg, dt=dt)
    if gain is None:
        gain = -0.04432 * 2.0 * np.pi / period
    logger(f"[tdf] period={period} norbit={norbit} dt={dt:.5e} gain={gain:.5f}")
    step = make_step(ctx, cfg, has_outflow)
    ab, eb = (jnp.asarray(c, ctx.dtype)
              for c in timestep_coeffs(norbit, cfg.torder, np.float64))
    if bc_wave is not None:
        bcw = jnp.asarray([bc_wave((i + 1) * dt) for i in range(norbit)],
                          ctx.dtype)
    else:
        bcw = jnp.zeros(norbit, ctx.dtype)

    from functools import partial

    @partial(jax.jit, donate_argnums=(2,))
    def run_chunk(case, state, ring, warmed, abi, ebi, idxs, bcwi):
        def body(carry, xs):
            st, ring = carry
            abx, ebx, i, bcwx = xs
            delayed = ring[i]
            f = jnp.where(warmed, gain, 0.0) * (st.u - delayed)
            st2, _ = step(case, st, abx, ebx, fextra=f, bcw=bcwx)
            res = _step_norm(ctx, st2.u - delayed)
            ring = ring.at[i].set(st2.u)
            return (st2, ring), res
        (st, ring), res = lax.scan(body, (state, ring),
                                   (abi, ebi, idxs, bcwi))
        return st, ring, res

    c = chunk_steps or norbit
    # uniform chunk length (pad-free): pick the largest c' <= c dividing
    # norbit so ONE executable serves every piece
    while norbit % c != 0:
        c -= 1
    idx_all = jnp.arange(norbit)

    def one_period(case, state, ring, warmed):
        res_parts = []
        for k0 in range(0, norbit, c):
            sl = slice(k0, k0 + c)
            state, ring, res = run_chunk(case, state, ring, warmed,
                                         ab[sl], eb[sl], idx_all[sl],
                                         bcw[sl])
            res_parts.append(res)
        return state, ring, jnp.concatenate(res_parts)

    series = None
    if residu_path is not None:
        from ..io.spectra import AsciiSeries
        series = AsciiSeries(residu_path, header="t residu")
    ring = jnp.zeros((norbit,) + state.u.shape, ctx.dtype)
    hist = []
    converged = False
    for it in range(max_periods):
        state, ring, res = one_period(case, state, ring,
                                      jnp.asarray(it > 0))
        res = np.asarray(res)
        hist.append(res)
        logger(f"[tdf] period={it} residu=||u(t)-u(t-T)||={res[-1]:.4e}")
        if series is not None:
            series.append(period * (it + 1), res[-1])
        if callback is not None:
            callback(it, state, res)
        if it > 0 and res[-1] < tol:
            converged = True
            break
    return StabilizerResult(state=state, residuals=np.concatenate(hist),
                            converged=converged,
                            aux=dict(norbit=norbit, dt=dt, gain=gain,
                                     orbit=ring))
