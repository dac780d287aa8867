"""Floquet analysis of the cylinder limit cycle at Re=60 — end to end.

Pipeline (reference modes 3.11/3.31, core/matvec.f:192-236 + orbit storage
:200-236; BASELINE config 5):
  1. DNS to the saturated vortex-shedding limit cycle;
  2. period T from rising zero crossings of a wake probe (zero_crossing,
     core/usr_extra.f:657-728), dt snapped so T = norbit * dt exactly;
  3. collect one period of the orbit, Fourier-compress it (solver/orbit.py,
     the reference fourier.f capability rebuilt);
  4. Floquet Krylov-Schur on the time-periodic linearized propagator over
     one period.

Physics check that costs nothing: a limit cycle's monodromy operator has the
TRIVIAL Floquet multiplier mu = 1 (eigenvector = du/dt of the orbit). The
run reports |mu_lead - 1| plus the leading nontrivial multiplier.

TPU (default env):  python examples/cylinder_floquet.py
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


FLD = "/root/reference/examples/cylinder/stability/direct/BF_1cyl0.f00001"


def build(dt, tpu=True, re=60.0):
    """Reference-mesh system at Re=60 (the generated coarse cylinder mesh is
    measurably over-diffusive: it is stable at Re=60 while the true flow
    destabilizes at Re_c ~ 47, so Floquet physics must run on the ingested
    1996-element reference discretization)."""
    from nekstab_tpu.models.cylinder import cylinder_reference_system
    kw = dict(re=re, dt=dt, dealias=True)
    if tpu:
        sys_, base = cylinder_reference_system(
            FLD, dtype=jnp.float32, vtol=1e-5, ptol=1e-5,
            pressure_precond="oschwarz_vfem", **kw)
    else:
        sys_, base = cylinder_reference_system(FLD, host_direct=True, **kw)
    return sys_, base


def probe_index(ctx, xp, yp):
    x = np.asarray(ctx.xcoord)
    y = np.asarray(ctx.ycoord)
    flat = np.argmin((x - xp) ** 2 + (y - yp) ** 2)
    return np.unravel_index(flat, x.shape)


def main(args):
    from nekstab_tpu.algorithms import krylov_schur, log_transform
    from nekstab_tpu.analysis import ZeroCrossing, kinetic_energy
    from nekstab_tpu.config import ArnoldiConfig
    from nekstab_tpu.models.cylinder import freestream_ic
    from nekstab_tpu.solver import initial_state
    from nekstab_tpu.solver.orbit import compress_orbit, compression_ratio
    from nekstab_tpu.utils import add_noise

    t0 = time.time()
    sys_, base = build(args.dt, tpu=not args.cpu)
    ctx = sys_.ctx
    print(f"mesh: {sys_.mesh.nelem} elems, {sys_.mesh.nglobal} dofs, "
          f"backend={jax.default_backend()}", flush=True)

    if args.smoke:
        # machinery-only pass for the regression runner (examples/smoke.py):
        # tiny fake orbit -> Fourier compression -> one Floquet matvec
        norbit = 8
        st, (_, orbit) = sys_.nonlinear_advance(norbit, collect=True)(
            sys_.case, initial_state(ctx, base))
        fo = compress_orbit(orbit, energy=args.energy)
        w, _ = sys_.linear_propagator(norbit)(fo, sys_.sponge_fun,
                                              add_noise(ctx, seed=1))
        nrm = float(jnp.linalg.norm(w.ravel()))
        assert np.isfinite(nrm) and nrm > 0
        print(f"SMOKE PASS ({time.time()-t0:.0f}s, |Mv|={nrm:.3e})",
              flush=True)
        return

    # --- 1. DNS to the limit cycle --------------------------------------
    # start from the Re=50 steady state with a localized cross-stream
    # impulse in the near wake: it projects strongly on the antisymmetric
    # shedding mode (random noise mostly feeds decaying modes and takes
    # hundreds of TU to trigger)
    x = np.asarray(ctx.xcoord)
    y = np.asarray(ctx.ycoord)
    kick = 0.4 * np.exp(-((x - 1.5) ** 2 + y ** 2))
    u0 = base
    u0 = u0.at[1].add(jnp.asarray(kick * np.asarray(ctx.mask_vel[1]),
                                  ctx.dtype))
    # segmented warmup with a resume checkpoint: the remote-TPU relay can
    # crash mid-DNS (observed: "TPU worker process crashed" 25 min in) and
    # a monolithic 12k-step warmup would lose everything
    from nekstab_tpu.io.checkpoint import load_field, save_field
    warm_ckpt = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "_floq_warmup.npz")
    t_done = 0.0
    if os.path.exists(warm_ckpt):
        uw, _, metaw = load_field(warm_ckpt, dtype=ctx.dtype)
        if abs(metaw.get("dt", 0) - args.dt) < 1e-12:
            u0 = jnp.asarray(uw)
            t_done = float(metaw.get("t_done", 0.0))
            print(f"warmup resume: t={t_done}", flush=True)
    st = initial_state(ctx, u0)
    seg_tu = 10.0
    E = None
    while t_done < args.warmup - 1e-9:
        tu = min(seg_tu, args.warmup - t_done)
        nseg = int(round(tu / args.dt))
        st, E = sys_.nonlinear_advance(nseg)(sys_.case, st)
        jax.block_until_ready(st.u)
        t_done += tu
        save_field(warm_ckpt, np.asarray(st.u), dt=args.dt, t_done=t_done)
        print(f"  warmup t={t_done:.0f}/{args.warmup:.0f} "
              f"E={float(E[-1]):.6f} ({time.time()-t0:.0f}s)", flush=True)
    if E is not None:
        Etail = np.asarray(E[-min(len(E), int(5.0 / args.dt)):])
        print(f"warmup {args.warmup} TU: E={float(E[-1]):.6f} "
              f"E-osc={float(Etail.max() - Etail.min()):.2e} "
              f"({time.time()-t0:.0f}s)", flush=True)

    # --- 2. period from wake-probe zero crossings -----------------------
    pi = probe_index(ctx, 3.0, 0.0)
    ncyc = int(round(args.measure / args.dt))
    advc = sys_.nonlinear_advance(ncyc, collect=True)
    st, (E, traj) = advc(sys_.case, st)
    vprobe = np.asarray(traj[:, 1, pi[0], pi[1], pi[2]])
    amp = 0.5 * (vprobe.max() - vprobe.min())
    if amp < 1e-4:
        raise SystemExit(f"probe oscillation amplitude {amp:.2e} — not on "
                         "the limit cycle; increase --warmup")
    vprobe = vprobe - vprobe.mean()   # crossings about the signal's own mean
    zc = ZeroCrossing()
    for i, v in enumerate(vprobe):
        zc.update((i + 1) * args.dt, float(v))
    periods = zc.periods
    if len(periods) < 2:
        raise SystemExit("no limit cycle detected — increase --warmup")
    T = float(np.mean(periods[-3:]))
    print(f"period T={T:.6f} (St={1.0/T:.4f}, {len(periods)} cycles, "
          f"spread {np.ptp(periods[-3:]):.2e})", flush=True)

    # --- 3. snap dt, settle, collect exactly one period -----------------
    norbit = int(round(T / args.dt))
    dt2 = T / norbit
    sys_.cfg = dataclasses.replace(sys_.cfg, dt=dt2)
    sys_._cache.clear()
    nsettle = 2 * norbit
    st, _ = sys_.nonlinear_advance(nsettle)(sys_.case, st)
    st0 = st
    st, (_, orbit) = sys_.nonlinear_advance(norbit, collect=True)(sys_.case,
                                                                  st0)
    drift = float(jnp.max(jnp.abs(st.u - st0.u)))
    print(f"orbit: norbit={norbit} dt={dt2:.6e} "
          f"|u(T)-u(0)|_max={drift:.3e}", flush=True)
    # persist the on-cycle state + period: the UPO Newton's initial guess
    # (examples/cylinder_upo.py) and a restartable Floquet snapshot
    from nekstab_tpu.io.checkpoint import save_field
    snap = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "_floq_cyl_re60.npz")
    save_field(snap, np.asarray(st0.u), T=T, dt=dt2, norbit=norbit)
    print(f"saved {snap}", flush=True)
    fo = compress_orbit(orbit, energy=args.energy)
    print(f"fourier orbit: {fo.coeffs.shape[0]} coeff rows "
          f"({fo.k_idx.size} harmonics, {compression_ratio(fo, norbit):.1f}x "
          f"compression)", flush=True)

    # --- 4. Floquet Krylov-Schur ----------------------------------------
    base = fo if args.fourier else orbit
    space = sys_.direct_space(base, norbit)
    acfg = ArnoldiConfig(k_dim=args.kdim, eigen_tol=args.tol,
                         schur_tgt=4, max_restarts=2, maxmodes=8)
    tks = time.time()
    ks = krylov_schur(space, add_noise(ctx, seed=7), acfg,
                      logger=lambda s: print(s, flush=True))
    mus = ks.evals[np.argsort(-np.abs(ks.evals))]
    print("Floquet multipliers (leading):", flush=True)
    for mu in mus[:6]:
        print(f"  |mu|={abs(mu):.6f}  mu={mu:.6f}", flush=True)
    lead = mus[0]
    # trivial multiplier: closest to +1
    i_triv = int(np.argmin(np.abs(mus - 1.0)))
    exps = log_transform(mus, tau=T)
    nontriv = [m for j, m in enumerate(mus) if j != i_triv]
    out = {
        "T": T, "St": 1.0 / T, "norbit": norbit,
        "mu_trivial": [float(mus[i_triv].real), float(mus[i_triv].imag)],
        "trivial_err": float(abs(mus[i_triv] - 1.0)),
        "mu_lead": [float(lead.real), float(lead.imag)],
        "lead_floquet_exp": [float(exps[0].real), float(exps[0].imag)],
        "mu_lead_nontrivial": ([float(nontriv[0].real),
                                float(nontriv[0].imag)] if nontriv else None),
        "fourier_modes": int(fo.k_idx.size),
        "orbit_drift": drift,
        "ks_wall_s": round(time.time() - tks, 1),
        "wall_s": round(time.time() - t0, 1),
        "backend": jax.default_backend(),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--dt", type=float, default=1e-2)
    ap.add_argument("--warmup", type=float, default=120.0)
    ap.add_argument("--measure", type=float, default=25.0)
    ap.add_argument("--kdim", type=int, default=48)
    ap.add_argument("--tol", type=float, default=1e-4)
    ap.add_argument("--energy", type=float, default=0.999)
    ap.add_argument("--fourier", action="store_true", default=True)
    ap.add_argument("--no-fourier", dest="fourier", action="store_false")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--smoke", action="store_true")
    main(ap.parse_args())
