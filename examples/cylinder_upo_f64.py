"""Multi-iteration f64 Newton convergence of a cylinder shedding orbit.

The r4 Re=60 UPO record verified an attracting DNS orbit at a loosened
tolerance in one residual evaluation (out/upo_r4.json: niter=1 — VERDICT r4
Missing #6/Weak #5). This script exercises the bordered period-augmented
Newton solver for real (reference: core/newton_krylov.f:79-88 +
core/matvec.f:381-475):

  1. DNS to the limit cycle on a small generated cylinder mesh (CPU f64,
     sparse-direct solves — matvec noise ~1e-13, so Newton can be driven to
     the f64 floor instead of the f32 propagation noise);
  2. period from wake-probe zero crossings;
  3. PERTURB the on-cycle snapshot (--perturb, default 1e-3 mass-norm) and
     the period estimate (+0.5%), then Newton with the phase condition to
     tol 1e-9: a genuine multi-iteration convergence history with real
     bordered-GMRES solves (seed_satisfied must come out False).

The generated coarse mesh is over-diffusive (stable at Re=60,
examples/cylinder_floquet.py build note), so this runs at Re=100 where even
the coarse discretization sheds; the converged period is cross-checked
against St(Re) = 0.208 - 4.16/Re (tools/x_auto_cyl.py:119) loosely (the
coarse mesh shifts St by a few %).

  JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python examples/cylinder_upo_f64.py
"""

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np


def main(args):
    from nekstab_tpu.algorithms import newton_upo
    from nekstab_tpu.analysis import ZeroCrossing, cfl
    from nekstab_tpu.io.checkpoint import load_field, save_field
    from nekstab_tpu.models.cylinder import cylinder_system, freestream_ic
    from nekstab_tpu.solver import initial_state
    from nekstab_tpu.utils import add_noise

    t0 = time.time()
    sys_ = cylinder_system(n=6, re=args.re, dt=args.dt, host_direct=True,
                           nq=4, n_ring=2, nx_left=2, nx_right=6, ny_side=2,
                           xmax=25.0)
    ctx = sys_.ctx
    print(f"mesh: {sys_.mesh.nelem} elems, {sys_.mesh.nglobal} dofs, "
          f"Re={args.re}, dt={args.dt}, backend={jax.default_backend()}",
          flush=True)

    # --- 1. DNS to the limit cycle (checkpointed) ------------------------
    warm_ckpt = os.path.join(HERE, f"_upo64_warm_re{args.re:g}.npz")
    if os.path.exists(warm_ckpt):
        uw, _, _ = load_field(warm_ckpt, dtype=ctx.dtype)
        st = initial_state(ctx, jnp.asarray(uw))
        print("warmup: cached", flush=True)
    else:
        x, y = np.asarray(ctx.xcoord), np.asarray(ctx.ycoord)
        kick = 0.4 * np.exp(-((x - 1.5) ** 2 + y ** 2))
        u0 = freestream_ic(sys_).at[1].add(
            jnp.asarray(kick * np.asarray(ctx.mask_vel[1]), ctx.dtype))
        st = initial_state(ctx, u0)
        nwarm = int(round(args.warmup / args.dt))
        st, E = sys_.nonlinear_advance(nwarm)(sys_.case, st)
        print(f"warmup {args.warmup} TU: E={float(E[-1]):.6f} "
              f"CFL={float(cfl(ctx, st.u, args.dt)):.2f} "
              f"({time.time()-t0:.0f}s)", flush=True)
        save_field(warm_ckpt, np.asarray(st.u), dt=args.dt)

    # --- 2. period from wake-probe zero crossings ------------------------
    x, y = np.asarray(ctx.xcoord), np.asarray(ctx.ycoord)
    pi = np.unravel_index(np.argmin((x - 3.0) ** 2 + y ** 2), x.shape)
    nmeas = int(round(args.measure / args.dt))
    st, (E, traj) = sys_.nonlinear_advance(nmeas, collect=True)(sys_.case, st)
    vprobe = np.asarray(traj[:, 1, pi[0], pi[1], pi[2]])
    amp = 0.5 * (vprobe.max() - vprobe.min())
    print(f"probe amplitude {amp:.3e}", flush=True)
    if amp < 1e-4:
        raise SystemExit("not on a limit cycle - raise --re or --warmup")
    vprobe = vprobe - vprobe.mean()
    zc = ZeroCrossing()
    for i, v in enumerate(vprobe):
        zc.update((i + 1) * args.dt, float(v))
    if len(zc.periods) < 2:
        raise SystemExit("no periods detected - increase --measure")
    T = float(np.mean(zc.periods[-3:]))
    print(f"period T={T:.6f} St={1.0/T:.4f} "
          f"(heuristic {0.208 - 4.16 / args.re:.4f})", flush=True)

    # --- 3. perturbed Newton to the f64 floor ----------------------------
    norbit = int(round(T / args.dt))
    dn = add_noise(ctx, seed=11)
    dn = dn / jnp.sqrt(sys_.dot_full(dn, dn))
    useed = st.u + args.perturb * dn
    Tseed = T * 1.005
    print(f"seed: |perturbation|_B={args.perturb:g}, T offset +0.5% "
          f"-> T0={Tseed:.6f}, norbit={norbit}", flush=True)
    res = newton_upo(sys_, useed, Tseed, norbit, tol=args.tol,
                     maxiter=args.maxiter, k_dim=args.kdim,
                     collect_orbit=False,
                     logger=lambda s: print(s, flush=True))
    st_heur = 0.208 - 4.16 / args.re
    out = {
        "re": args.re,
        "converged": res.converged,
        "seed_satisfied": res.seed_satisfied,
        "gmres_solves": res.gmres_solves,
        "niter": res.niter,
        "residual_history": [float(r) for r in res.residuals],
        "period": res.period,
        "dT_vs_dns": res.period - T,
        "St": 1.0 / res.period,
        "St_heuristic": st_heur,
        "perturb": args.perturb,
        "tol": args.tol,
        "backend": jax.default_backend(),
        "wall_s": round(time.time() - t0, 1),
    }
    save_field(os.path.join(HERE, f"_upo64_re{args.re:g}.npz"),
               np.asarray(res.u), T=res.period,
               residual=res.residuals[-1])
    print(json.dumps(out), flush=True)
    with open(os.path.join(HERE, "..", "out", "upo_f64.json"), "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--re", type=float, default=100.0)
    ap.add_argument("--dt", type=float, default=1e-2)
    ap.add_argument("--warmup", type=float, default=150.0)
    ap.add_argument("--measure", type=float, default=40.0)
    ap.add_argument("--perturb", type=float, default=1e-3)
    ap.add_argument("--tol", type=float, default=1e-9)
    ap.add_argument("--maxiter", type=int, default=10)
    ap.add_argument("--kdim", type=int, default=45)
    main(ap.parse_args())
