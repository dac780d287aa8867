"""Thermosyphon (Boussinesq annular loop) at the REFERENCE configuration.

Reference: examples/thersyphon/baseflow/tsyphon.par — Ra = 500 (userParam06),
Pr = 5 (viscosity), Newton base flow (uparam 2) with k_dim = 100, sampling
period tau = endTime = 0.1. Pipeline: conduction-IC DNS warmup -> Newton
base flow of the coupled (u, v, T) state -> direct Krylov-Schur about it.

  JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python examples/thermosyphon_stability.py
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
    from nekstab_tpu.algorithms import krylov_schur, log_transform
    from nekstab_tpu.config import ArnoldiConfig
    from nekstab_tpu.io import write_run_info, write_spectre
    from nekstab_tpu.io.checkpoint import load_field, save_field
    from nekstab_tpu.models.thermosyphon import (conduction_ic,
                                                 thermosyphon_system)
    from nekstab_tpu.utils import add_noise

    t0 = time.time()
    sys_ = thermosyphon_system(n=6, ra=args.ra, pr=5.0, dt=args.dt)
    ctx = sys_.ctx
    print(f"mesh: {sys_.mesh.nelem} elems, {sys_.mesh.nglobal} dofs, "
          f"Ra={args.ra} Pr=5 (tsyphon.par userParam06/viscosity)",
          flush=True)

    bf_path = os.path.join(HERE, f"_bf_tsyphon_ra{args.ra:g}.npz")
    if os.path.exists(bf_path):
        u, _, meta = load_field(bf_path, dtype=ctx.dtype)
        base = jnp.asarray(u)
        print(f"base: cached |F|={meta.get('newton_residual')}", flush=True)
    else:
        nwarm = int(round(args.warmup / args.dt))
        st, E = sys_.nonlinear_advance(nwarm)(
            sys_.case, sys_.initial_state(conduction_ic(sys_)))
        print(f"warmup {args.warmup} TU: E={float(E[-1]):.6f} "
              f"({time.time()-t0:.0f}s)", flush=True)
        res = sys_.newton_base_flow(st.u, tau=args.tau, tol=1e-10,
                                    k_dim=100, maxiter=10,
                                    logger=lambda s: print(s, flush=True))
        base = res.q
        print(f"newton: converged={res.converged} "
              f"|F|={res.residuals[-1]:.3e} ({time.time()-t0:.0f}s)",
              flush=True)
        save_field(bf_path, np.asarray(base),
                   newton_residual=float(res.residuals[-1]))

    nsteps = int(round(args.tau / args.dt))
    space = sys_.direct_space(base, nsteps)
    acfg = ArnoldiConfig(k_dim=args.kdim, eigen_tol=args.tol, schur_tgt=4,
                         max_restarts=6, maxmodes=6)
    ks = krylov_schur(space, add_noise(ctx, seed=3), acfg,
                      logger=lambda s: print(s, flush=True))
    lam = log_transform(ks.evals, tau=nsteps * args.dt)
    order = np.argsort(-lam.real)
    lam, rr = lam[order], ks.residuals[order]
    outdir = os.path.join("out", "thermosyphon")
    write_spectre(outdir, "d", ks.evals[order], lam, rr, args.tol)
    write_run_info(outdir, "d", ra=args.ra, pr=5.0, k_dim=args.kdim,
                   tau=args.tau, nelem=sys_.mesh.nelem)
    for lv, r in zip(lam[:5], rr[:5]):
        print(f"  sigma={lv.real:+.6e}  omega={lv.imag:+.6e}  res={r:.2e}",
              flush=True)
    out = {"ra": args.ra, "pr": 5.0, "tau": args.tau, "k_dim": args.kdim,
           "sigma": float(lam[0].real), "omega": float(abs(lam[0].imag)),
           "ritz_residual": float(rr[0]),
           "wall_s": round(time.time() - t0, 1)}
    print(json.dumps(out), flush=True)
    with open(os.path.join("out", "thermosyphon", "result.json"), "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--ra", type=float, default=500.0)
    ap.add_argument("--dt", type=float, default=2e-4)
    ap.add_argument("--tau", type=float, default=0.1)
    ap.add_argument("--kdim", type=int, default=100)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--warmup", type=float, default=5.0)
    main(ap.parse_args())
