"""BFS Re=500 base flow via matrix-mode steady Newton (CPU f64, minutes).

The TPU time-stepper Newton on the ingested bfs.re2 costs ~26 s per
Jacobian matvec (200 linearized steps each) — hours to tol. The assembled
steady Jacobian solves it directly: CPU DNS warmup (checkpointed) for a
seed, then sparse-direct Newton to the f64 floor. Output lands under the
name the TPU transient-growth stage reads (_bf_bfs_ref_tpu.npz).

  JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python tools/bfs_matrix_base.py
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

RE2 = "/root/reference/examples/back_fstep/transient_growth/bfs.re2"
HERE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dt", type=float, default=5e-3)
    ap.add_argument("--warmup", type=float, default=40.0)
    ap.add_argument("--tol", type=float, default=1e-11)
    args = ap.parse_args()
    from nekstab_tpu.analysis import cfl
    from nekstab_tpu.hostsolve.steady import steady_newton
    from nekstab_tpu.io.checkpoint import load_field, save_field
    from nekstab_tpu.models.bfs import bfs_reference_system

    t0 = time.time()
    # pnpn2 + host_direct: the assembled-Jacobian requirements; sponge off
    # for the base flow (reference baseflow/bfs.par has no sponge params)
    sys_ = bfs_reference_system(RE2, n=6, re=500.0, dt=args.dt,
                                host_direct=True, scheme="pnpn2",
                                sponge_strength=0.0)
    ctx = sys_.ctx
    print(f"mesh: {sys_.mesh.nelem} elems, {sys_.mesh.nglobal} dofs",
          flush=True)

    warm_ckpt = os.path.join(HERE, "_bfs_warm_cpu.npz")
    if os.path.exists(warm_ckpt):
        uw, _, _ = load_field(warm_ckpt, dtype=ctx.dtype)
        u0 = jnp.asarray(uw)
        print("warmup: cached", flush=True)
    else:
        st = sys_.initial_state(sys_.case.u_bc + 0.0)
        nw = int(round(args.warmup / args.dt))
        st, E = sys_.nonlinear_advance(nw)(sys_.case, st)
        u0 = st.u
        print(f"warmup {args.warmup} TU: E={float(E[-1]):.5f} "
              f"CFL={float(cfl(ctx, u0, args.dt)):.2f} "
              f"({time.time()-t0:.0f}s)", flush=True)
        save_field(warm_ckpt, np.asarray(u0), dt=args.dt)

    # Reynolds continuation: the Re=500 recirculation sits outside the
    # pure-Newton basin of a 40-TU warmup seed (damped Newton oscillated at
    # |R|~3e-3; PTC/SER crawled at 5%/iter). Each intermediate Re converges
    # in a few damped-Newton steps and warm-seeds the next.
    import dataclasses
    u = u0
    for re_lvl in (150.0, 300.0, 500.0):
        sys_.cfg = dataclasses.replace(sys_.cfg, re=re_lvl)
        sys_.ctx.hsolve._hcache.clear()
        print(f"--- continuation Re={re_lvl} ---", flush=True)
        u, q, hist = steady_newton(sys_, u, tol=args.tol, maxiter=14,
                                   logger=lambda s: print(s, flush=True))
    print(json.dumps({"resid": hist[-1], "iters": len(hist),
                      "wall_s": round(time.time() - t0, 1)}), flush=True)
    if hist[-1] > 1e-8:
        raise SystemExit(f"NOT saving: unconverged |R|={hist[-1]:.3e}")
    out = os.path.join(HERE, "_bf_bfs_ref_tpu.npz")
    save_field(out, np.asarray(u), newton_residual=float(hist[-1]),
               source="steady_newton_matrix_pnpn2")
    # also the CPU-stage name for the f64 TG path
    save_field(os.path.join(HERE, "_bf_bfs_ref.npz"), np.asarray(u),
               newton_residual=float(hist[-1]),
               source="steady_newton_matrix_pnpn2")
    print(f"saved {out}", flush=True)


if __name__ == "__main__":
    main()
