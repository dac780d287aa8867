"""tpjet: TDF-stabilized forced periodic orbit at the REFERENCE config.

Reference: examples/tpjet/baseflow/tdf/tpjet.par (uparam 1.4, Re=2005,
forced frequency St=0.60, axisymmetric) — the pulsed round jet whose
harmonically forced orbit is stabilized by time-delayed feedback
(core/fixedp.f:2-112, optimal gain -0.04432*2pi/T). Ingests tpjet.re2
(4800 elements, axis faces), runs the pulsed-inlet DNS with TDF at
T = 1/0.60 on the TPU (f32), and records the ||u(t)-u(t-T)|| history.

  python examples/tpjet_tdf.py                    # TPU f32
  JAX_PLATFORMS=cpu ... python examples/tpjet_tdf.py --smoke
"""

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

import jax

TPU = "--cpu" not in sys.argv
if TPU:
    from nekstab_tpu.utils.compilecache import enable as _enable_cache
    _enable_cache()
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

RE2 = "/root/reference/examples/tpjet/baseflow/tdf/tpjet.re2"


def main(args):
    import dataclasses
    from nekstab_tpu.algorithms.fixed_point import tdf
    from nekstab_tpu.analysis import cfl
    from nekstab_tpu.io.checkpoint import load_field, save_field
    from nekstab_tpu.models.jet import (jet_ic, jet_reference_system,
                                        pulse_wave)

    t0 = time.time()
    kw = dict(n=args.n, re=2005.0, dt=args.dt)
    if TPU:
        sys_ = jet_reference_system(RE2, dtype=jnp.float32, vtol=1e-5,
                                    ptol=1e-5, **kw)
        sys_.cfg = dataclasses.replace(sys_.cfg, vmaxit=100, pmaxit=400)
    else:
        sys_ = jet_reference_system(RE2, host_direct=True, **kw)
    ctx = sys_.ctx
    print(f"mesh: {sys_.mesh.nelem} elems, {sys_.mesh.nglobal} dofs, n={ctx.n}, "
          f"axisym={sys_.mesh.axisym}, backend={jax.default_backend()}",
          flush=True)
    st_target = 0.60                      # tpjet.par userParam05
    T = 1.0 / st_target

    if args.smoke:
        st = sys_.initial_state(jet_ic(sys_))
        res = tdf(ctx, sys_.cfg, sys_.case, sys_.mesh.has_outflow, st,
                  period=8 * args.dt, tol=1e30, max_periods=2,
                  bc_wave=pulse_wave(1.0 / (8 * args.dt)),
                  chunk_steps=4, logger=lambda s: print(s, flush=True))
        assert np.isfinite(res.residuals[-1])
        print(f"SMOKE PASS ({time.time()-t0:.0f}s)", flush=True)
        return

    # warmup: pulsed DNS (gain=0 TDF reuses the same chunked machinery —
    # the reference instead restarts from a converged Re=1900 BF file)
    warm_ckpt = os.path.join(HERE, "_tpjet_warm.npz")
    u0 = jet_ic(sys_)
    if os.path.exists(warm_ckpt):
        uw, _, _ = load_field(warm_ckpt, dtype=ctx.dtype)
        u0 = jnp.asarray(uw)
        print("warmup: cached", flush=True)
    elif args.warmup > 0:
        nper = max(1, int(round(args.warmup / T)))
        res0 = tdf(ctx, sys_.cfg, sys_.case, sys_.mesh.has_outflow,
                   sys_.initial_state(u0), period=T, gain=0.0, tol=0.0,
                   max_periods=nper, bc_wave=pulse_wave(st_target),
                   chunk_steps=25, logger=lambda s: print(s, flush=True))
        u0 = res0.state.u
        print(f"warmup {nper} periods: "
              f"CFL={float(cfl(ctx, u0, args.dt)):.2f} "
              f"({time.time()-t0:.0f}s)", flush=True)
        save_field(warm_ckpt, np.asarray(u0), dt=args.dt)

    res = tdf(ctx, sys_.cfg, sys_.case, sys_.mesh.has_outflow,
              sys_.initial_state(u0), period=T, tol=args.tol,
              max_periods=args.max_periods, bc_wave=pulse_wave(st_target),
              chunk_steps=25,
              residu_path=os.path.join(HERE, "..", "out",
                                       "residu_tpjet_tdf.dat"),
              logger=lambda s: print(s, flush=True))
    save_field(os.path.join(HERE, "_tpjet_tdf_orbit.npz"),
               np.asarray(res.state.u), T=T,
               residual=float(res.residuals[-1]))
    out = {"re": 2005.0, "st_forced": st_target, "T": T,
           "norbit": int(res.aux["norbit"]), "gain": float(res.aux["gain"]),
           "converged": bool(res.converged),
           "residual": float(res.residuals[-1]),
           "periods_run": int(len(res.residuals) // res.aux["norbit"]),
           "backend": jax.default_backend(),
           "wall_s": round(time.time() - t0, 1)}
    print(json.dumps(out), flush=True)
    with open(os.path.join(HERE, "..", "out", "tpjet_tdf.json"), "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=7)
    ap.add_argument("--dt", type=float, default=2.5e-3)
    ap.add_argument("--warmup", type=float, default=30.0)
    ap.add_argument("--tol", type=float, default=1e-4)
    ap.add_argument("--max-periods", type=int, default=30)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--smoke", action="store_true")
    main(ap.parse_args())
