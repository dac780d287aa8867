"""Diagnose the f32 TPU propagator divergence seen in BENCH_r02 (VERDICT
Weak #2): propagate noise through the linearized operator at the bench
operating point (f32, vtol/ptol=1e-5, vmaxit=60/pmaxit=250) and print the
perturbation energy every 10 steps.  Runs on CPU so the bisect is fast.

Usage: python tools/f32_diverge_diag.py [--precond schwarz_vfem] [--vmaxit 60]
       [--pmaxit 250] [--f64] [--nsteps 100]
"""

import argparse
import os
import sys
import time

# VERDICT r3 Weak #6: the "CPU" bisect silently ran on TPU. The env var is
# not enough in this session environment — the axon relay's sitecustomize
# register() overrides platform selection even when JAX_PLATFORMS=cpu is
# exported before interpreter start. jax.config.update('jax_platforms')
# below is the authoritative switch (must run before backend init).

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

REF_FLD = "/root/reference/examples/cylinder/stability/direct/BF_1cyl0.f00001"
BF_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "examples", "_bf_refmesh_dt0.01.npz")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--precond", default="oschwarz_vfem")
    ap.add_argument("--vmaxit", type=int, default=60)
    ap.add_argument("--pmaxit", type=int, default=250)
    ap.add_argument("--f64", action="store_true")
    ap.add_argument("--nsteps", type=int, default=100)
    ap.add_argument("--chunk", type=int, default=10)
    ap.add_argument("--no-bfcache", action="store_true")
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--precision", default=None,
                    choices=["default", "float32", "highest"])
    args = ap.parse_args()

    if args.precision and args.precision != "default":
        jax.config.update("jax_default_matmul_precision", args.precision)
    if args.f64:
        jax.config.update("jax_enable_x64", True)
    dtype = jnp.float64 if args.f64 else jnp.float32

    import dataclasses
    from nekstab_tpu.models.cylinder import cylinder_reference_system
    from nekstab_tpu.utils import add_noise

    sys_, base = cylinder_reference_system(
        REF_FLD, dt=1e-2, dtype=dtype, vtol=1e-5, ptol=1e-5,
        pressure_precond=args.precond)
    sys_.cfg = dataclasses.replace(sys_.cfg, vmaxit=args.vmaxit,
                                   pmaxit=args.pmaxit)
    if not args.no_bfcache and os.path.exists(BF_CACHE):
        from nekstab_tpu.io.checkpoint import load_field
        u, _, _ = load_field(BF_CACHE, dtype=sys_.ctx.dtype)
        base = jnp.asarray(u)
        print("# base flow: Newton cache", file=sys.stderr)
    else:
        print("# base flow: reference BF_ field", file=sys.stderr)

    ctx = sys_.ctx
    prop = sys_.linear_propagator(args.chunk)
    sponge = sys_.sponge_fun
    v = add_noise(ctx, seed=1)
    e0 = float(sys_.dot(v, v))
    print(f"# config: precond={args.precond} vmaxit={args.vmaxit} "
          f"pmaxit={args.pmaxit} dtype={dtype.__name__} "
          f"backend={jax.default_backend()} "
          f"matmul_prec={jax.config.jax_default_matmul_precision}",
          file=sys.stderr)
    t0 = time.time()
    for i in range(args.nsteps // args.chunk):
        v, _ = prop(base, sponge, v)
        e = float(sys_.dot(v, v))
        print(f"step {(i + 1) * args.chunk:4d}  E/E0 = {e / e0:.6e}   "
              f"({time.time() - t0:.1f}s)", flush=True)
        if not np.isfinite(e) or e / e0 > 1e12:
            print("DIVERGED", flush=True)
            return 1
    print("OK", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
