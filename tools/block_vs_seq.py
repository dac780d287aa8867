"""Bisect the block-propagator divergence (VERDICT r4 Next #1).

BENCH_r03: the *sequential* f32 propagator at the bench operating point
decays monotonically, but the block (vmap-batched) Krylov-Schur stage shows
lead |mu| ~ 7.2e8 — the same signature as the r2 bf16 blow-up. This tool
applies the block propagator and the sequential propagator to the SAME
noise vectors and prints per-vector norm ratios |exp(tau L) v| / |v|:
vmap must not change the math, so any systematic growth difference isolates
the bug to the batched lowering.

Usage (on TPU, the failing config):
    python tools/block_vs_seq.py --nsteps 20
Options: --width N (block width), --no-seq (skip sequential),
         --cpu (re-exec on CPU), --f64, --nsteps N
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from nekstab_tpu.utils.compilecache import enable as enable_cache

enable_cache()

import jax

jax.config.update("jax_enable_x64", True)
if "--cpu" in sys.argv:
    # JAX_PLATFORMS env is overridden by the axon relay's sitecustomize
    # register(); only the explicit config update forces CPU here
    jax.config.update("jax_platforms", "cpu")
if "--mm-high" in sys.argv:
    jax.config.update("jax_default_matmul_precision", "high")
if "--mm-highest" in sys.argv:
    jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import numpy as np

REF_FLD = "/root/reference/examples/cylinder/stability/direct/BF_1cyl0.f00001"
BF_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                        "examples", "_bf_refmesh_dt0.01.npz")


def build(dtype, precond):
    import dataclasses
    from nekstab_tpu.models.cylinder import cylinder_reference_system
    sys_, base = cylinder_reference_system(
        REF_FLD, dt=1e-2, dtype=dtype, vtol=1e-5, ptol=1e-5,
        pressure_precond=precond)
    sys_.cfg = dataclasses.replace(sys_.cfg, vmaxit=60, pmaxit=250)
    if os.path.exists(BF_CACHE):
        from nekstab_tpu.io.checkpoint import load_field
        u, _, _ = load_field(BF_CACHE, dtype=sys_.ctx.dtype)
        base = jnp.asarray(u)
    return sys_, base


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nsteps", type=int, default=20)
    ap.add_argument("--width", type=int, default=8)
    ap.add_argument("--no-seq", action="store_true")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--f64", action="store_true")
    ap.add_argument("--precond", default="oschwarz_vfem")
    ap.add_argument("--mm-high", action="store_true")
    ap.add_argument("--mm-highest", action="store_true")
    args = ap.parse_args()

    from nekstab_tpu.utils import add_noise
    dtype = jnp.float64 if args.f64 else jnp.float32
    sys_, base = build(dtype, args.precond)
    ctx = sys_.ctx
    print(f"# backend={jax.default_backend()} dtype={ctx.dtype} "
          f"nsteps={args.nsteps} width={args.width}", flush=True)

    V = jnp.stack([add_noise(ctx, seed=100 + s) for s in range(args.width)])
    nrm_in = np.asarray(jnp.linalg.norm(V.reshape(args.width, -1), axis=1))

    propb = sys_.linear_propagator_block(args.nsteps)
    t0 = time.time()
    W = propb(base, sys_.sponge_fun, V)
    jax.block_until_ready(W)
    print(f"# block compile+run: {time.time() - t0:.1f}s", flush=True)
    nrm_blk = np.asarray(jnp.linalg.norm(W.reshape(args.width, -1), axis=1))
    for i in range(args.width):
        print(f"block  seed={100 + i}  |W|/|V| = {nrm_blk[i] / nrm_in[i]:.6e}")

    if not args.no_seq:
        prop = sys_.linear_propagator(args.nsteps)
        t0 = time.time()
        w0, _ = prop(base, sys_.sponge_fun, V[0])
        jax.block_until_ready(w0)
        print(f"# seq compile+run: {time.time() - t0:.1f}s", flush=True)
        for i in range(args.width):
            wi, _ = prop(base, sys_.sponge_fun, V[i])
            nrm = float(jnp.linalg.norm(wi.ravel()))
            diff = float(jnp.max(jnp.abs(wi - W[i])))
            scale = float(jnp.max(jnp.abs(wi)))
            print(f"seq    seed={100 + i}  |w|/|V| = {nrm / nrm_in[i]:.6e}  "
                  f"max|w-W|/max|w| = {diff / max(scale, 1e-30):.3e}")


if __name__ == "__main__":
    main()
