"""Benchmark: linearized-NS matvec throughput on the flagship cylinder case.

Prints ONE JSON line:
  {"metric": "lin_ns_matvecs_per_sec_chip", "value": N, "unit": "matvec/s",
   "vs_baseline": R, ...}

The metric follows BASELINE.json ("linearized-NS matvecs/sec/chip"): one
matvec = nsteps linearized NS time steps (tau = 1.0 at dt = 2.5e-3, i.e. 400
steps — the reference's sampling period on the cylinder,
examples/cylinder/stability/direct/1cyl.par endTime=1.0).

The reference publishes no throughput numbers (BASELINE.md); vs_baseline is
measured against this repo running the identical configuration on the host
CPU (2 cores, float32) — the portable stand-in for the reference's
laptop-class CPU envelope (SURVEY.md §4). CPU_BASELINE_MATVECS_PER_SEC was
measured with `python bench.py --cpu` on the round-1 container.

Run on TPU (default session env):   python bench.py
Re-measure the CPU baseline:        JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python bench.py --cpu
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# amortize the (remote) TPU compile across runs
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax
import jax.numpy as jnp

# measured on this container's 2-core CPU, same mesh/config/float32, see --cpu
# (steps/s is nsteps-invariant; ~2 lin-NS steps/s on the 618-element mesh)
CPU_BASELINE_STEPS_PER_SEC = 2.0


def build(nsteps: int, vtol=1e-4, ptol=1e-4):
    from nekstab_tpu.models.cylinder import cylinder_system, freestream_ic
    from nekstab_tpu.utils import add_noise

    # f32 operating point: CG stagnates near 1e-5 relative residual in f32,
    # so tighter tolerances just burn maxiter every solve
    sys_ = cylinder_system(n=6, dt=2.5e-3, dtype=jnp.float32,
                           vtol=vtol, ptol=ptol)
    import dataclasses
    sys_.cfg = dataclasses.replace(sys_.cfg, vmaxit=80, pmaxit=150)
    prop = sys_.linear_propagator(nsteps)
    base = freestream_ic(sys_)
    v = add_noise(sys_.ctx, seed=1)
    return sys_, prop, base, v


def main(cpu_mode: bool = False, nsteps: int = 400, nmatvec: int = 3):
    t_all = time.time()
    sys_, prop, base, v = build(nsteps)
    sponge = sys_.sponge_fun
    print(f"# mesh: {sys_.mesh.nelem} elements, n={sys_.ctx.n}, "
          f"{sys_.mesh.nglobal} dofs; backend={jax.default_backend()}",
          file=sys.stderr)

    t0 = time.time()
    u, _ = prop(base, sponge, v)
    jax.block_until_ready(u)
    compile_wall = time.time() - t0
    print(f"# first matvec (incl. compile): {compile_wall:.1f}s",
          file=sys.stderr)

    t0 = time.time()
    for _ in range(nmatvec):
        u, _ = prop(base, sponge, u)
    jax.block_until_ready(u)
    wall = time.time() - t0
    mv_per_sec = nmatvec / wall
    result = {
        "metric": "lin_ns_matvecs_per_sec_chip",
        "value": round(mv_per_sec, 5),
        "unit": f"matvec/s (1 matvec = {nsteps} lin-NS steps, "
                f"{sys_.mesh.nglobal} dofs, f32)",
        "vs_baseline": round(mv_per_sec * nsteps / CPU_BASELINE_STEPS_PER_SEC, 2),
        "steps_per_sec": round(mv_per_sec * nsteps, 2),
        "backend": jax.default_backend(),
        "compile_s": round(compile_wall, 1),
        "total_wall_s": round(time.time() - t_all, 1),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="measure the CPU baseline configuration")
    ap.add_argument("--nsteps", type=int, default=400)
    ap.add_argument("--nmatvec", type=int, default=3)
    args = ap.parse_args()
    main(cpu_mode=args.cpu, nsteps=args.nsteps, nmatvec=args.nmatvec)
