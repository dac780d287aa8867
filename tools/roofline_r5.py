"""Per-phase timing of the TPU linearized step (VERDICT r4 #7).

Decomposes the ~64 ms/step (r4) into its constituents on the reference
cylinder mesh (f32, overlap-Schwarz + vertex coarse): dssum, weak
Laplacian, preconditioner apply, full pressure solve (+ iteration count),
Helmholtz solve, one linearized step, and a 25-step chunk. Prints a JSON
budget line; pairs with docs/ROOFLINE.md.

  python tools/roofline_r5.py          # TPU (exclusive — do not co-run)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nekstab_tpu.utils.compilecache import enable as _enable

_enable()

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

FLD = "/root/reference/examples/cylinder/stability/direct/BF_1cyl0.f00001"


def timeit(fn, *args, n=20, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n, out


def main():
    import dataclasses
    from nekstab_tpu.models.cylinder import cylinder_reference_system
    from nekstab_tpu.ops.gather_scatter import dssum
    from nekstab_tpu.ops.tensorprod import weak_laplacian
    from nekstab_tpu.utils import add_noise

    t0 = time.time()
    out = {"backend": jax.default_backend()}

    def build(ptol, vtol):
        s, b = cylinder_reference_system(
            FLD, dt=1e-2, dtype=jnp.float32, vtol=vtol, ptol=ptol,
            pressure_precond="oschwarz_vfem")
        s.cfg = dataclasses.replace(s.cfg, vmaxit=100, pmaxit=400)
        return s, b

    sys_, base = build(1e-5, 1e-5)
    ctx = sys_.ctx
    out["mesh"] = int(sys_.mesh.nelem)
    v = add_noise(ctx, seed=1)
    p = jnp.asarray(np.random.default_rng(0).standard_normal(
        np.asarray(ctx.bm).shape), ctx.dtype)

    f_ds = jax.jit(lambda u: dssum(ctx, u))
    out["dssum_ms"] = timeit(f_ds, p)[0] * 1e3
    f_wl = jax.jit(lambda u: weak_laplacian(ctx, u))
    out["weak_laplacian_ms"] = timeit(f_wl, v)[0] * 1e3

    # one linearized step vs a 25-step chunk: launch/composition overhead
    prop1 = sys_.linear_propagator(1)
    dt1, _ = timeit(lambda vv: prop1(base, sys_.sponge_fun, vv)[0], v, n=10)
    out["lin_step_ms"] = dt1 * 1e3
    prop25 = sys_.linear_propagator(25)
    dt25, _ = timeit(lambda vv: prop25(base, sys_.sponge_fun, vv)[0], v,
                     n=4)
    out["chunk25_ms"] = dt25 * 1e3
    out["chunk25_ms_per_step"] = dt25 * 1e3 / 25
    out["launch_overhead_ms_per_step"] = (dt1 - dt25 / 25) * 1e3

    # pressure-solve share: relax ptol a decade and remeasure the chunk
    sys2, base2 = build(1e-3, 1e-5)
    prop25b = sys2.linear_propagator(25)
    dt25b, _ = timeit(lambda vv: prop25b(base2, sys2.sponge_fun, vv)[0], v,
                      n=4)
    out["chunk25_ms_ptol1e3"] = dt25b * 1e3
    # and vtol a decade (Helmholtz share)
    sys3, base3 = build(1e-5, 1e-3)
    prop25c = sys3.linear_propagator(25)
    dt25c, _ = timeit(lambda vv: prop25c(base3, sys3.sponge_fun, vv)[0], v,
                      n=4)
    out["chunk25_ms_vtol1e3"] = dt25c * 1e3
    out["wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(out), flush=True)
    with open("out/roofline_r5.json", "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
