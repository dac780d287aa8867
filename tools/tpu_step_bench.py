"""Time real nonlinear + linearized stepping on the reference mesh (TPU f32)
under the pressure-preconditioner variants. Usage:
    python tools/tpu_step_bench.py [schwarz_defl|jacobi_defl|schwarz|none]
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

FLD = "/root/reference/examples/cylinder/stability/direct/BF_1cyl0.f00001"


def main(mode):
    from nekstab_tpu.models.cylinder import cylinder_reference_system
    from nekstab_tpu.solver import initial_state
    from nekstab_tpu.utils import add_noise
    pp = False if mode == "none" else mode
    t0 = time.time()
    sys_, base = cylinder_reference_system(
        FLD, dt=1e-2, dtype=jnp.float32, vtol=1e-5, ptol=1e-5,
        pressure_precond=pp)
    import dataclasses
    sys_.cfg = dataclasses.replace(sys_.cfg, vmaxit=100, pmaxit=400)
    ctx = sys_.ctx
    print(f"mode={mode} build {time.time()-t0:.0f}s", flush=True)

    adv = sys_.nonlinear_advance(10)
    st = initial_state(ctx, base)
    t0 = time.time(); st, _ = adv(sys_.case, st); jax.block_until_ready(st.u)
    print(f"  nl 10-step compile+run: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    for _ in range(3):
        st, _ = adv(sys_.case, st)
    jax.block_until_ready(st.u)
    print(f"  nl steps/s: {30/(time.time()-t0):.1f}", flush=True)

    prop = sys_.linear_propagator(20)
    v = add_noise(ctx, seed=1)
    t0 = time.time(); w, _ = prop(base, sys_.sponge_fun, v)
    jax.block_until_ready(w)
    print(f"  lin 20-step compile+run: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time(); w, _ = prop(base, sys_.sponge_fun, w)
    jax.block_until_ready(w)
    print(f"  lin steps/s: {20/(time.time()-t0):.1f}", flush=True)

    propb = sys_.linear_propagator_block(20)
    V = jnp.stack([add_noise(ctx, seed=s) for s in range(8)])
    t0 = time.time(); W = propb(base, sys_.sponge_fun, V)
    jax.block_until_ready(W)
    print(f"  lin-block8 20-step compile+run: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time(); W = propb(base, sys_.sponge_fun, W)
    jax.block_until_ready(W)
    dtb = time.time() - t0
    print(f"  lin-block8 steps/s: {20/dtb:.1f} block-steps/s "
          f"({160/dtb:.1f} vec-steps/s)", flush=True)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "jacobi_defl")
