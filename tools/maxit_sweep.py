"""Locate the real CG iteration counts at the bench operating point by
sweeping (pmaxit, vmaxit): wall time stops improving once maxiter exceeds
the tolerance-exit iteration count, and results agree when the tolerance
(not the cap) is binding. Usage:
    python tools/maxit_sweep.py [nsteps]
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nekstab_tpu.utils.compilecache import enable as enable_cache
enable_cache()

import jax
import jax.numpy as jnp
import numpy as np

FLD = "/root/reference/examples/cylinder/stability/direct/BF_1cyl0.f00001"


def main(nsteps=20):
    import dataclasses
    from nekstab_tpu.models.cylinder import cylinder_reference_system
    from nekstab_tpu.utils import add_noise

    t0 = time.time()
    sys_, base = cylinder_reference_system(
        FLD, dt=1e-2, dtype=jnp.float32, vtol=1e-5, ptol=1e-5,
        pressure_precond=os.environ.get("SWEEP_PP", "oschwarz_vfem"))
    bf = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "_bf_refmesh_dt0.01.npz")
    if os.path.exists(bf):
        from nekstab_tpu.io.checkpoint import load_field
        u, _, _ = load_field(bf, dtype=sys_.ctx.dtype)
        base = jnp.asarray(u)
    print(f"# build {time.time()-t0:.0f}s backend={jax.default_backend()}",
          flush=True)
    v = add_noise(sys_.ctx, seed=1)

    ref = None
    import json as _json
    grid = _json.loads(os.environ.get(
        "SWEEP_GRID",
        "[[250,60],[120,40],[60,20],[30,12],[15,8]]"))
    for pmaxit, vmaxit in grid:
        sys_.cfg = dataclasses.replace(sys_.cfg, pmaxit=pmaxit,
                                       vmaxit=vmaxit)
        sys_._cache.clear()
        prop = sys_.linear_propagator(nsteps)
        t0 = time.time()
        w, _ = prop(base, sys_.sponge_fun, v)
        jax.block_until_ready(w)
        tc = time.time() - t0
        t0 = time.time()
        w2, _ = prop(base, sys_.sponge_fun, v)
        jax.block_until_ready(w2)
        tr = time.time() - t0
        nrm = float(jnp.linalg.norm(w2.ravel()))
        if ref is None:
            ref = np.asarray(w2, np.float64)
            dev = 0.0
        else:
            dev = float(np.linalg.norm(np.asarray(w2, np.float64) - ref)
                        / np.linalg.norm(ref))
        print(f"pmaxit={pmaxit:4d} vmaxit={vmaxit:3d}  "
              f"compile+run={tc:6.1f}s  run={tr:6.2f}s  "
              f"steps/s={nsteps/tr:6.1f}  |w|={nrm:.6e}  "
              f"rel-dev-vs-first={dev:.3e}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 20)
