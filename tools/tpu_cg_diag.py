"""Pressure-CG convergence history on the reference mesh (TPU f32) under the
preconditioner modes; residual at checkpoints. Usage:
    python tools/tpu_cg_diag.py [mode ...]   (default: the main variants)
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

FLD = "/root/reference/examples/cylinder/stability/direct/BF_1cyl0.f00001"


def run(ctx, b):
    from nekstab_tpu.ops.tensorprod import weak_laplacian
    from nekstab_tpu.ops.gather_scatter import dssum
    from nekstab_tpu.solver.stepper import make_pressure_precond_gs2
    mask = ctx.mask_p
    amat = jax.jit(lambda y: mask * dssum(
        ctx, weak_laplacian(ctx, dssum(ctx, mask * y))))
    precond = jax.jit(make_pressure_precond_gs2(ctx))
    dot = jax.jit(lambda a, c: jnp.vdot(a, c))

    b2 = float(dot(b, b))
    x = jnp.zeros_like(b); r = b; z = precond(r); p = z
    rz = float(dot(r, z))
    hist = {}
    t0 = time.time()
    for k in range(1, 201):
        ap = amat(p); pap = float(dot(p, ap)); al = rz / pap
        x = x + al * p; r = r - al * ap
        z = precond(r); rzn = float(dot(r, z)); p = z + (rzn / rz) * p
        rz = rzn
        if k in (10, 25, 50, 100, 200):
            hist[k] = (float(dot(r, r)) / b2) ** 0.5
    hist["s/iter"] = (time.time() - t0) / 200
    return hist


def main(modes):
    from nekstab_tpu.models.cylinder import cylinder_reference_system
    from nekstab_tpu.ops.gather_scatter import dssum
    rng = np.random.default_rng(0)
    for mode in modes:
        sys_, base = cylinder_reference_system(
            FLD, dt=1e-2, dtype=jnp.float32, vtol=1e-5, ptol=1e-5,
            pressure_precond=mode)
        ctx = sys_.ctx
        u = jnp.asarray(rng.standard_normal(ctx.bm.shape), jnp.float32)
        b = jax.jit(lambda x: ctx.mask_p * dssum(ctx, x))(ctx.bm * u)
        h = run(ctx, b)
        s = " ".join(f"{k}:{v:.1e}" if isinstance(v, float) and k != "s/iter"
                     else "" for k, v in h.items())
        print(f"{mode}: {s} [{h['s/iter']*1e3:.2f} ms/iter]", flush=True)


if __name__ == "__main__":
    modes = sys.argv[1:] or ["oschwarz_vfem", "vfem", "schwarz_vfem_defl"]
    main(modes)
