"""TPU hot-path microbenchmarks: where does a time step's wall go?

Run on the reference cylinder mesh (f32):
    python tools/tpu_probe.py
Prints per-op latency (dssum, weak_laplacian, precond, dot), pressure CG
iteration counts at the f32 operating point, and per-iteration cost.
"""

import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

FLD = "/root/reference/examples/cylinder/stability/direct/BF_1cyl0.f00001"


def timeit(f, *a, n=30):
    r = f(*a)
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.time() - t0) / n


def main():
    from nekstab_tpu.models.cylinder import cylinder_reference_system
    from nekstab_tpu.ops.tensorprod import weak_laplacian
    from nekstab_tpu.ops.gather_scatter import dssum
    t0 = time.time()
    sys_, base = cylinder_reference_system(FLD, dt=1e-2, dtype=jnp.float32,
                                           vtol=1e-6, ptol=1e-6)
    ctx = sys_.ctx
    print(f"build: {time.time()-t0:.1f}s backend={jax.default_backend()}",
          flush=True)
    u = jnp.asarray(np.random.rand(*ctx.bm.shape), jnp.float32)
    u2 = jnp.stack([u, u])

    wl = jax.jit(lambda x: weak_laplacian(ctx, x))
    ds = jax.jit(lambda x: dssum(ctx, x))
    dot = jax.jit(lambda a, b: jnp.vdot(a, b))

    mask = ctx.mask_p
    amat = jax.jit(lambda y: mask * dssum(ctx, weak_laplacian(ctx, dssum(ctx, mask * y))))

    nn = ctx.n * ctx.n
    def precond_f(r):
        rl = (ctx.multinv * (mask * r)).reshape(-1, nn)
        ze = jnp.einsum("eab,eb->ea", ctx.p_schwarz, rl)
        z = (ze.reshape(ctx.bm.shape)) * ctx.multinv
        c = jnp.einsum("meij,eij->m", ctx.p_defl_z, r)
        z = z + jnp.einsum("m,meij->eij", ctx.p_defl_c @ c, ctx.p_defl_z)
        return mask * z
    precond = jax.jit(precond_f)

    for name, f, args in [("weak_laplacian", wl, (u,)),
                          ("weak_laplacian(2comp)", wl, (u2,)),
                          ("dssum", ds, (u,)),
                          ("dssum(2comp)", ds, (u2,)),
                          ("dot", dot, (u, u)),
                          ("amat", amat, (u,)),
                          ("precond", precond, (u,))]:
        print(f"{name}: {timeit(f, *args)*1e6:.0f} us", flush=True)

    # fixed-iteration-count CG cost (per-iteration latency)
    from nekstab_tpu.solver.cg import pcg
    for iters in (25, 50, 100):
        f = jax.jit(lambda b, it=iters: pcg(
            amat, b, dot=jnp.vdot, precond=precond_f, rtol=0.0, maxiter=it))
        t = timeit(f, u, n=5)
        print(f"pcg {iters} iters: {t*1e3:.1f} ms -> {t/iters*1e6:.0f} us/iter",
              flush=True)

    # actual iteration counts at the operating tolerances (host loop)
    minv = ctx.multinv
    proj = jax.jit(lambda y: y)  # outflow mesh: mask only
    b = jax.jit(lambda x: mask * dssum(ctx, x))(ctx.bm * u * 1e-3)
    b2 = float(dot(b, b))
    x = jnp.zeros_like(b); r = b; z = precond(r); p = z
    rz = float(dot(r, z))
    for k in range(400):
        ap = amat(p); pap = float(dot(p, ap)); al = rz / pap
        x = x + al * p; r = r - al * ap
        rr = float(dot(r, r))
        if rr < 1e-12 * b2:
            break
        z = precond(r); rzn = float(dot(r, z)); p = z + (rzn / rz) * p; rz = rzn
    print(f"pressure CG iters to rtol 1e-6 (random-ish rhs): {k+1}", flush=True)


if __name__ == "__main__":
    main()
