"""Resume the pnpn2 Newton base-flow chain from its checkpointed iterate.

Round-4 diagnosis (out/gold/pnpn2_dt1em2.log): GMRES(110) restart cycles on
the exp(tauL)-I Jacobian improve only 1.04-1.26x per cycle — the classic
restarted-GMRES plateau on an operator with a cluster of near-zero
eigenvalues (slow wake modes: exp(tau*lambda)-1 ~ tau*lambda). The round-3
log (out/gold/pnpn2_base.log) shows a k=130 cycle achieving 70x at a similar
residual, so the plateau breaks just past k~110-130. Fix: one large
non-restarted Krylov space (k=250 default) instead of restart cycles —
restarting discards exactly the small-eigenvalue information the solve needs.

Cost note: frozen-base Jacobian (the reference's newton_linearized_map,
core/matvec.f:381-475) is half the cost of the jvp exact-trajectory Jacobian
and differs from it by O(|F|) — validated here at the iterate before use.

Run (CPU f64, the canonical gold chain):
  JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= \
    python tools/pnpn2_newton_resume.py >> out/gold/pnpn2_resume.log 2>&1
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

FLD = "/root/reference/examples/cylinder/stability/direct/BF_1cyl0.f00001"
HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT = os.path.join(HERE, "examples/_bf_refmesh_pnpn2_dt0.01.npz.nwt.npz")
OUT = os.path.join(HERE, "examples/_bf_refmesh_pnpn2_dt0.01.npz")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kdim", type=int, default=250)
    ap.add_argument("--dt", type=float, default=1e-2)
    ap.add_argument("--tau", type=float, default=0.5)
    ap.add_argument("--tol", type=float, default=1e-9)
    ap.add_argument("--maxiter", type=int, default=6)
    ap.add_argument("--exact-jac", action="store_true")
    args = ap.parse_args()

    from nekstab_tpu.models.cylinder import cylinder_reference_system
    from nekstab_tpu.io.checkpoint import load_field, save_field

    t0 = time.time()
    sys_, ref_base = cylinder_reference_system(
        FLD, dt=args.dt, host_direct=True, scheme="pnpn2")
    q0 = ref_base
    if os.path.exists(CKPT):
        u, _, meta = load_field(CKPT, dtype=sys_.ctx.dtype)
        q0 = jnp.asarray(u)
        print(f"resume from {CKPT}: iter={meta.get('it')} "
              f"|F|={meta.get('rnorm')}", flush=True)
    print(f"mesh {sys_.mesh.nelem} elems, dt={args.dt}, tau={args.tau}, "
          f"kdim={args.kdim}, backend={jax.default_backend()}", flush=True)

    nsteps = int(round(args.tau / args.dt))

    # --- frozen-base vs exact-trajectory Jacobian consistency at the iterate
    if not args.exact_jac:
        from nekstab_tpu.utils import add_noise
        v = add_noise(sys_.ctx, seed=3)
        v = v / jnp.sqrt(sys_.dot_full(v, v))
        prop = sys_.linear_propagator(nsteps)
        frozen = prop(q0, sys_.sponge_fun, v)[0] - v
        adv = sys_.nonlinear_advance(nsteps)

        def phi(q):
            st, _ = adv(sys_.case, sys_.initial_state(q))
            return st.u

        eps = 1e-5
        fd = (phi(q0 + eps * v) - phi(q0 - eps * v)) / (2 * eps) - v
        d = fd - frozen
        rel = float(jnp.sqrt(sys_.dot_full(d, d))
                    / jnp.sqrt(sys_.dot_full(fd, fd)))
        print(f"frozen-vs-FD Jacobian rel diff at iterate: {rel:.3e} "
              f"(expect O(|F|)~2e-3)", flush=True)
        if not (rel < 3e-2):
            print("frozen Jacobian inconsistent - falling back to exact jvp",
                  flush=True)
            args.exact_jac = True

    def ckpt(it, qq, rn):
        save_field(CKPT, np.asarray(qq), it=100 + it, rnorm=float(rn),
                   dt=args.dt)
        print(f"[ckpt] saved iter={it} |F|={rn:.6e} "
              f"({time.time() - t0:.0f}s)", flush=True)

    res = sys_.newton_base_flow(
        q0, tau=args.tau, tol=args.tol, k_dim=args.kdim,
        maxiter=args.maxiter, exact_jacobian=args.exact_jac,
        callback=ckpt, logger=lambda s: print(s, flush=True))
    print(f"newton: converged={res.converged} iters={res.niter} "
          f"|F|={res.residuals[-1]:.3e} wall {time.time() - t0:.0f}s",
          flush=True)
    save_field(OUT, np.asarray(res.q), dt=args.dt,
               newton_residual=float(res.residuals[-1]))
    print(f"saved {OUT}", flush=True)


if __name__ == "__main__":
    main()
