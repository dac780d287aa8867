"""Cylinder at Re=50: base flow (DNS warmup + Newton) and leading global mode.

The flagship benchmark (BASELINE.md): the reference converges the leading
eigenvalue to sigma = 1.567373e-2, omega = +/-7.565285e-1 on a 1996-element
lx1=6 mesh with k_dim=200, tol 1e-6.

This script is resolution-parameterized: the default "smoke" settings run the
whole pipeline on 2 CPU cores in ~30 min on a coarse mesh (expect the
eigenvalue to land within a few percent); pass --full for reference-matching
resolution (TPU-sized run).

Run: JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python examples/cylinder_stability.py
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from nekstab_tpu.algorithms import krylov_schur, log_transform
from nekstab_tpu.config import ArnoldiConfig
from nekstab_tpu.models.cylinder import cylinder_system, freestream_ic
from nekstab_tpu.solver import initial_state
from nekstab_tpu.utils import add_noise

GOLD_SIGMA = 1.567373e-2
GOLD_OMEGA = 7.565285e-1


def main(full: bool = False, warmup_tu: float = 30.0, k_dim: int = 48,
         tau: float = 0.5, newton_tau: float = 0.25, tpu: bool = False,
         smoke: bool = False):
    t_start = time.time()
    if tpu:
        # f32 on the real chip: CG stagnates near 1e-5 relative residual
        sys_ = cylinder_system(n=6, dt=2.5e-3, dtype=jnp.float32,
                               vtol=1e-5, ptol=1e-5)
        import dataclasses
        sys_.cfg = dataclasses.replace(sys_.cfg, vmaxit=80, pmaxit=150)
        k_dim, tol, tau = 160, 3e-4, 1.0
    elif full:
        sys_ = cylinder_system(n=6, dt=2e-3, vtol=1e-9, ptol=1e-7)
        k_dim, tol = 120, 1e-6
    else:
        sys_ = cylinder_system(n=5, dt=2.5e-3, nq=6, n_ring=4, nx_left=4,
                               nx_right=10, ny_side=4, vtol=1e-9, ptol=1e-8)
        tol = 1e-5
    ctx = sys_.ctx
    print(f"mesh: {sys_.mesh.nelem} elements, n={ctx.n}, "
          f"{sys_.mesh.nglobal} dofs")

    # --- 1. DNS warmup toward the (weakly unstable) fixed point ----------
    nwarm = int(round(warmup_tu / sys_.cfg.dt))
    adv = sys_.nonlinear_advance(nwarm)
    st = initial_state(ctx, freestream_ic(sys_))
    st, energy = adv(sys_.case, st)
    print(f"warmup {warmup_tu} TU done ({nwarm} steps, "
          f"E={float(energy[-1]):.6f}, wall {time.time()-t_start:.0f}s)")

    # --- 2. Newton-Krylov to the steady base flow ------------------------
    newton_tol = 2e-5 if tpu else 1e-9
    if smoke:
        newton_tol, k_dim = 1e30, 4   # machinery-only (examples/smoke.py)
    res = sys_.newton_base_flow(st.u, tau=newton_tau, tol=newton_tol,
                                k_dim=6 if smoke else 40,
                                maxiter=1 if smoke else 20)
    print(f"newton: converged={res.converged} iters={res.niter} "
          f"|F|={res.residuals[-1]:.3e} (wall {time.time()-t_start:.0f}s)")
    base = res.q

    # --- 3. direct Arnoldi on exp(tau L) ---------------------------------
    nsteps = int(round(tau / sys_.cfg.dt))
    space = sys_.direct_space(base, nsteps)
    v0 = add_noise(ctx, seed=7)
    acfg = ArnoldiConfig(k_dim=k_dim, eigen_tol=1e30 if smoke else tol,
                         schur_tgt=2, max_restarts=1 if smoke else 8,
                         maxmodes=8)
    ks = krylov_schur(space, v0, acfg)
    lam = log_transform(ks.evals, tau=nsteps * sys_.cfg.dt)
    order = np.argsort(-lam.real)
    lam = lam[order]
    print(f"converged Ritz values (NS-plane):")
    for lv, rr in zip(lam[:6], ks.residuals[order][:6]):
        print(f"  sigma={lv.real:+.6e}  omega={lv.imag:+.6e}  res={rr:.2e}")
    lead = lam[np.argmax(lam.real)]
    print(f"leading mode: sigma={lead.real:.6e} omega={abs(lead.imag):.6e}")
    print(f"gold (reference): sigma={GOLD_SIGMA:.6e} omega={GOLD_OMEGA:.6e}")
    print(f"diff: dsigma={lead.real-GOLD_SIGMA:+.2e} "
          f"domega={abs(lead.imag)-GOLD_OMEGA:+.2e}")
    print(f"total wall: {time.time()-t_start:.0f}s")
    return lead


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true")
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--warmup", type=float, default=30.0)
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    if args.smoke:
        main(warmup_tu=0.2, tau=0.05, newton_tau=0.05, smoke=True)
    else:
        main(full=args.full, warmup_tu=args.warmup, tpu=args.tpu)
