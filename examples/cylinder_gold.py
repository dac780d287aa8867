"""Staged cylinder Re=50 gold-value pipeline with on-disk caching.

Stage 1 (`--stage base`): DNS warmup + Newton-Krylov -> steady base flow,
cached to disk (the reference's `BF_1cyl0.f00001` analog).
Stage 2 (`--stage eig`): direct Arnoldi/Krylov-Schur on exp(tau L) about the
cached base flow -> leading eigenvalue vs the reference gold values
(BASELINE.md: sigma = 1.567373e-2, omega = +/-7.565285e-1).

Run (CPU, fp64):
  JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python examples/cylinder_gold.py --stage base
  JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python examples/cylinder_gold.py --stage eig
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from nekstab_tpu.algorithms import krylov_schur, log_transform
from nekstab_tpu.config import ArnoldiConfig
from nekstab_tpu.io.checkpoint import load_field, save_field
from nekstab_tpu.models.cylinder import cylinder_system, freestream_ic
from nekstab_tpu.solver import initial_state
from nekstab_tpu.utils import add_noise

GOLD_SIGMA = 1.567373e-2
GOLD_OMEGA = 7.565285e-1


def build(preset: str):
    if preset == "smoke":       # 340 elements, n=5
        sys_ = cylinder_system(n=5, dt=2.5e-3, nq=6, n_ring=4, nx_left=4,
                               nx_right=10, ny_side=4, vtol=1e-9, ptol=1e-8,
                               dealias=True)
    elif preset == "mid":       # 618 elements, n=6
        sys_ = cylinder_system(n=6, dt=2.5e-3, vtol=1e-9, ptol=1e-8,
                               dealias=True)
    else:
        raise SystemExit(f"unknown preset {preset}")
    return sys_


def cache_path(preset):
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        f"_bf_cyl_{preset}.npz")


def stage_base(preset: str, warmup_tu: float, newton_tau: float):
    t0 = time.time()
    sys_ = build(preset)
    ctx = sys_.ctx
    print(f"mesh: {sys_.mesh.nelem} elements, n={ctx.n}, "
          f"{sys_.mesh.nglobal} dofs")
    nwarm = int(round(warmup_tu / sys_.cfg.dt))
    adv = sys_.nonlinear_advance(nwarm)
    st = initial_state(ctx, freestream_ic(sys_))
    st, energy = adv(sys_.case, st)
    print(f"warmup {warmup_tu} TU ({nwarm} steps) E={float(energy[-1]):.6f} "
          f"wall {time.time()-t0:.0f}s", flush=True)
    res = sys_.newton_base_flow(st.u, tau=newton_tau, tol=1e-9, k_dim=40,
                                maxiter=20)
    print(f"newton: converged={res.converged} iters={res.niter} "
          f"|F|={res.residuals[-1]:.3e} wall {time.time()-t0:.0f}s")
    save_field(cache_path(preset), np.asarray(res.q),
               preset=preset, newton_residual=float(res.residuals[-1]))
    print(f"saved {cache_path(preset)}")


def stage_eig(preset: str, k_dim: int, tau: float, tol: float):
    t0 = time.time()
    sys_ = build(preset)
    ctx = sys_.ctx
    base, _, meta = load_field(cache_path(preset), dtype=ctx.dtype)
    print(f"base flow loaded (newton residual {meta.get('newton_residual')})")
    nsteps = int(round(tau / sys_.cfg.dt))
    space = sys_.direct_space(base, nsteps)
    v0 = add_noise(ctx, seed=7)
    acfg = ArnoldiConfig(k_dim=k_dim, eigen_tol=tol, schur_tgt=2,
                         max_restarts=8, maxmodes=8)
    ks = krylov_schur(space, v0, acfg)
    lam = log_transform(ks.evals, tau=nsteps * sys_.cfg.dt)
    order = np.argsort(-lam.real)
    lam, rr = lam[order], ks.residuals[order]
    for lv, r in zip(lam[:6], rr[:6]):
        print(f"  sigma={lv.real:+.6e}  omega={lv.imag:+.6e}  res={r:.2e}")
    lead = lam[0]
    out = {"preset": preset, "k_dim": k_dim, "tau": tau,
           "sigma": float(lead.real), "omega": float(abs(lead.imag)),
           "gold_sigma": GOLD_SIGMA, "gold_omega": GOLD_OMEGA,
           "dsigma": float(lead.real - GOLD_SIGMA),
           "domega": float(abs(lead.imag) - GOLD_OMEGA),
           "wall_s": round(time.time() - t0, 1)}
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", choices=["base", "eig"], required=True)
    ap.add_argument("--preset", default="smoke")
    ap.add_argument("--warmup", type=float, default=20.0)
    ap.add_argument("--newton-tau", type=float, default=0.25)
    ap.add_argument("--kdim", type=int, default=64)
    ap.add_argument("--tau", type=float, default=0.5)
    ap.add_argument("--tol", type=float, default=1e-5)
    args = ap.parse_args()
    if args.stage == "base":
        stage_base(args.preset, args.warmup, args.newton_tau)
    else:
        stage_eig(args.preset, args.kdim, args.tau, args.tol)
