"""Backward-facing step transient growth ON THE REFERENCE MESH (config 4).

Ingests the reference's v003 bfs.re2 (1670 elements; boundary-id table from
bfs.usr setbc), Newton-converges the Re=500 base flow with no sponge (as the
reference's baseflow/bfs.par: mode 2, k_dim=128), then runs direct-adjoint
Arnoldi for the optimal transient growth exactly as
transient_growth/bfs.par: k_dim=64, tau = endTime = 1.0, perturbation-side
box sponge left 5 / right 10 (unit strength in the linearized equations).

Physics gold: the reference validates G(tau) against Barkley, Blackburn &
Sherwin 2008 (JFM 603) — shipped as barkley2008_fig5.ref; the closest
tabulated point to our default is G(1.723) = 15.536. Run with
`--tau 1.723` to compare directly.

  JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python examples/bfs_reference_tg.py --stage base
  JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python examples/bfs_reference_tg.py --stage tg [--tau 1.723]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

TPU = "--tpu" in sys.argv
if TPU:
    from nekstab_tpu.utils.compilecache import enable as _enable_cache
    _enable_cache()
jax.config.update("jax_enable_x64", True)   # f64 Ritz algebra even on TPU

import jax.numpy as jnp
import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
RE2 = "/root/reference/examples/back_fstep/transient_growth/bfs.re2"
BARKLEY = {1.723: 15.536, 3.853: 33.552, 5.901: 45.066}


def bf_path():
    return os.path.join(HERE, "_bf_bfs_ref_tpu.npz" if TPU
                        else "_bf_bfs_ref.npz")


def build(dt):
    import dataclasses
    from nekstab_tpu.models.bfs import bfs_reference_system
    # sponge_strength=0: the reference computes the BASE FLOW without a
    # sponge (baseflow/bfs.par has no userParam08-10); the unit-strength
    # perturbation sponge and the bm1s mask still come from sponge_fun
    if TPU:
        sys_ = bfs_reference_system(RE2, n=6, re=500.0, dt=dt,
                                    dtype=jnp.float32, vtol=1e-5, ptol=1e-5,
                                    sponge_strength=0.0)
        sys_.cfg = dataclasses.replace(sys_.cfg, vmaxit=100, pmaxit=400)
        return sys_
    return bfs_reference_system(RE2, n=6, re=500.0, dt=dt, host_direct=True,
                                sponge_strength=0.0)


def stage_base(dt, warmup):
    from nekstab_tpu.analysis import cfl
    from nekstab_tpu.io.checkpoint import save_field
    t0 = time.time()
    sys_ = build(dt)
    ctx = sys_.ctx
    print(f"mesh: {sys_.mesh.nelem} elems, {sys_.mesh.nglobal} dofs, "
          f"backend={jax.default_backend()}", flush=True)
    st = sys_.initial_state(sys_.case.u_bc + 0.0)
    nwarm = int(round(warmup / dt))
    st, E = sys_.nonlinear_advance(nwarm)(sys_.case, st)
    print(f"warmup {warmup} TU: E={float(E[-1]):.6f} "
          f"CFL={float(cfl(ctx, st.u, dt)):.3f} ({time.time()-t0:.0f}s)",
          flush=True)
    res = sys_.newton_base_flow(st.u, tau=1.0,
                                tol=3e-5 if TPU else 1e-10, k_dim=128,
                                maxiter=10,
                                logger=lambda s: print(s, flush=True))
    print(f"newton: converged={res.converged} |F|={res.residuals[-1]:.3e} "
          f"({time.time()-t0:.0f}s)")
    save_field(bf_path(), np.asarray(res.q),
               newton_residual=res.residuals[-1])
    print(f"saved {bf_path()}")


def stage_tg(dt, tau, k_dim, tol):
    from nekstab_tpu.algorithms import krylov_schur
    from nekstab_tpu.analysis import outpost_ks
    from nekstab_tpu.config import ArnoldiConfig
    from nekstab_tpu.io.checkpoint import load_field
    from nekstab_tpu.utils import add_noise
    t0 = time.time()
    sys_ = build(dt)
    ctx = sys_.ctx
    u, _, meta = load_field(bf_path(), dtype=ctx.dtype)
    base = jnp.asarray(u)
    print(f"base |F|={meta.get('newton_residual')} "
          f"backend={jax.default_backend()}", flush=True)
    nsteps = int(round(tau / dt))
    space = sys_.transient_growth_space(base, nsteps, dot64=TPU)
    acfg = ArnoldiConfig(k_dim=k_dim, eigen_tol=tol, schur_tgt=2,
                         max_restarts=4, maxmodes=4)
    ks = krylov_schur(space, add_noise(ctx, seed=5), acfg,
                      logger=lambda s: print(s, flush=True))
    order = np.argsort(-ks.evals.real)
    gains = ks.evals[order].real
    print("optimal energy gains G(tau):", gains[:4], flush=True)
    outdir = os.path.join(HERE, "_bfs_tg_out")
    res = outpost_ks(sys_, ks, nsteps, which="p", directory=outdir,
                     session="bfs", maxmodes=2, tol=tol,
                     response_space=sys_.direct_space(base, nsteps))
    gold = BARKLEY.get(round(tau, 3))
    out = {"tau": tau, "k_dim": k_dim, "G": float(gains[0]),
           "ritz_residual": float(ks.residuals[order][0]),
           "gold_barkley2008": gold,
           "dG_rel": None if gold is None else float(gains[0] / gold - 1.0),
           "backend": jax.default_backend(), "dt": dt,
           "wall_s": round(time.time() - t0, 1)}
    print(json.dumps(out))
    with open(os.path.join(HERE, "..", "out",
                           f"bfs_tg_tau{tau:g}.json"), "w") as fh:
        json.dump(out, fh)


def stage_smoke(dt=1e-2):
    """Machinery-only pass (examples/smoke.py): ingest the reference mesh,
    one TG matvec (forward then exact adjoint) on a tiny horizon."""
    import jax.numpy as jnp
    from nekstab_tpu.utils import add_noise
    t0 = time.time()
    sys_ = build(dt)
    w = sys_.transient_growth_space(sys_.case.u_bc + 0.0, 5).matvec(
        add_noise(sys_.ctx, seed=1))
    nrm = float(jnp.linalg.norm(w.ravel()))
    assert np.isfinite(nrm) and nrm > 0
    print(f"SMOKE PASS ({time.time()-t0:.0f}s, |L*Lv|={nrm:.3e})", flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", choices=["base", "tg", "smoke"],
                    required=True)
    ap.add_argument("--dt", type=float, default=5e-3)
    ap.add_argument("--tau", type=float, default=1.0)
    ap.add_argument("--kdim", type=int, default=64)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--warmup", type=float, default=60.0)
    ap.add_argument("--tpu", action="store_true")
    args = ap.parse_args()
    if args.stage == "base":
        stage_base(args.dt, args.warmup)
    elif args.stage == "smoke":
        stage_smoke()
    else:
        stage_tg(args.dt, args.tau, args.kdim, args.tol)
