"""Automated cylinder Re-sweep: DNS -> SFD -> Newton -> stability per Re.

The analog of the reference's sweep bot (tools/x_auto_cyl.py): for each
Reynolds number it chains the full pipeline with the Strouhal heuristic
St(Re) = 0.208 - 4.16/Re (x_auto_cyl.py:119) driving the SFD filter
parameters and the Arnoldi sampling period tau = (1/St)/8, and cross-checks
the computed leading eigenfrequency against the heuristic at the end.
Where the reference edits .par/SIZE files and shells out to mpiexec, this
drives the in-process FlowSystem API directly; every stage writes an
artifact and is skipped on re-run if the artifact exists (the reference's
restart-loop tools, tools/arnoldi_loop/autorun.py, are subsumed by this
plus the checkpointing inside each stage).

  # CPU f64, generated mesh (fast sanity sweep):
  JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= \
    python tools/sweep_cyl.py --re 50 60 --outdir out/sweep
  # TPU f32:
  python tools/sweep_cyl.py --tpu --re 50 60 80 100 --outdir out/sweep_tpu
"""

from __future__ import annotations

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
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np


def st_heuristic(re: float) -> float:
    """Strouhal-number fit used by the reference sweep bot
    (tools/x_auto_cyl.py:119)."""
    return 0.208 - 4.16 / re


def build(re: float, dt: float, n: int, small: bool = False):
    import dataclasses
    from nekstab_tpu.models.cylinder import cylinder_system
    kw = dict(nq=4, n_ring=2, nx_left=2, nx_right=6, ny_side=2,
              xmax=25.0) if small else {}
    if TPU:
        sys_ = cylinder_system(n=n, re=re, dt=dt, dtype=jnp.float32,
                               vtol=1e-5, ptol=1e-5, **kw)
        sys_.cfg = dataclasses.replace(sys_.cfg, vmaxit=100, pmaxit=400)
        return sys_
    return cylinder_system(n=n, re=re, dt=dt, host_direct=True, **kw)


def run_re(re: float, outdir: str, *, n: int, dt: float, k_dim: int,
           tol: float, dns_tu: float, adjoint: bool, small: bool = False):
    from nekstab_tpu.algorithms import krylov_schur, log_transform
    from nekstab_tpu.algorithms.fixed_point import sfd
    from nekstab_tpu.analysis import cfl, outpost_ks
    from nekstab_tpu.config import ArnoldiConfig
    from nekstab_tpu.io.checkpoint import load_field, save_field
    from nekstab_tpu.utils import add_noise

    d = os.path.join(outdir, f"re{re:g}")
    os.makedirs(d, exist_ok=True)
    log = lambda s: print(f"[re={re:g}] {s}", flush=True)
    st_est = st_heuristic(re)
    tau = round((1.0 / st_est) / 8.0, 2)
    sys_ = build(re, dt, n, small)
    ctx = sys_.ctx
    log(f"mesh {sys_.mesh.nelem} elems, {sys_.mesh.nglobal} dofs, "
        f"backend={jax.default_backend()}; St_est={st_est:.4f} tau={tau}")
    summary_path = os.path.join(d, "summary.json")
    summary = {}
    if os.path.exists(summary_path):
        summary = json.load(open(summary_path))

    def save_summary():
        with open(summary_path, "w") as fh:
            json.dump(summary, fh, indent=1)

    # ---- stage 1: DNS warmup (develops the wake / shedding) --------------
    dns_path = os.path.join(d, "dns.npz")
    if not os.path.exists(dns_path):
        t0 = time.time()
        nsteps = int(round(dns_tu / dt))
        st = sys_.initial_state(sys_.case.sponge_ref + 0.0)
        st, E = sys_.nonlinear_advance(nsteps)(sys_.case, st)
        save_field(dns_path, np.asarray(st.u), t=dns_tu)
        log(f"dns: {dns_tu} TU, E={float(E[-1]):.5f} "
            f"CFL={float(cfl(ctx, st.u, dt)):.2f} "
            f"({time.time()-t0:.0f}s)")
        summary["dns"] = {"tu": dns_tu, "E": float(E[-1]),
                          "wall_s": round(time.time() - t0, 1)}
        save_summary()

    # ---- stage 2: SFD (St-heuristic filter params) -----------------------
    sfd_path = os.path.join(d, "bf_sfd.npz")
    if not os.path.exists(sfd_path):
        t0 = time.time()
        u, _, _ = load_field(dns_path, dtype=ctx.dtype)
        res = sfd(ctx, sys_.cfg, sys_.case, sys_.mesh.has_outflow,
                  sys_.initial_state(jnp.asarray(u)),
                  st_freq=st_est, sigma=0.05, casacuberta=True,
                  tol=3e-5 if TPU else 1e-8, chunk_steps=200,
                  max_chunks=400,
                  residu_path=os.path.join(d, "residu_sfd.dat"),
                  logger=log)
        save_field(sfd_path, np.asarray(res.state.u),
                   converged=bool(res.converged))
        log(f"sfd: converged={res.converged} "
            f"residu={res.residuals[-1]:.3e} ({time.time()-t0:.0f}s)")
        summary["sfd"] = {"converged": bool(res.converged),
                          "residual": float(res.residuals[-1]),
                          "wall_s": round(time.time() - t0, 1)}
        save_summary()

    # ---- stage 3: Newton polish -----------------------------------------
    bf_path = os.path.join(d, "bf_newton.npz")
    if not os.path.exists(bf_path):
        t0 = time.time()
        u, _, _ = load_field(sfd_path, dtype=ctx.dtype)
        res = sys_.newton_base_flow(jnp.asarray(u), tau=tau,
                                    tol=3e-5 if TPU else 1e-10,
                                    k_dim=min(k_dim, 96), maxiter=8,
                                    logger=log)
        save_field(bf_path, np.asarray(res.q),
                   newton_residual=float(res.residuals[-1]))
        log(f"newton: converged={res.converged} "
            f"|F|={res.residuals[-1]:.3e} ({time.time()-t0:.0f}s)")
        summary["newton"] = {"converged": bool(res.converged),
                             "residual": float(res.residuals[-1]),
                             "wall_s": round(time.time() - t0, 1)}
        save_summary()

    # ---- stage 4: direct (and optionally adjoint) stability --------------
    for which in (["direct", "adjoint"] if adjoint else ["direct"]):
        if summary.get(which):
            continue
        t0 = time.time()
        u, _, _ = load_field(bf_path, dtype=ctx.dtype)
        base = jnp.asarray(u)
        nsteps = int(round(tau / dt))
        space = (sys_.direct_space(base, nsteps, dot64=TPU)
                 if which == "direct"
                 else sys_.adjoint_space(base, nsteps, dot64=TPU))
        acfg = ArnoldiConfig(k_dim=k_dim, eigen_tol=tol, schur_tgt=4,
                             max_restarts=8, maxmodes=8)
        ks = krylov_schur(space, add_noise(ctx, seed=7), acfg, logger=log)
        lam = log_transform(ks.evals, tau=nsteps * dt)
        order = np.argsort(-lam.real)
        lam, rr = lam[order], ks.residuals[order]
        outpost_ks(sys_, ks, nsteps, which=which[0], directory=d,
                   session=f"cyl{re:g}", maxmodes=4, tol=tol, logger=log)
        st_num = abs(lam[0].imag) / (2 * np.pi)
        log(f"{which}: sigma={lam[0].real:+.6e} omega={abs(lam[0].imag):.6e}"
            f" St={st_num:.4f} (heuristic {st_est:.4f}, "
            f"d={st_num - st_est:+.4f}) res={rr[0]:.1e} "
            f"({time.time()-t0:.0f}s)")
        summary[which] = {
            "sigma": float(lam[0].real), "omega": float(abs(lam[0].imag)),
            "St": float(st_num), "St_heuristic": float(st_est),
            "ritz_residual": float(rr[0]), "k_dim": k_dim, "tau": tau,
            "wall_s": round(time.time() - t0, 1)}
        save_summary()
    return summary


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--re", type=float, nargs="+", default=[50.0])
    ap.add_argument("--outdir", default="out/sweep")
    ap.add_argument("--n", type=int, default=6)
    ap.add_argument("--dt", type=float, default=5e-3)
    ap.add_argument("--kdim", type=int, default=128)
    ap.add_argument("--tol", type=float, default=None)
    ap.add_argument("--dns-tu", type=float, default=30.0)
    ap.add_argument("--adjoint", action="store_true")
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()
    tol = args.tol if args.tol is not None else (3e-4 if TPU else 1e-6)
    os.makedirs(args.outdir, exist_ok=True)
    rows = []
    for re in args.re:
        s = run_re(re, args.outdir, n=args.n, dt=args.dt, k_dim=args.kdim,
                   tol=tol, dns_tu=args.dns_tu, adjoint=args.adjoint,
                   small=args.small)
        rows.append((re, s.get("direct", {})))
    print("\nRe     sigma        omega       St      St_heur")
    for re, r in rows:
        if r:
            print(f"{re:<6g} {r['sigma']:+.5e} {r['omega']:.5e} "
                  f"{r['St']:.4f}  {r['St_heuristic']:.4f}")


if __name__ == "__main__":
    main()
