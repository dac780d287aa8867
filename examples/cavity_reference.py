"""Lid-driven cavity AT THE REFERENCE CONFIGURATION (VERDICT r2 Missing #6).

Ingests /root/reference/examples/lid_driven/cav.re2 (100 elements, sharp
unit lid), aspect ratio 1.5 (cav.usr usrdat2 rescale_x with uparam10,
cav.par:9), Re = 3600 (cav.par viscosity = -3600), sampling period
tau = endTime = 0.5 (cav.par:4), k_dim = 90 (cav.par userParam07).

Pipeline: DNS warmup -> Newton base flow (uparam 2) -> direct + adjoint
Krylov-Schur (uparam 3.1/3.2) -> wavemaker + base-flow sensitivity
(uparam 4.2/4.3), with Spectre_* / mode-field outputs in out/cavity_ref/.

Run: JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python examples/cavity_reference.py
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

RE2 = "/root/reference/examples/lid_driven/cav.re2"
HERE = os.path.dirname(os.path.abspath(__file__))
BF = os.path.join(HERE, "_bf_cav_ref.npz")


def main(args):
    from nekstab_tpu.algorithms import krylov_schur, log_transform
    from nekstab_tpu.analysis import bf_sensitivity, outpost_ks, wavemaker
    from nekstab_tpu.config import ArnoldiConfig
    from nekstab_tpu.io import write_run_info, write_spectre
    from nekstab_tpu.io.checkpoint import load_field, save_field
    from nekstab_tpu.models.cavity import cavity_reference_system
    from nekstab_tpu.utils import add_noise

    t0 = time.time()
    sys_ = cavity_reference_system(RE2, re=args.re, dt=args.dt,
                                   host_direct=True)
    ctx = sys_.ctx
    print(f"mesh: {sys_.mesh.nelem} elems, {sys_.mesh.nglobal} dofs, "
          f"Re={args.re}, aspect 1.5, backend={jax.default_backend()}",
          flush=True)

    if args.smoke:
        from nekstab_tpu.utils import add_noise
        w, _ = sys_.linear_propagator(5)(sys_.case.u_bc + 0.0,
                                         sys_.sponge_fun,
                                         add_noise(ctx, seed=1))
        nrm = float(jnp.linalg.norm(w.ravel()))
        assert np.isfinite(nrm) and nrm > 0
        print(f"SMOKE PASS ({time.time()-t0:.0f}s)", flush=True)
        return

    # --- base flow (uparam 2.0) ------------------------------------------
    if os.path.exists(BF) and not args.refresh_bf:
        u, _, meta = load_field(BF, dtype=ctx.dtype)
        base = jnp.asarray(u)
        print(f"base flow: cached |F|={meta.get('newton_residual')}",
              flush=True)
    else:
        nwarm = int(round(args.warmup / args.dt))
        st, E = sys_.nonlinear_advance(nwarm)(
            sys_.case, sys_.initial_state(sys_.case.u_bc + 0.0))
        print(f"warmup {args.warmup} TU: E={float(E[-1]):.6f} "
              f"({time.time()-t0:.0f}s)", flush=True)
        res = sys_.newton_base_flow(st.u, tau=args.newton_tau, tol=1e-10,
                                    k_dim=60, maxiter=12,
                                    logger=lambda s: print(s, flush=True))
        print(f"newton: converged={res.converged} "
              f"|F|={res.residuals[-1]:.3e} ({time.time()-t0:.0f}s)",
              flush=True)
        base = res.q
        save_field(BF, np.asarray(base),
                   newton_residual=float(res.residuals[-1]))

    # --- direct + adjoint eigenproblems (uparam 3.1 / 3.2) ---------------
    nsteps = int(round(args.tau / args.dt))
    tau = nsteps * args.dt
    acfg = ArnoldiConfig(k_dim=args.kdim, eigen_tol=args.tol, schur_tgt=4,
                         max_restarts=8, maxmodes=8)
    outdir = os.path.join("out", "cavity_ref")
    modes = {}
    for op, space in [("d", sys_.direct_space(base, nsteps)),
                      ("a", sys_.adjoint_space(base, nsteps))]:
        ks = krylov_schur(space, add_noise(ctx, seed=3), acfg,
                          logger=lambda s: print(s, flush=True))
        lam = log_transform(ks.evals, tau)
        order = np.argsort(-lam.real)
        modes[op] = (lam[order], ks)
        write_spectre(outdir, op, ks.evals[order], lam[order],
                      ks.residuals[order], args.tol)
        outpost_ks(sys_, ks, nsteps, which=op, directory=outdir,
                   session="cav", maxmodes=4, tol=args.tol)
        print(f"[{op}] leading: " + ", ".join(
            f"{l.real:+.6e}{l.imag:+.6e}j" for l in lam[order][:4]),
            flush=True)

    lam_d, ks_d = modes["d"]
    lam_a, ks_a = modes["a"]
    gap = min(abs(lam_d[0] - np.conj(lam_a[0])), abs(lam_d[0] - lam_a[0]))

    # --- wavemaker + BF sensitivity (uparam 4.2 / 4.3) --------------------
    d_re, d_im = ks_d.reconstruct_mode(0)
    a_re, a_im = ks_a.reconstruct_mode(0)
    wm = wavemaker(ctx, d_re, d_im, a_re, a_im)
    sens = bf_sensitivity(ctx, d_re, d_im, a_re, a_im)
    from nekstab_tpu.io.nekfile import write_fld
    x, y = np.asarray(ctx.xcoord), np.asarray(ctx.ycoord)
    write_fld(os.path.join(outdir, "wm_cav0.f00001"), x=x, y=y,
              p=np.asarray(wm))
    write_fld(os.path.join(outdir, "sr_cav0.f00001"), x=x, y=y,
              u=np.asarray(sens["total_re"][0]),
              v=np.asarray(sens["total_re"][1]))
    write_run_info(outdir, "d", re=args.re, k_dim=args.kdim, tau=tau,
                   tol=args.tol, nelem=sys_.mesh.nelem,
                   nglobal=sys_.mesh.nglobal,
                   wall_s=round(time.time() - t0, 1))
    out = {"re": args.re, "aspect": 1.5, "k_dim": args.kdim, "tau": tau,
           "sigma_d": float(lam_d[0].real), "omega_d": float(lam_d[0].imag),
           "sigma_a": float(lam_a[0].real),
           "direct_adjoint_gap": float(gap),
           "wavemaker_max": float(wm.max()),
           "wall_s": round(time.time() - t0, 1)}
    print(json.dumps(out))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--re", type=float, default=3600.0)
    ap.add_argument("--dt", type=float, default=2e-3)
    ap.add_argument("--tau", type=float, default=0.5)   # cav.par endTime
    ap.add_argument("--kdim", type=int, default=90)     # cav.par userParam07
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--warmup", type=float, default=50.0)
    ap.add_argument("--newton-tau", type=float, default=0.5)
    ap.add_argument("--refresh-bf", action="store_true")
    ap.add_argument("--smoke", action="store_true")
    main(ap.parse_args())
