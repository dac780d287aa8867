"""Lid-driven cavity: Newton base flow + direct & adjoint modes + wavemaker.

One of the driver benchmark configs (BASELINE.json: "Lid-driven cavity linear
stability (direct + adjoint modes, structural sensitivity)"). Demonstrates
the full uparam 2.0 -> 3.1 -> 3.2 -> 4.2 chain of the reference as plain
function calls, and checks direct/adjoint eigenvalue agreement (exact
discrete adjoint; the reference's gap is ~2e-5, BASELINE.md).

Run: JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python examples/cavity_stability.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np

from nekstab_tpu.algorithms import krylov_schur, log_transform
from nekstab_tpu.analysis import bf_sensitivity, wavemaker
from nekstab_tpu.config import ArnoldiConfig
from nekstab_tpu.io import write_run_info, write_spectre
from nekstab_tpu.models import cavity_system
from nekstab_tpu.utils import add_noise


def main(re=1000.0, n=6, nel=5, nsteps=100, k_dim=30, tol=1e-6,
         outdir="out/cavity", smoke=False):
    t0 = time.time()
    sys_ = cavity_system(n=n, nel=nel, re=re, dt=5e-3, host_direct=True)
    ctx = sys_.ctx
    print(f"mesh: {sys_.mesh.nelem} elements, {sys_.mesh.nglobal} dofs, Re={re}")

    res = sys_.newton_base_flow(sys_.case.u_bc + 0.0, nsteps=nsteps,
                                tol=1e-10, k_dim=40, maxiter=20)
    print(f"newton: converged={res.converged} iters={res.niter} "
          f"({time.time()-t0:.0f}s)")
    base = res.q
    tau = nsteps * sys_.cfg.dt

    acfg = ArnoldiConfig(k_dim=k_dim, eigen_tol=tol, schur_tgt=4,
                         max_restarts=12, maxmodes=8)
    modes = {}
    for op, space in [("d", sys_.direct_space(base, nsteps)),
                      ("a", sys_.adjoint_space(base, nsteps))]:
        ks = krylov_schur(space, add_noise(ctx, seed=3), acfg)
        lam = log_transform(ks.evals, tau)
        order = np.argsort(-lam.real)
        modes[op] = (lam[order], ks)
        write_spectre(outdir, op, ks.evals[order], lam[order],
                      ks.residuals[order], tol)
        print(f"[{op}] leading: " + ", ".join(
            f"{l.real:+.6e}{l.imag:+.6e}j" for l in lam[order][:4]))

    lam_d, ks_d = modes["d"]
    lam_a, ks_a = modes["a"]
    gap = abs(lam_d[0] - np.conj(lam_a[0]))
    gap = min(gap, abs(lam_d[0] - lam_a[0]))
    print(f"direct/adjoint leading-eigenvalue gap: {gap:.3e} "
          f"(reference ~2.4e-5)")

    # mode fields as Nek .f files (outpost_ks analog; readable by the
    # reference toolchain and standard viz readers)
    from nekstab_tpu.analysis import outpost_ks
    outpost_ks(sys_, ks_d, nsteps, which="d", directory=outdir,
               session="cav", maxmodes=4, tol=tol)
    outpost_ks(sys_, ks_a, nsteps, which="a", directory=outdir,
               session="cav", maxmodes=4, tol=tol)

    # structural sensitivity (wavemaker) from the leading direct/adjoint pair
    d_re, d_im = ks_d.reconstruct_mode(0)
    a_re, a_im = ks_a.reconstruct_mode(0)
    wm = wavemaker(ctx, d_re, d_im, a_re, a_im)
    sens = bf_sensitivity(ctx, d_re, d_im, a_re, a_im)
    print(f"wavemaker max={float(wm.max()):.4f}; "
          f"|total_re| max={float(abs(sens['total_re']).max()):.4f}")
    # wavemaker + base-flow-sensitivity fields (reference wm_/sr_/si_)
    from nekstab_tpu.io.nekfile import write_fld
    x, y = np.asarray(ctx.xcoord), np.asarray(ctx.ycoord)
    write_fld(os.path.join(outdir, "wm_cav0.f00001"), x=x, y=y,
              p=np.asarray(wm))
    write_fld(os.path.join(outdir, "sr_cav0.f00001"), x=x, y=y,
              u=np.asarray(sens["total_re"][0]),
              v=np.asarray(sens["total_re"][1]))
    write_run_info(outdir, "d", re=re, k_dim=k_dim, tau=tau, tol=tol,
                   nelem=sys_.mesh.nelem, nglobal=sys_.mesh.nglobal,
                   wall_s=round(time.time() - t0, 1))
    print(f"total wall: {time.time()-t0:.0f}s; outputs in {outdir}/")
    if smoke:
        # machinery-only pass: at smoke resolution the Ritz pairs are not
        # converged to 1e-6, so only exercise the chain end-to-end
        assert np.isfinite(gap)
        print("SMOKE PASS")
        return
    assert gap < 1e-6, "direct/adjoint agreement FAILED"
    print("PASS")


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    if args.smoke:
        main(re=300.0, n=4, nel=3, nsteps=10, k_dim=6, tol=1e-2,
             outdir="out/cavity_smoke", smoke=True)
    else:
        main()
