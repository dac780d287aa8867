"""Decompose the cylinder gold gap: operator vs base-flow (matrix mode).

Round-4 proved the +9.5e-4 sigma gap is dt-independent; round-5 matrix mode
proved it is also pressure-space-independent (pnpn 1.66503e-2 vs pnpn2
1.66081e-2 — both ~+9.4e-4 off gold). Remaining decomposition:

  sigma_gap = [our operator about THEIR base flow - gold]      (operator part)
            + [our operator: our BF vs their BF]               (base-flow part)

This tool computes the leading eigenvalue about the REFERENCE's shipped
converged base flow (BF_1cyl0.f00001 — written by their Newton in 64-bit,
core/newton_krylov.f:154-158) and, optionally, about our steady-Newton BF
re-converged with the reference's sponge-reference semantics (spng_vr = the
loaded field itself, core/utils.f:244: opcopy(spng_vr..., vx...), so THEIR
base flow satisfies nearly-unsponged steady NS, while our r1-r4 chain
sponged toward freestream).

  JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python tools/gap_diagnosis.py
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

FLD = "/root/reference/examples/cylinder/stability/direct/BF_1cyl0.f00001"
GOLD = complex(1.567373e-2, 7.565285e-1)
HERE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples")


def lead_eig(sys_, base, k=6, shift=GOLD):
    from nekstab_tpu.hostsolve.steady import leading_eigs
    lam, vecs, free = leading_eigs(sys_, base, shift=shift, k=k)
    return complex(lam[0].real, abs(lam[0].imag))


def main():
    import dataclasses
    from nekstab_tpu.hostsolve.steady import steady_newton
    from nekstab_tpu.io.checkpoint import load_field, save_field
    from nekstab_tpu.models.cylinder import cylinder_reference_system
    from nekstab_tpu.solver.stepper import CaseFields

    ap = argparse.ArgumentParser()
    ap.add_argument("--scheme", default="pnpn2")
    ap.add_argument("--skip-refsponge-newton", action="store_true")
    args = ap.parse_args()

    t0 = time.time()
    sys_, ref_base = cylinder_reference_system(
        FLD, dt=1e-2, host_direct=True, scheme=args.scheme)
    out = {"scheme": args.scheme, "gold": [GOLD.real, GOLD.imag]}

    # 1. our operator about THEIR base flow
    lam_ref = lead_eig(sys_, ref_base)
    out["about_ref_bf"] = {"sigma": lam_ref.real, "omega": lam_ref.imag,
                           "dsigma": lam_ref.real - GOLD.real,
                           "domega": lam_ref.imag - GOLD.imag}
    print(f"[about REF BF] sigma={lam_ref.real:+.8e} "
          f"omega={lam_ref.imag:.8e} dsigma={lam_ref.real-GOLD.real:+.2e} "
          f"domega={lam_ref.imag-GOLD.imag:+.2e} "
          f"({time.time()-t0:.0f}s)", flush=True)

    # 2. our steady Newton with the reference sponge semantics
    #    (spng_vr = loaded BF, so the sponge force vanishes at their BF)
    if not args.skip_refsponge_newton:
        sys_.case = dataclasses.replace(sys_.case, sponge_ref=ref_base)
        u, q, hist = steady_newton(sys_, ref_base, tol=1e-11, maxiter=10,
                                   logger=lambda s: print(s, flush=True))
        dbf = float(jnp.max(jnp.abs(u - ref_base)))
        print(f"refsponge newton |R|={hist[-1]:.2e}; "
              f"|ourBF - refBF|_max = {dbf:.3e}", flush=True)
        save_field(os.path.join(HERE,
                                f"_bf_refsponge_{args.scheme}.npz"),
                   np.asarray(u), resid=float(hist[-1]))
        lam_our = lead_eig(sys_, u)
        out["about_refsponge_bf"] = {
            "sigma": lam_our.real, "omega": lam_our.imag,
            "dsigma": lam_our.real - GOLD.real,
            "domega": lam_our.imag - GOLD.imag,
            "bf_max_diff_vs_ref": dbf, "newton_resid": hist[-1]}
        print(f"[about refsponge-Newton BF] sigma={lam_our.real:+.8e} "
              f"omega={lam_our.imag:.8e} "
              f"dsigma={lam_our.real-GOLD.real:+.2e} "
              f"domega={lam_our.imag-GOLD.imag:+.2e}", flush=True)

    out["wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(out), flush=True)
    with open(os.path.join(HERE, "..", "out", "gold",
                           f"gap_diagnosis_{args.scheme}.json"), "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
