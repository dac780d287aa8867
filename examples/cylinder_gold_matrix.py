"""Cylinder Re=50 gold values via the assembled PN/PN-2 Jacobian (matrix
mode): direct steady Newton + shift-invert eigensolves on the ingested
reference mesh — the f64 endgame of the gold chain (VERDICT r4 #1).

Gold (Spectre_NSd_conv.dat:1-2 / Spectre_NSa_conv.dat:1-2):
  direct:  sigma = 1.567373e-2, omega = 0.7565285
  adjoint: sigma = 1.564950e-2, omega = 0.7565346

Stages:
  1. steady Newton (exact sparse-direct Jacobian solves; immune to the
     exp(tauL)-I GMRES clustering that stalled the r4 time-stepper chain,
     out/gold/pnpn2_dt1em2.log) from the best available seed;
  2. ARPACK shift-invert about the gold value: direct eigenvalues and, via
     the conjugate-transposed pencil, the adjoint eigenvalues/modes;
  3. cross-check: propagate the matrix eigenvector through the LINEARIZED
     PN/PN-2 TIME STEPPER and Rayleigh-Ritz the 2-space — measures the
     temporal bias and ties the matrix answer to the flagship
     time-stepper operator (they must agree to O(dt^3)).

  JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= \
    python examples/cylinder_gold_matrix.py
"""

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

FLD = "/root/reference/examples/cylinder/stability/direct/BF_1cyl0.f00001"
GOLD_D = complex(1.567373e-2, 7.565285e-1)
GOLD_A = complex(1.564950e-2, 7.565346e-1)
BF_OUT = os.path.join(HERE, "_bf_refmesh_pnpn2_matrix.npz")


def main(args):
    from nekstab_tpu.hostsolve.steady import leading_eigs, steady_newton
    from nekstab_tpu.io.checkpoint import load_field, save_field
    from nekstab_tpu.models.cylinder import cylinder_reference_system
    from nekstab_tpu.ops.gather_scatter import scatter

    t0 = time.time()
    sys_, ref_base = cylinder_reference_system(
        FLD, dt=args.dt, host_direct=True, scheme="pnpn2")
    ctx = sys_.ctx
    G = sys_.mesh.nglobal
    print(f"mesh: {sys_.mesh.nelem} elems, {G} pressure-grid dofs, "
          f"dt={args.dt} (matrix mode: dt only enters the cross-check)",
          flush=True)

    # ---- 1. steady Newton -----------------------------------------------
    if os.path.exists(BF_OUT) and not args.refresh:
        u, _, meta = load_field(BF_OUT, dtype=ctx.dtype)
        u = jnp.asarray(u)
        q = jnp.asarray(np.load(BF_OUT)["q"], ctx.dtype)
        print(f"base: cached (|R|={meta.get('resid')})", flush=True)
    else:
        seed = ref_base
        for cand in (os.path.join(HERE, "_bf_refmesh_pnpn2_dt0.01.npz.nwt.npz"),
                     os.path.join(HERE, "_bf_refmesh_dt0.01.npz")):
            if os.path.exists(cand):
                uu, _, m = load_field(cand, dtype=ctx.dtype)
                seed = jnp.asarray(uu)
                print(f"newton seed: {cand} ({m})", flush=True)
                break
        u, q, hist = steady_newton(sys_, seed, tol=args.newton_tol,
                                   maxiter=10,
                                   logger=lambda s: print(s, flush=True))
        print(f"steady newton: |R|={hist[-1]:.3e} "
              f"({time.time() - t0:.0f}s)", flush=True)
        save_field(BF_OUT, np.asarray(u), resid=float(hist[-1]))
        dat = dict(np.load(BF_OUT))      # append q to the same npz
        dat["q"] = np.asarray(q)
        np.savez(BF_OUT, **dat)

    # ---- 2. eigensolves --------------------------------------------------
    from nekstab_tpu.hostsolve.steady import steady_matrices, _saddle
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    L, M, D, free = steady_matrices(sys_, u)
    Lf = L[free][:, free]
    Df = D[:, free]
    nf = free.size
    P = Df.shape[0]
    bmf = M.diagonal()[free]
    Msys = sp.diags(np.concatenate([bmf, np.zeros(P)])).tocsc() \
        .astype(np.complex128)
    out = {"newton_resid": None, "backend": "cpu-matrix",
           "nelem": sys_.mesh.nelem, "dt_crosscheck": args.dt}
    results = {}
    for which, gold in (("direct", GOLD_D), ("adjoint", GOLD_A)):
        Asys = _saddle(Lf, Df).astype(np.complex128)
        if which == "adjoint":
            # adjoint = left eigenproblem of the real pencil: A^T y = lam M y
            # (eigenvalues identical BY CONSTRUCTION — the discrete adjoint;
            # the reference's 2.4e-5 direct/adjoint gold gap is its separate
            # adjoint discretization, BASELINE.md) — vectors = adjoint modes
            Asys = Asys.T.tocsc()
        te = time.time()
        lam, vecs = spla.eigs(Asys, k=args.k, M=Msys,
                              sigma=complex(args.sigma_re, args.sigma_im),
                              which="LM")
        order = np.argsort(-lam.real)
        lam, vecs = lam[order], vecs[:, order]
        lead = complex(lam[0].real, abs(lam[0].imag))
        print(f"[{which}] eigs ({time.time() - te:.0f}s):", flush=True)
        for l in lam[:5]:
            print(f"    sigma={l.real:+.8e} omega={l.imag:+.8e}", flush=True)
        results[which] = (lam, vecs)
        out[which] = {
            "sigma": lead.real, "omega": lead.imag,
            "dsigma": lead.real - gold.real,
            "domega": lead.imag - gold.imag,
            "gap": abs(lead - gold),
        }
        print(f"[{which}] lead sigma={lead.real:+.8e} omega={lead.imag:.8e}"
              f"  dsigma={out[which]['dsigma']:+.2e} "
              f"domega={out[which]['domega']:+.2e}", flush=True)

    # persist modes for sensitivity analyses / seeding the time-stepper KS
    lam_d, vec_d = results["direct"]
    lam_a, vec_a = results["adjoint"]
    np.savez(os.path.join(HERE, "_gold_matrix_modes.npz"),
             lam_d=lam_d, lam_a=lam_a,
             vd=vec_d[:nf, :2], va=vec_a[:nf, :2], free=free)

    # ---- 3. time-stepper cross-check ------------------------------------
    if not args.no_crosscheck:
        vg = np.zeros(2 * G, complex)
        vg[free] = vec_d[:nf, 0]
        vr = scatter(ctx, jnp.asarray(vg.real.reshape(2, G), ctx.dtype))
        vi = scatter(ctx, jnp.asarray(vg.imag.reshape(2, G), ctx.dtype))
        nsteps = int(round(args.tau / args.dt))
        prop = sys_.linear_propagator(nsteps)
        sp_fun = sys_.sponge_fun
        dot = sys_.dot_full
        V = [vr, vi]
        W = [prop(u, sp_fun, vr)[0], prop(u, sp_fun, vi)[0]]
        A2 = np.array([[float(dot(V[i], W[j])) for j in range(2)]
                       for i in range(2)])
        M2 = np.array([[float(dot(V[i], V[j])) for j in range(2)]
                       for i in range(2)])
        mu, _ = np.linalg.eig(np.linalg.solve(M2, A2))
        lam_map = np.log(mu.astype(complex)) / (nsteps * args.dt)
        i = int(np.argmax(lam_map.real))
        lead_map = complex(lam_map[i].real, abs(lam_map[i].imag))
        lead_m = complex(out["direct"]["sigma"], out["direct"]["omega"])
        out["timestepper_crosscheck"] = {
            "sigma": lead_map.real, "omega": lead_map.imag,
            "bias_vs_matrix": abs(lead_map - lead_m),
            "dt": args.dt, "tau": args.tau,
        }
        print(f"[crosscheck] time-stepper map: sigma={lead_map.real:+.8e} "
              f"omega={lead_map.imag:.8e} (|bias| "
              f"{abs(lead_map - lead_m):.2e})", flush=True)

    out["wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(out), flush=True)
    os.makedirs(os.path.join(HERE, "..", "out", "gold"), exist_ok=True)
    with open(os.path.join(HERE, "..", "out", "gold",
                           "matrix_mode.json"), "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--dt", type=float, default=1e-2)
    ap.add_argument("--tau", type=float, default=1.0)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--sigma-re", type=float, default=1.567e-2)
    ap.add_argument("--sigma-im", type=float, default=0.7565)
    ap.add_argument("--newton-tol", type=float, default=1e-11)
    ap.add_argument("--refresh", action="store_true")
    ap.add_argument("--no-crosscheck", action="store_true")
    main(ap.parse_args())
