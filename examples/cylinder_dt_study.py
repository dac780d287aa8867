"""dt-convergence study of the cylinder Re=50 leading eigenvalue
(VERDICT r3 item #2: dt in {1e-2, 5e-3, 2.5e-3} + Richardson limit).

For each dt the configuration is re-converged end to end, cheaply:
  1. base flow: Newton at the new dt, SEEDED from the dt=1e-2 Newton BF
     (the fixed point moves only by the splitting error, so Newton lands
     in 1-3 iterations);
  2. leading eigenpair: subspace iteration + Rayleigh-Ritz on the 2-D
     invariant subspace carried over from the dt=1e-2 k=200 Krylov-Schur
     run (examples/_ks_direct*_dt0.01.npz). Each refinement sweep is 2
     matvecs and squares the subspace angle error, so 3 sweeps converge
     the pair to solver precision for ~6 matvecs instead of a fresh k=200
     Arnoldi (which at dt=2.5e-3 would cost 80,000 time steps).

Richardson: fit sigma(dt) = sigma0 + C dt^p over the three points and
report the extrapolated limit against the reference gold value
(Spectre_NSd_conv.dat:1-2: sigma=1.567373e-2, omega=0.7565285).

  JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python examples/cylinder_dt_study.py --dt 5e-3
  JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python examples/cylinder_dt_study.py --richardson
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

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

from cylinder_reference_gold import DEFAULT_FLD, GOLD, bf_cache, build
import cylinder_reference_gold as crg

GOLD_SIGMA, GOLD_OMEGA = GOLD["direct"]
TAU = 1.0


def result_path(scheme, dt):
    tag = "" if scheme == "pnpn" else f"_{scheme}"
    return os.path.join(HERE, f"_dtstudy{tag}_dt{dt:g}.json")


def leading_pair_from_ks(path, ctx):
    """(vr, vi) of the leading Ritz mode from a saved KS factorization."""
    with np.load(path) as z:
        Q = z["Q0"] if "Q0" in z.files else z["Q"]
        H = z["H"]
        m = int(z["m"])
    lam, V = np.linalg.eig(H[:m, :m])
    i = int(np.argmax(np.abs(lam)))
    c = V[:, i]
    v = np.tensordot(c, Q[:m], axes=(0, 0))
    vr = jnp.asarray(np.ascontiguousarray(v.real), ctx.dtype)
    vi = jnp.asarray(np.ascontiguousarray(v.imag), ctx.dtype)
    return vr, vi


def rayleigh_ritz_2d(dot, V, W):
    """Leading eigenvalue of the operator projected on span(V): A_ij =
    <v_i, w_j>, M_ij = <v_i, v_j> with w_j = P v_j."""
    k = len(V)
    A = np.array([[float(dot(V[i], W[j])) for j in range(k)]
                  for i in range(k)])
    M = np.array([[float(dot(V[i], V[j])) for j in range(k)]
                  for i in range(k)])
    lam, Y = np.linalg.eig(np.linalg.solve(M, A))
    i = int(np.argmax(np.abs(lam)))
    return lam[i], Y[:, i]


def orthonormalize(dot, vecs):
    out = []
    for v in vecs:
        for q in out:
            v = v - jnp.asarray(float(dot(q, v)), v.dtype) * q
        n = float(dot(v, v)) ** 0.5
        out.append(v / jnp.asarray(n, v.dtype))
    return out


def run_dt(dt, scheme, sweeps, newton_tol, seed_dt):
    crg.SCHEME = scheme
    t0 = time.time()
    sys_, ref_base = build(DEFAULT_FLD, tpu=False, dt=dt)
    ctx = sys_.ctx
    print(f"mesh: {sys_.mesh.nelem} elems, dt={dt}, scheme={scheme}",
          flush=True)

    # --- 1. base flow at this dt (seeded from the seed_dt Newton BF) -----
    from nekstab_tpu.io.checkpoint import load_field, save_field
    path = bf_cache(dt)
    if os.path.exists(path):
        u, _, meta = load_field(path, dtype=ctx.dtype)
        base = jnp.asarray(u)
        print(f"base: cached ({path}, |F|={meta.get('newton_residual')})",
              flush=True)
    else:
        nwt_ckpt = path + ".nwt.npz"
        seed_path = bf_cache(seed_dt)
        if os.path.exists(nwt_ckpt):
            u, _, meta = load_field(nwt_ckpt, dtype=ctx.dtype)
            seed = jnp.asarray(u)
            print(f"newton resume: {nwt_ckpt} (iter {meta.get('it')}, "
                  f"|F|={meta.get('rnorm')})", flush=True)
        elif os.path.exists(seed_path):
            u, _, _ = load_field(seed_path, dtype=ctx.dtype)
            seed = jnp.asarray(u)
            print(f"newton seed: {seed_path}", flush=True)
        else:
            seed = ref_base
            print("newton seed: reference BF field", flush=True)

        # per-iteration iterate checkpoint: a killed run resumes from the
        # last Newton iterate instead of the original seed (VERDICT r3
        # Weak #7: the pnpn2 queue died mid-GMRES and left nothing)
        def ckpt(it, qq, rn):
            save_field(nwt_ckpt, np.asarray(qq), it=it, rnorm=float(rn),
                       dt=dt)

        res = sys_.newton_base_flow(seed, tau=0.5, tol=newton_tol, k_dim=110,
                                    maxiter=6, callback=ckpt,
                                    logger=lambda s: print(s, flush=True))
        base = res.q
        save_field(path, np.asarray(base),
                   newton_residual=float(res.residuals[-1]), dt=dt)
        print(f"newton |F|={res.residuals[-1]:.3e} "
              f"({time.time()-t0:.0f}s); saved {path}", flush=True)

    # --- 2. eigenpair refinement -----------------------------------------
    tag = "" if scheme == "pnpn" else f"_{scheme}"
    ks_path = os.path.join(HERE, f"_ks_direct{tag}_dt{seed_dt:g}.npz")
    if not os.path.exists(ks_path):
        ks_path = os.path.join(HERE, f"_ks_direct_dt{seed_dt:g}.npz")
    vr, vi = leading_pair_from_ks(ks_path, ctx)
    print(f"subspace seed: {ks_path}", flush=True)

    nsteps = int(round(TAU / dt))
    prop = sys_.linear_propagator(nsteps)
    sp = sys_.sponge_fun
    dot = sys_.dot
    mv = lambda v: prop(base, sp, v)[0]

    V = orthonormalize(dot, [vr, vi])
    lam_hist = []
    for s in range(sweeps):
        W = [mv(v) for v in V]
        mu, _ = rayleigh_ritz_2d(dot, V, W)
        lam = np.log(complex(mu)) / (nsteps * dt)
        lam_hist.append(lam)
        print(f"  sweep {s}: sigma={lam.real:+.8e} omega={abs(lam.imag):.8e} "
              f"({time.time()-t0:.0f}s)", flush=True)
        V = orthonormalize(dot, W)
    # convergence estimate: last two sweeps
    dconv = abs(lam_hist[-1] - lam_hist[-2]) if len(lam_hist) > 1 else None
    lam = lam_hist[-1]
    out = {"dt": dt, "scheme": scheme, "tau": nsteps * dt,
           "sigma": float(lam.real), "omega": float(abs(lam.imag)),
           "dsigma": float(lam.real - GOLD_SIGMA),
           "domega": float(abs(lam.imag) - GOLD_OMEGA),
           "sweep_conv": None if dconv is None else float(dconv),
           "sweeps": sweeps, "wall_s": round(time.time() - t0, 1)}
    with open(result_path(scheme, dt), "w") as fh:
        json.dump(out, fh)
    print(json.dumps(out), flush=True)
    return out


def richardson(scheme, dts):
    """Fit sigma(dt) = sigma0 + C dt^p through three points (exact 3-point
    solve for the order p as well), same for omega."""
    pts = []
    for dt in dts:
        p = result_path(scheme, dt)
        if os.path.exists(p):
            with open(p) as fh:
                pts.append(json.load(fh))
    if len(pts) < 3:
        print(f"need 3 dt results for {scheme}, have {len(pts)}")
        return
    pts = sorted(pts, key=lambda d: -d["dt"])
    d1, d2, d3 = [p["dt"] for p in pts]
    assert abs(d1 / d2 - d2 / d3) < 1e-9, "need geometric dt sequence"
    r = d1 / d2

    def extrap(key):
        f1, f2, f3 = [p[key] for p in pts]
        num, den = f1 - f2, f2 - f3
        if den == 0 or num / den <= 0:
            return f3, None
        p_order = np.log(num / den) / np.log(r)
        f0 = f3 - (f2 - f3) / (r ** p_order - 1.0)
        return f0, p_order

    s0, ps = extrap("sigma")
    w0, pw = extrap("omega")
    out = {"scheme": scheme, "dts": [d1, d2, d3],
           "sigma_limit": s0, "sigma_order": ps,
           "omega_limit": w0, "omega_order": pw,
           "dsigma_limit": s0 - GOLD_SIGMA,
           "domega_limit": w0 - GOLD_OMEGA,
           "gold_sigma": GOLD_SIGMA, "gold_omega": GOLD_OMEGA}
    print(json.dumps(out))
    with open(os.path.join(HERE, f"_dtstudy_{scheme}_richardson.json"),
              "w") as fh:
        json.dump(out, fh)
    return out


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--dt", type=float, default=None)
    ap.add_argument("--scheme", default="pnpn", choices=["pnpn", "pnpn2"])
    ap.add_argument("--sweeps", type=int, default=3)
    ap.add_argument("--newton-tol", type=float, default=1e-10)
    ap.add_argument("--seed-dt", type=float, default=1e-2)
    ap.add_argument("--richardson", action="store_true")
    args = ap.parse_args()
    if args.richardson:
        richardson(args.scheme, [1e-2, 5e-3, 2.5e-3])
    else:
        assert args.dt is not None
        run_dt(args.dt, args.scheme, args.sweeps, args.newton_tol,
               args.seed_dt)
