"""Gold-value pipeline ON THE REFERENCE DISCRETIZATION (the round north star).

Ingests the reference's curved GLL mesh (BF_1cyl0.f00001: 1996 elements,
lx1=6 — io/nekfile.py, mesh_from_coords), Newton-converges OUR OWN base flow
on it (the reference does the same: startFrom a Newton BF_ file), and runs
direct/adjoint Arnoldi/Krylov-Schur about it with the reference case's
sponge/BCs (1cyl.par). Like-for-like against BASELINE.md gold values:

    direct:  sigma = 1.567373e-2,  omega = +/-7.565285e-1
    adjoint: sigma = 1.564950e-2,  omega = +/-7.565346e-1
    (k_dim=200, eigen_tol 1e-6 — Spectre_NS{d,a}_conv.dat:1-2)

All stages default to the host f64 sparse-direct solve path (hostsolve/):
implicit solves are splu-exact, so matvec noise is ~1e-13 and Ritz residuals
converge well below the reference's 1e-6 tolerance.

  CPU fp64 (canonical):
    JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python examples/cylinder_reference_gold.py --stage base
    JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python examples/cylinder_reference_gold.py --stage eig
    JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python examples/cylinder_reference_gold.py --stage adjoint
  TPU fp32 (throughput path; accuracy floor ~1e-4):
    python examples/cylinder_reference_gold.py --stage eig --tpu
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--tpu" not in sys.argv:
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

GOLD = {"direct": (1.567373e-2, 7.565285e-1),
        "adjoint": (1.564950e-2, 7.565346e-1)}
DEFAULT_FLD = "/root/reference/examples/cylinder/stability/direct/BF_1cyl0.f00001"
HERE = os.path.dirname(os.path.abspath(__file__))


SCHEME = "pnpn"


def bf_cache(dt):
    tag = "" if SCHEME == "pnpn" else f"_{SCHEME}"
    return os.path.join(HERE, f"_bf_refmesh{tag}_dt{dt:g}.npz")


def build(fld, tpu: bool, dt: float):
    from nekstab_tpu.models.cylinder import cylinder_reference_system
    if tpu:
        import dataclasses
        sys_, base = cylinder_reference_system(
            fld, dt=dt, dtype=jnp.float32, vtol=1e-6, ptol=1e-6,
            pressure_precond="oschwarz_vfem", scheme=SCHEME)
        sys_.cfg = dataclasses.replace(sys_.cfg, vmaxit=100, pmaxit=400)
    else:
        sys_, base = cylinder_reference_system(fld, dt=dt, host_direct=True,
                                               scheme=SCHEME)
    return sys_, base


def load_base(sys_, fld, tpu, dt):
    """Our own Newton base flow if cached, else the reference's field."""
    from nekstab_tpu.io.checkpoint import load_field
    path = bf_cache(dt)
    if os.path.exists(path):
        u, _, meta = load_field(path, dtype=sys_.ctx.dtype)
        print(f"base flow: OUR Newton BF ({path}, "
              f"|F|={meta.get('newton_residual')})")
        return jnp.asarray(u)
    print("base flow: reference BF (run --stage base for the Newton BF)")
    return None


def stage_residual(fld, tpu, dt, horizon=0.25):
    """||Phi_tau(BF) - BF|| of the reference base flow under OUR nonlinear
    stepper: cross-code validation of the discretization + stepping."""
    from nekstab_tpu.analysis import cfl
    from nekstab_tpu.ops import glsc3
    t0 = time.time()
    sys_, base = build(fld, tpu, dt)
    ctx = sys_.ctx
    print(f"mesh: {sys_.mesh.nelem} elems, n={ctx.n}, {sys_.mesh.nglobal} "
          f"dofs, backend={jax.default_backend()}")
    print(f"CFL(base, dt={dt}): {float(cfl(ctx, base, dt)):.3f}")
    nsteps = int(round(horizon / dt))
    adv = sys_.nonlinear_advance(nsteps)
    st, _ = adv(sys_.case, sys_.initial_state(base))
    jax.block_until_ready(st.u)
    d = st.u - base
    nrm = float(glsc3(ctx, d, ctx.bm, d)) ** 0.5
    ref = float(glsc3(ctx, base, ctx.bm, base)) ** 0.5
    print(f"||Phi_{horizon:g}(BF) - BF||_B = {nrm:.3e} (rel {nrm / ref:.3e}) "
          f"[{nsteps} steps in {time.time()-t0:.0f}s]")
    assert np.isfinite(nrm)


def stage_base(fld, tpu, dt, newton_tau, tol, seed_bf=None, k_dim=130):
    """Newton-converge OUR base flow on the reference mesh, seeded from the
    reference's converged BF (or --seed-bf, e.g. the other scheme's BF)."""
    from nekstab_tpu.io.checkpoint import save_field
    t0 = time.time()
    sys_, ref_base = build(fld, tpu, dt)
    from nekstab_tpu.io.checkpoint import load_field
    nwt_ckpt = bf_cache(dt) + ".nwt.npz"
    if os.path.exists(nwt_ckpt):
        u, _, meta = load_field(nwt_ckpt, dtype=sys_.ctx.dtype)
        ref_base = jnp.asarray(u)
        print(f"newton resume from {nwt_ckpt} (iter {meta.get('it')}, "
              f"|F|={meta.get('rnorm')})", flush=True)
    elif seed_bf is not None and os.path.exists(seed_bf):
        u, _, _ = load_field(seed_bf, dtype=sys_.ctx.dtype)
        ref_base = jnp.asarray(u)
        print(f"newton seed from {seed_bf}", flush=True)
    print(f"mesh: {sys_.mesh.nelem} elems, {sys_.mesh.nglobal} dofs, "
          f"backend={jax.default_backend()}, dt={dt}", flush=True)

    def ckpt(it, qq, rn):
        save_field(nwt_ckpt, np.asarray(qq), it=it, rnorm=float(rn), dt=dt)

    res = sys_.newton_base_flow(ref_base, tau=newton_tau, tol=tol,
                                k_dim=k_dim, maxiter=10, callback=ckpt,
                                logger=lambda s: print(s, flush=True))
    print(f"newton: converged={res.converged} iters={res.niter} "
          f"|F|={res.residuals[-1]:.3e} wall {time.time()-t0:.0f}s")
    save_field(bf_cache(dt), np.asarray(res.q), dt=dt,
               newton_residual=float(res.residuals[-1]))
    print(f"saved {bf_cache(dt)}")


def stage_eig(which, fld, tpu, dt, k_dim, tau, tol, schur_tgt, restarts,
              seed_from=None):
    from nekstab_tpu.algorithms import krylov_schur, log_transform
    from nekstab_tpu.config import ArnoldiConfig
    from nekstab_tpu.io.checkpoint import save_arnoldi
    from nekstab_tpu.utils import add_noise
    t0 = time.time()
    sys_, ref_base = build(fld, tpu, dt)
    ctx = sys_.ctx
    base = load_base(sys_, fld, tpu, dt)
    if base is None:
        base = ref_base
    nsteps = int(round(tau / dt))
    print(f"mesh: {sys_.mesh.nelem} elems, {sys_.mesh.nglobal} dofs, "
          f"backend={jax.default_backend()}, nsteps/matvec={nsteps}, "
          f"op={which}", flush=True)
    # on TPU: f32 stepper + f64 orthogonalization (mixed precision)
    space = (sys_.direct_space(base, nsteps, dot64=tpu) if which == "direct"
             else sys_.adjoint_space(base, nsteps, dot64=tpu))
    v0 = add_noise(ctx, seed=7)
    if seed_from is not None and os.path.exists(seed_from):
        from nekstab_tpu.io.checkpoint import load_field
        u, _, _ = load_field(seed_from, dtype=ctx.dtype)
        v0 = jnp.asarray(u)
        print(f"start vector from {seed_from}")
    acfg = ArnoldiConfig(k_dim=k_dim, eigen_tol=tol, schur_tgt=schur_tgt,
                         max_restarts=restarts, maxmodes=8)
    t_col = [time.time()]

    def progress(m, Q, H):
        now = time.time()
        if m % 10 == 0:
            ev = np.linalg.eigvals(np.asarray(H[:m, :m]))
            lead = np.log(ev[np.argmax(np.abs(ev))].astype(complex)) \
                / (nsteps * dt)
            print(f"  [arnoldi] m={m} lead sigma={lead.real:+.6e} "
                  f"omega={abs(lead.imag):.6e} ({now - t_col[0]:.0f}s)",
                  flush=True)
        t_col[0] = now

    ks = krylov_schur(space, v0, acfg, callback=progress,
                      logger=lambda s: print(s, flush=True))
    lam = log_transform(ks.evals, tau=nsteps * dt)
    order = np.argsort(-lam.real)
    lam, rr = lam[order], ks.residuals[order]
    for lv, r in zip(lam[:6], rr[:6]):
        print(f"  sigma={lv.real:+.6e}  omega={lv.imag:+.6e}  res={r:.2e}")
    # persist the factorization for refinement / mode reconstruction
    tag = "" if SCHEME == "pnpn" else f"_{SCHEME}"
    out_npz = os.path.join(HERE, f"_ks_{which}{tag}_dt{dt:g}.npz")
    save_arnoldi(out_npz, np.asarray(ks.Q), ks.H, ks.H.shape[1],
                 evals=ks.evals, tau=nsteps * dt)
    lead = lam[0]
    gs, go = GOLD[which]
    out = {"op": which, "sigma": float(lead.real),
           "omega": float(abs(lead.imag)),
           "dsigma": float(lead.real - gs),
           "domega": float(abs(lead.imag) - go),
           "ritz_residual": float(rr[0]),
           "k_dim": k_dim, "tau": tau, "dt": dt,
           "backend": jax.default_backend(),
           "n_outer": ks.n_outer,
           "wall_s": round(time.time() - t0, 1)}
    print(json.dumps(out))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", choices=["residual", "base", "eig", "adjoint"],
                    required=True)
    ap.add_argument("--fld", default=DEFAULT_FLD)
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--dt", type=float, default=1e-2)
    ap.add_argument("--kdim", type=int, default=200)
    ap.add_argument("--tau", type=float, default=1.0)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--newton-tau", type=float, default=0.5)
    ap.add_argument("--newton-tol", type=float, default=1e-10)
    ap.add_argument("--schur-tgt", type=int, default=4)
    ap.add_argument("--restarts", type=int, default=8)
    ap.add_argument("--seed-from", default=None)
    ap.add_argument("--scheme", default="pnpn", choices=["pnpn", "pnpn2"])
    ap.add_argument("--seed-bf", default=None)
    ap.add_argument("--newton-kdim", type=int, default=130)
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    SCHEME = args.scheme
    if args.stage == "residual":
        stage_residual(args.fld, args.tpu, args.dt,
                       horizon=0.05 if args.smoke else 0.25)
    elif args.stage == "base":
        stage_base(args.fld, args.tpu, args.dt, args.newton_tau,
                   args.newton_tol, args.seed_bf, args.newton_kdim)
    else:
        which = "direct" if args.stage == "eig" else "adjoint"
        stage_eig(which, args.fld, args.tpu, args.dt, args.kdim, args.tau,
                  args.tol, args.schur_tgt, args.restarts, args.seed_from)
