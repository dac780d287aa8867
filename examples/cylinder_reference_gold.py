"""Gold-value eigensolve ON THE REFERENCE DISCRETIZATION.

Ingests the reference's shipped converged base flow + curved GLL mesh
(BF_1cyl0.f00001: 1996 elements, lx1=6 — io/nekfile.py, mesh_from_coords) and
runs the direct Arnoldi/Krylov-Schur about it with the reference case's
sponge/BCs (1cyl.par). Like-for-like against BASELINE.md gold values:
    sigma = 1.567373e-2,  omega = +/-7.565285e-1  (tol 1e-6, k_dim=200).

  CPU fp64:  JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= \
             python examples/cylinder_reference_gold.py --stage residual
  TPU fp32:  python examples/cylinder_reference_gold.py --stage eig --tpu
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

GOLD_SIGMA = 1.567373e-2
GOLD_OMEGA = 7.565285e-1
DEFAULT_FLD = "/root/reference/examples/cylinder/stability/direct/BF_1cyl0.f00001"


def build(fld, tpu: bool, dt: float):
    from nekstab_tpu.models.cylinder import cylinder_reference_system
    if tpu:
        import dataclasses
        sys_, base = cylinder_reference_system(
            fld, dt=dt, dtype=jnp.float32, vtol=1e-5, ptol=1e-5)
        sys_.cfg = dataclasses.replace(sys_.cfg, vmaxit=80, pmaxit=200)
    else:
        sys_, base = cylinder_reference_system(fld, dt=dt)
    return sys_, base


def stage_residual(fld, tpu, dt):
    """||Phi_tau(BF) - BF|| of the reference base flow under OUR nonlinear
    stepper: cross-code validation of the discretization + stepping."""
    from nekstab_tpu.analysis import cfl
    from nekstab_tpu.ops import glsc3
    from nekstab_tpu.solver import initial_state
    t0 = time.time()
    sys_, base = build(fld, tpu, dt)
    ctx = sys_.ctx
    print(f"mesh: {sys_.mesh.nelem} elems, n={ctx.n}, {sys_.mesh.nglobal} "
          f"dofs, backend={jax.default_backend()}")
    print(f"CFL(base, dt={dt}): {float(cfl(ctx, base, dt)):.3f}")
    nsteps = int(round(0.25 / dt))
    adv = sys_.nonlinear_advance(nsteps)
    st, _ = adv(sys_.case, initial_state(ctx, base))
    jax.block_until_ready(st.u)
    d = st.u - base
    nrm = float(glsc3(ctx, d, ctx.bm, d)) ** 0.5
    ref = float(glsc3(ctx, base, ctx.bm, base)) ** 0.5
    print(f"||Phi_0.25(BF) - BF||_B = {nrm:.3e} (rel {nrm / ref:.3e}) "
          f"[{nsteps} steps in {time.time()-t0:.0f}s]")


def stage_eig(fld, tpu, dt, k_dim, tau, tol, schur_tgt, restarts):
    from nekstab_tpu.algorithms import krylov_schur, log_transform
    from nekstab_tpu.config import ArnoldiConfig
    from nekstab_tpu.utils import add_noise
    t0 = time.time()
    sys_, base = build(fld, tpu, dt)
    ctx = sys_.ctx
    nsteps = int(round(tau / dt))
    print(f"mesh: {sys_.mesh.nelem} elems, {sys_.mesh.nglobal} dofs, "
          f"backend={jax.default_backend()}, nsteps/matvec={nsteps}")
    space = sys_.direct_space(base, nsteps)
    v0 = add_noise(ctx, seed=7)
    acfg = ArnoldiConfig(k_dim=k_dim, eigen_tol=tol, schur_tgt=schur_tgt,
                         max_restarts=restarts, maxmodes=8)
    t_col = [time.time()]

    def progress(m, Q, H):
        now = time.time()
        if m % 10 == 0:
            ev = np.linalg.eigvals(np.asarray(H[:m, :m]))
            lead = np.log(ev[np.argmax(np.abs(ev))]) / (nsteps * dt)
            print(f"  [arnoldi] m={m} lead sigma={lead.real:+.6e} "
                  f"omega={abs(lead.imag):.6e} ({now - t_col[0]:.0f}s)",
                  flush=True)
        t_col[0] = now

    ks = krylov_schur(space, v0, acfg, callback=progress)
    lam = log_transform(ks.evals, tau=nsteps * dt)
    order = np.argsort(-lam.real)
    lam, rr = lam[order], ks.residuals[order]
    for lv, r in zip(lam[:6], rr[:6]):
        print(f"  sigma={lv.real:+.6e}  omega={lv.imag:+.6e}  res={r:.2e}")
    lead = lam[0]
    out = {"sigma": float(lead.real), "omega": float(abs(lead.imag)),
           "dsigma": float(lead.real - GOLD_SIGMA),
           "domega": float(abs(lead.imag) - GOLD_OMEGA),
           "k_dim": k_dim, "tau": tau, "backend": jax.default_backend(),
           "wall_s": round(time.time() - t0, 1)}
    print(json.dumps(out))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", choices=["residual", "eig"], required=True)
    ap.add_argument("--fld", default=DEFAULT_FLD)
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--dt", type=float, default=2.5e-3)
    ap.add_argument("--kdim", type=int, default=160)
    ap.add_argument("--tau", type=float, default=1.0)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--schur-tgt", type=int, default=2)
    ap.add_argument("--restarts", type=int, default=6)
    args = ap.parse_args()
    if args.stage == "residual":
        stage_residual(args.fld, args.tpu, args.dt)
    else:
        stage_eig(args.fld, args.tpu, args.dt, args.kdim, args.tau, args.tol,
                  args.schur_tgt, args.restarts)
