"""Backward-facing step: optimal transient growth via direct-adjoint Arnoldi.

Driver benchmark config (BASELINE.json: "Backward-facing step transient
growth: optimal perturbations via direct-adjoint loop"; reference case
examples/back_fstep/transient_growth, Re=500, k_dim=64, tol 1e-8 —
BASELINE.md). Arnoldi on exp(tau L)^dagger exp(tau L): the leading Ritz value
is the optimal energy gain G(tau), its Ritz vector the optimal perturbation;
one extra forward matvec gives the optimal response (reference outpost_ks
'ore/orv', core/eigensolvers.f:645-659).

Run: JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python examples/bfs_transient_growth.py
(small defaults for the 2-core CPU; raise n/k/tol for production)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

import numpy as np

from nekstab_tpu.algorithms import krylov_schur
from nekstab_tpu.analysis import kinetic_energy
from nekstab_tpu.config import ArnoldiConfig
from nekstab_tpu.models import bfs_system
from nekstab_tpu.utils import add_noise


def main(re=500.0, n=5, tau=2.0, k_dim=12, tol=1e-4, warmup_tu=40.0,
         smoke=False):
    t0 = time.time()
    sys_ = bfs_system(n=n, re=re, dt=1e-2, nx_in=3, nx_out=10, ny_half=3,
                      l_out=20.0)
    ctx = sys_.ctx
    print(f"mesh: {sys_.mesh.nelem} elements, {sys_.mesh.nglobal} dofs, "
          f"Re={re}, tau={tau}")

    # DNS warmup toward the steady state (BFS at Re=500 is stable but the
    # strongly non-normal Jacobian stalls Newton from a crude guess)
    from nekstab_tpu.solver import initial_state
    nwarm = int(round(warmup_tu / sys_.cfg.dt))
    st, _ = sys_.nonlinear_advance(nwarm)(sys_.case,
                                          initial_state(ctx,
                                                        sys_.case.u_bc + 0.0))
    print(f"warmup {warmup_tu} TU ({time.time()-t0:.0f}s)")
    if smoke:
        base = st.u          # machinery-only: skip the Newton solve
    else:
        res = sys_.newton_base_flow(st.u, tau=0.5, tol=1e-9,
                                    k_dim=40, maxiter=20)
        print(f"newton: converged={res.converged} iters={res.niter} "
              f"({time.time()-t0:.0f}s)")
        base = res.q

    nsteps = int(round(tau / sys_.cfg.dt))
    space = sys_.transient_growth_space(base, nsteps)
    acfg = ArnoldiConfig(k_dim=k_dim, eigen_tol=tol, schur_tgt=1,
                         max_restarts=6)
    ks = krylov_schur(space, add_noise(ctx, seed=5), acfg)
    order = np.argsort(-ks.evals.real)
    gains = ks.evals[order].real
    print(f"optimal gains G(tau={tau}): {gains[:4]}")

    # optimal perturbation (leading Ritz vector) and its response
    opt_re, _ = ks.reconstruct_mode(int(order[0]))
    e0 = float(kinetic_energy(ctx, opt_re))
    resp, _ = sys_.linear_propagator(nsteps)(base, sys_.sponge_fun, opt_re)
    e1 = float(kinetic_energy(ctx, resp))
    print(f"energy amplification of leading optimal: {e1 / e0:.4f} "
          f"(Ritz value {gains[0]:.4f})")
    print(f"total wall: {time.time()-t0:.0f}s")
    if smoke:
        assert np.isfinite(gains[0])
        print("SMOKE PASS")
        return
    assert gains[0] > 1.0, "expected transient growth > 1 at Re=500"
    assert abs(e1 / e0 - gains[0]) / gains[0] < 0.05, \
        "gain vs direct propagation mismatch"
    print("PASS")


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    if args.smoke:
        main(n=4, tau=0.1, k_dim=4, tol=1e30, warmup_tu=0.5, smoke=True)
    else:
        main()
