"""Kovasznay flow: Newton-Krylov steady state vs the exact NS solution.

Run: JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python examples/kovasznay.py
Expect: quadratic Newton convergence and max error vs exact ~5e-7.
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from nekstab_tpu.models import channel_system
from nekstab_tpu.models.channel import kovasznay_exact


def main():
    sys_ = channel_system(n=7, nelx=4, nely=4, re=40.0)
    ctx = sys_.ctx
    x, y = np.asarray(ctx.xcoord), np.asarray(ctx.ycoord)
    uex = jnp.asarray(np.stack(kovasznay_exact(40.0, x, y)))
    res = sys_.newton_base_flow(sys_.case.u_bc + 0.0, tau=0.25, tol=1e-10,
                                k_dim=40, maxiter=20)
    err = float(jnp.max(jnp.abs(res.q - uex)))
    print(f"newton converged={res.converged} iters={res.niter}")
    print(f"max error vs Kovasznay exact: {err:.3e}")
    assert res.converged and err < 5e-6, "FAILED"
    print("PASS")


if __name__ == "__main__":
    main()
