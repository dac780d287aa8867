"""3D Taylor-Green vortex on a triply periodic box: drives the full 3D
stack (mesh3d -> sem3d ops -> CG solves -> stepper3d) against the exact
Navier-Stokes solution (the 2D TG embedded with w=0).

    JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python examples/taylor_green3d.py
    python examples/taylor_green3d.py --tpu --ne 4    # f32 perf point
"""

import argparse
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

from nekstab_tpu.config import NSConfig
from nekstab_tpu.driver3d import FlowSystem3
from nekstab_tpu.mesh3d import box_mesh3


def main(n=8, ne=2, dt=5e-3, t_end=0.5, nu=0.05):
    m = box_mesh3(n, ne, ne, ne, 0.0, 2 * np.pi, 0.0, 2 * np.pi,
                  0.0, 2 * np.pi, periodic_x=True, periodic_y=True,
                  periodic_z=True)
    if TPU:
        cfg = NSConfig(re=1.0 / nu, dt=dt, vtol=1e-5, ptol=1e-5,
                       vmaxit=100, pmaxit=300)
        sys_ = FlowSystem3(m, cfg, None, dtype=jnp.float32)
    else:
        cfg = NSConfig(re=1.0 / nu, dt=dt, vtol=1e-11, ptol=1e-10,
                       vmaxit=200, pmaxit=400)
        sys_ = FlowSystem3(m, cfg, None)
    ctx = sys_.ctx
    print(f"mesh: {m.nelem} hex elements, n={n}, {m.nglobal} dofs, periodic",
          flush=True)
    x, y = ctx.xcoord, ctx.ycoord

    def exact(t):
        # python float, not np.float64: np scalars are strong-typed in JAX
        # and would promote the f32 fields to f64 (breaking the scan carry)
        d = float(np.exp(-2.0 * nu * t))
        return jnp.stack([-jnp.cos(x) * jnp.sin(y) * d,
                          jnp.sin(x) * jnp.cos(y) * d,
                          jnp.zeros_like(x)])

    nsteps = int(round(t_end / dt))
    t0 = time.time()
    st, E = sys_.nonlinear_advance(nsteps)(sys_.case,
                                           sys_.initial_state(exact(0.0)))
    jax.block_until_ready(st.u)
    wall = time.time() - t0
    err = float(jnp.max(jnp.abs(st.u - exact(nsteps * dt))))
    ke = float(E[-1])
    ke_exact = 0.5 * float(jnp.sum(ctx.bm * jnp.sum(exact(nsteps * dt)[:3] ** 2,
                                                    axis=0)))
    print(f"steps/sec: {nsteps / wall:.1f} (wall {wall:.1f}s, incl. compile)",
          flush=True)
    # steady-state rate (compile amortized)
    t0 = time.time()
    nrep = max(20, nsteps // 4)
    st2, _ = sys_.nonlinear_advance(nrep)(sys_.case, st)
    jax.block_until_ready(st2.u)
    rate = nrep / (time.time() - t0)
    print(f"steps/sec (warm): {rate:.1f} [{m.nelem} hexes, n={n}, "
          f"{3 * m.nglobal} vel dofs, backend={jax.default_backend()}]",
          flush=True)
    print(f"t={t_end}: max pointwise velocity error vs analytic: {err:.3e}")
    print(f"kinetic energy: simulated {ke:.10f} analytic {ke_exact:.10f} "
          f"rel {abs(ke - ke_exact) / ke_exact:.3e}")
    ok = err < (2e-3 if TPU else 2e-4)
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true")
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--ne", type=int, default=2)
    ap.add_argument("--dt", type=float, default=5e-3)
    ap.add_argument("--t-end", type=float, default=0.5)
    args = ap.parse_args()
    raise SystemExit(main(n=args.n, ne=args.ne, dt=args.dt,
                          t_end=args.t_end))
