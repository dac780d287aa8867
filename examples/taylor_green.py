"""Taylor-Green vortex: end-to-end validation of the SEM NS stepper.

Analytic Navier-Stokes solution on the periodic box [0,2pi]^2:
    u = -cos(x) sin(y) e^{-2 nu t},  v = sin(x) cos(y) e^{-2 nu t}.

Run: JAX_PLATFORMS=cpu python examples/taylor_green.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from nekstab_tpu.config import NSConfig
from nekstab_tpu.mesh import box_mesh
from nekstab_tpu.ops import glsc3, make_context
from nekstab_tpu.solver import initial_state, make_advance, zero_case_fields


def main(n=7, nel=4, nu=0.05, dt=2e-3, nsteps=500):
    m = box_mesh(n, nel, nel, 0.0, 2 * np.pi, 0.0, 2 * np.pi,
                 periodic_x=True, periodic_y=True)
    ctx = make_context(m)
    print(f"mesh: {m.nelem} elements, n={m.n}, {m.nglobal} dofs, periodic")

    cfg = NSConfig(re=1.0 / nu, dt=dt, vtol=1e-12, ptol=1e-11)
    x, y = np.asarray(ctx.xcoord), np.asarray(ctx.ycoord)
    u0 = jnp.asarray(np.stack([-np.cos(x) * np.sin(y), np.sin(x) * np.cos(y)]))
    case = zero_case_fields(ctx)
    state = initial_state(ctx, u0)

    advance = jax.jit(make_advance(ctx, cfg, has_outflow=False, nsteps=nsteps))
    t0 = time.time()
    state2, energies = advance(case, state)
    jax.block_until_ready(state2)
    wall = time.time() - t0

    t_end = dt * nsteps
    decay = np.exp(-2 * nu * t_end)
    uex = np.stack([-np.cos(x) * np.sin(y), np.sin(x) * np.cos(y)]) * decay
    err = np.abs(np.asarray(state2.u) - uex).max()
    e_end = float(energies[-1])
    e_exact = float(0.5 * glsc3(ctx, jnp.asarray(uex), ctx.bm, jnp.asarray(uex)))
    print(f"steps/sec: {nsteps / wall:.1f} (wall {wall:.1f}s, incl. compile)")
    print(f"t={t_end}: max pointwise velocity error vs analytic: {err:.3e}")
    print(f"kinetic energy: simulated {e_end:.10f} analytic {e_exact:.10f} "
          f"rel {abs(e_end - e_exact) / e_exact:.3e}")
    assert err < 1e-4, "Taylor-Green validation FAILED"
    print("PASS")


if __name__ == "__main__":
    main()
