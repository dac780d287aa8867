"""Temporal bias of the (stabilized) pnpn2 time stepper vs the assembled
matrix eigenvalue: Rayleigh-Ritz of the matrix eigenvector under the map
at several dts. Run after examples/cylinder_gold_matrix.py has produced
_gold_matrix_modes.npz and the refsponge BF.

  JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python tools/crosscheck_dt.py
"""

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
HERE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples")


def main():
    from nekstab_tpu.io.checkpoint import load_field
    from nekstab_tpu.models.cylinder import cylinder_reference_system
    from nekstab_tpu.ops.gather_scatter import scatter

    z = np.load(os.path.join(HERE, "_gold_matrix_modes.npz"))
    lam_m = complex(z["lam_d"][0])
    lead_m = complex(lam_m.real, abs(lam_m.imag))
    rows = []
    for dt in (1e-2, 5e-3):
        t0 = time.time()
        sys_, _ = cylinder_reference_system(FLD, dt=dt, host_direct=True,
                                            scheme="pnpn2")
        ctx = sys_.ctx
        G = sys_.mesh.nglobal
        u, _, _ = load_field(os.path.join(
            HERE, "_bf_refmesh_pnpn2_matrix.npz"), dtype=ctx.dtype)
        base = jnp.asarray(u)
        free = z["free"]
        vg = np.zeros(2 * G, complex)
        vg[free] = z["vd"][:, 0]
        vr = scatter(ctx, jnp.asarray(vg.real.reshape(2, G), ctx.dtype))
        vi = scatter(ctx, jnp.asarray(vg.imag.reshape(2, G), ctx.dtype))
        nsteps = int(round(1.0 / dt))
        prop = sys_.linear_propagator(nsteps)
        sp = sys_.sponge_fun
        dot = sys_.dot_full
        V = [vr, vi]
        W = [prop(base, sp, vr)[0], prop(base, sp, vi)[0]]
        A = np.array([[float(dot(V[i], W[j])) for j in range(2)]
                      for i in range(2)])
        M = np.array([[float(dot(V[i], V[j])) for j in range(2)]
                      for i in range(2)])
        mu, _ = np.linalg.eig(np.linalg.solve(M, A))
        lam = np.log(mu.astype(complex)) / (nsteps * dt)
        i = int(np.argmax(lam.real))
        lead = complex(lam[i].real, abs(lam[i].imag))
        rows.append({"dt": dt, "sigma": lead.real, "omega": lead.imag,
                     "bias": abs(lead - lead_m),
                     "wall_s": round(time.time() - t0, 1)})
        print(f"dt={dt}: sigma={lead.real:+.8e} omega={lead.imag:.8e} "
              f"|bias vs matrix| = {abs(lead - lead_m):.3e}", flush=True)
    if len(rows) == 2 and rows[1]["bias"] > 0:
        order = np.log(rows[0]["bias"] / rows[1]["bias"]) / np.log(2.0)
        print(f"apparent temporal order: {order:.2f}", flush=True)
    out = {"matrix": [lead_m.real, lead_m.imag], "rows": rows}
    with open("out/gold/crosscheck_dt.json", "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
