"""Convert _gold_matrix_modes.npz (ARPACK eigenvectors on free assembled
dofs) into (a) a real velocity-field seed npz for the time-stepper Arnoldi
stages (--seed-from) and (b) the matrix base flow copied to the gold-chain
cache name so stage_eig uses it.

  python tools/matrix_mode_seed.py [--which direct|adjoint]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

HERE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples")
FLD = "/root/reference/examples/cylinder/stability/direct/BF_1cyl0.f00001"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", default="direct",
                    choices=["direct", "adjoint"])
    ap.add_argument("--dt", type=float, default=1e-2)
    args = ap.parse_args()
    from nekstab_tpu.io.checkpoint import load_field, save_field
    from nekstab_tpu.models.cylinder import cylinder_reference_system
    from nekstab_tpu.ops.gather_scatter import scatter

    sys_, _ = cylinder_reference_system(FLD, dt=args.dt, host_direct=True,
                                        scheme="pnpn2")
    ctx = sys_.ctx
    G = sys_.mesh.nglobal
    z = np.load(os.path.join(HERE, "_gold_matrix_modes.npz"))
    free = z["free"]
    v = z["vd" if args.which == "direct" else "va"][:, 0]
    vg = np.zeros(2 * G, complex)
    vg[free] = v
    field = np.asarray(scatter(ctx, jnp.asarray(vg.real.reshape(2, G))))
    field = field / np.sqrt((field ** 2).sum())
    out = os.path.join(HERE, f"_seed_matrix_{args.which}.npz")
    save_field(out, np.ascontiguousarray(field), source="matrix_mode")
    print(f"saved {out}")

    # copy the matrix base flow to the gold-chain cache name
    bf_m = os.path.join(HERE, "_bf_refmesh_pnpn2_matrix.npz")
    bf_cache = os.path.join(HERE, f"_bf_refmesh_pnpn2_dt{args.dt:g}.npz")
    if os.path.exists(bf_m) and not os.path.exists(bf_cache):
        u, _, meta = load_field(bf_m)
        save_field(bf_cache, np.asarray(u),
                   newton_residual=float(meta.get("resid", 0.0)),
                   source="steady_newton_matrix")
        print(f"saved {bf_cache}")


if __name__ == "__main__":
    main()
