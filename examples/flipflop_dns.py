"""Flip-flop two-cylinder wake at the REFERENCE configuration (Re=60).

Reference: examples/flip_flop/baseflow/2cyl.par — UPO Newton (uparam 2.1)
at Re=60 with period T = endTime = 8.73356 and k_dim=128: the reference's
benchmark quantity for this case IS that period. This run cross-checks it:
DNS of the two-cylinder wake (gap ratio 1.5D as flipflop_mesh defaults),
wake-probe zero-crossing period detection, gap-flow deflection statistics
(the bistable "flip-flop" diagnostic), and an optional UPO-residual
verification of the detected orbit.

  python examples/flipflop_dns.py            # TPU f32
  JAX_PLATFORMS=cpu ... python examples/flipflop_dns.py --cpu --smoke
"""

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

import jax

TPU = "--cpu" not in sys.argv
if TPU:
    from nekstab_tpu.utils.compilecache import enable as _enable_cache
    _enable_cache()
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

T_REF = 8.73356     # flip_flop/baseflow/2cyl.par endTime (the UPO period)


def main(args):
    import dataclasses
    from nekstab_tpu.analysis import ZeroCrossing, cfl
    from nekstab_tpu.io.checkpoint import load_field, save_field
    from nekstab_tpu.models.flipflop import flipflop_system
    from nekstab_tpu.solver import initial_state

    t0 = time.time()
    kw = {}
    if TPU:
        kw = dict(dtype=jnp.float32, vtol=1e-5, ptol=1e-5)
    sys_ = flipflop_system(n=6, re=60.0, dt=args.dt, **kw)
    if TPU:
        sys_.cfg = dataclasses.replace(sys_.cfg, vmaxit=100, pmaxit=400)
    ctx = sys_.ctx
    print(f"mesh: {sys_.mesh.nelem} elems, {sys_.mesh.nglobal} dofs, "
          f"backend={jax.default_backend()}", flush=True)

    if args.smoke:
        st, E = sys_.nonlinear_advance(5)(
            sys_.case, sys_.initial_state(sys_.case.sponge_ref + 0.0))
        assert np.isfinite(float(E[-1]))
        print(f"SMOKE PASS ({time.time()-t0:.0f}s)", flush=True)
        return

    # --- DNS warmup with an antisymmetric kick (triggers the gap flow) ---
    x, y = np.asarray(ctx.xcoord), np.asarray(ctx.ycoord)
    warm_ckpt = os.path.join(HERE, "_flipflop_warm.npz")
    t_done = 0.0
    if os.path.exists(warm_ckpt):
        uw, _, mw = load_field(warm_ckpt, dtype=ctx.dtype)
        st = sys_.initial_state(jnp.asarray(uw))
        t_done = float(mw.get("t_done", 0.0))
        print(f"warmup resume: t={t_done}", flush=True)
    else:
        kick = 0.4 * np.exp(-((x - 1.2) ** 2 + y ** 2))
        u0 = (sys_.case.sponge_ref + 0.0).at[1].add(
            jnp.asarray(kick * np.asarray(ctx.mask_vel[1]), ctx.dtype))
        st = sys_.initial_state(u0)
    seg = 10.0
    while t_done < args.warmup - 1e-9:
        tu = min(seg, args.warmup - t_done)
        st, E = sys_.nonlinear_advance(int(round(tu / args.dt)))(sys_.case,
                                                                 st)
        jax.block_until_ready(st.u)
        t_done += tu
        save_field(warm_ckpt, np.asarray(st.u), t_done=t_done)
        print(f"  warmup t={t_done:.0f}/{args.warmup:.0f} "
              f"E={float(E[-1]):.6f} ({time.time()-t0:.0f}s)", flush=True)

    # --- period + gap-deflection statistics --------------------------------
    pw = np.unravel_index(np.argmin((x - 3.0) ** 2 + y ** 2), x.shape)
    pg = np.unravel_index(np.argmin(x ** 2 + y ** 2), x.shape)  # gap centre
    nm = int(round(args.measure / args.dt))
    st, (E, traj) = sys_.nonlinear_advance(nm, collect=True)(sys_.case, st)
    vprobe = np.asarray(traj[:, 1, pw[0], pw[1], pw[2]])
    vgap = np.asarray(traj[:, 1, pg[0], pg[1], pg[2]])
    amp = 0.5 * float(vprobe.max() - vprobe.min())
    zc = ZeroCrossing()
    vz = vprobe - vprobe.mean()
    for i, v in enumerate(vz):
        zc.update((i + 1) * args.dt, float(v))
    T = float(np.mean(zc.periods[-4:])) if len(zc.periods) >= 2 else None
    out = {
        "re": 60.0, "nelem": int(sys_.mesh.nelem),
        "probe_amplitude": amp,
        "T_detected": T,
        "T_reference": T_REF,
        "dT_rel": None if T is None else T / T_REF - 1.0,
        "gap_deflection_mean": float(vgap.mean()),
        "gap_deflection_std": float(vgap.std()),
        "cfl": float(cfl(ctx, st.u, args.dt)),
        "backend": jax.default_backend(),
        "wall_s": round(time.time() - t0, 1),
    }
    save_field(os.path.join(HERE, "_flipflop_state.npz"), np.asarray(st.u),
               T=0.0 if T is None else T)
    print(json.dumps(out), flush=True)
    with open(os.path.join(HERE, "..", "out", "flipflop_dns.json"),
              "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--dt", type=float, default=5e-3)
    ap.add_argument("--warmup", type=float, default=150.0)
    ap.add_argument("--measure", type=float, default=50.0)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--smoke", action="store_true")
    main(ap.parse_args())
