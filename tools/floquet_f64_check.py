"""f64 Floquet consistency check on a small shedding cylinder (Re=100).

The TPU Re=60 Floquet runs give mu_trivial ~ 1.082 from BOTH the raw and
the Fourier-compressed orbit (out/floquet_raw_r5.log vs r4) — so the r4
"compression error" attribution was wrong. This isolates the remaining
suspects (f32 replay floor / orbit drift / replay alignment) by running
the identical raw-orbit Krylov-Schur in f64 with exact implicit solves on
a mesh small enough for CPU: if mu_trivial -> 1 here, the TPU deviation is
the f32+drift floor; if not, the orbit-replay propagator itself is biased.

  JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python tools/floquet_f64_check.py
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


def main(dt=1e-2, nsettle_periods=2, tag="", from_upo=False):
    from nekstab_tpu.algorithms import krylov_schur
    from nekstab_tpu.analysis import ZeroCrossing
    from nekstab_tpu.config import ArnoldiConfig
    from nekstab_tpu.io.checkpoint import load_field, save_field
    from nekstab_tpu.models.cylinder import cylinder_system, freestream_ic
    from nekstab_tpu.utils import add_noise

    t0 = time.time()
    sys_ = cylinder_system(n=6, re=100.0, dt=dt, host_direct=True,
                           nq=4, n_ring=2, nx_left=2, nx_right=6, ny_side=2,
                           xmax=25.0)
    ctx = sys_.ctx
    print(f"mesh: {sys_.mesh.nelem} elems, CPU f64", flush=True)

    warm = os.path.join("examples", "_upo64_warm_re100.npz")
    if os.path.exists(warm):
        u0, _, _ = load_field(warm, dtype=ctx.dtype)
        st = sys_.initial_state(jnp.asarray(u0))
        print("warmup: cached (upo_f64)", flush=True)
    else:
        x, y = np.asarray(ctx.xcoord), np.asarray(ctx.ycoord)
        kick = 0.4 * np.exp(-((x - 1.5) ** 2 + y ** 2))
        u0 = freestream_ic(sys_).at[1].add(
            jnp.asarray(kick * np.asarray(ctx.mask_vel[1]), ctx.dtype))
        st = sys_.initial_state(u0)
        st, E = sys_.nonlinear_advance(int(150.0 / dt))(sys_.case, st)
        save_field(warm, np.asarray(st.u), dt=dt)
        print(f"warmup 150 TU: E={float(E[-1]):.5f} "
              f"({time.time()-t0:.0f}s)", flush=True)

    if from_upo:
        # UPO-polished orbit: |F| ~ 1e-9 closes the orbit to the f64
        # floor, removing the drift amplification that dominates the
        # DNS-orbit trivial multiplier (6.5e-3 at drift ~1e-4)
        up, _, mu = load_field("examples/_upo64_re100.npz",
                               dtype=ctx.dtype)
        T = float(mu["T"])
        norbit = int(round(T / dt))
        dt2 = T / norbit
        import dataclasses
        sys_.cfg = dataclasses.replace(sys_.cfg, dt=dt2)
        sys_._cache.clear()
        st0 = sys_.initial_state(jnp.asarray(up))
        st, (_, orbit) = sys_.nonlinear_advance(norbit, collect=True)(
            sys_.case, st0)
        drift = float(jnp.max(jnp.abs(st.u - st0.u)))
        print(f"UPO orbit: T={T:.6f} norbit={norbit} drift={drift:.3e}",
              flush=True)
        _ks(sys_, ctx, orbit, norbit, T, drift, t0, tag)
        return

    # period
    x, y = np.asarray(ctx.xcoord), np.asarray(ctx.ycoord)
    pi = np.unravel_index(np.argmin((x - 3.0) ** 2 + y ** 2), x.shape)
    st, (E, traj) = sys_.nonlinear_advance(int(30.0 / dt), collect=True)(
        sys_.case, st)
    v = np.asarray(traj[:, 1, pi[0], pi[1], pi[2]])
    v = v - v.mean()
    zc = ZeroCrossing()
    for i, vv in enumerate(v):
        zc.update((i + 1) * dt, float(vv))
    T = float(np.mean(zc.periods[-3:]))
    norbit = int(round(T / dt))
    dt2 = T / norbit
    import dataclasses
    sys_.cfg = dataclasses.replace(sys_.cfg, dt=dt2)
    sys_._cache.clear()
    for _ in range(nsettle_periods):
        st, _ = sys_.nonlinear_advance(norbit)(sys_.case, st)   # settle
    st0 = st
    st, (_, orbit) = sys_.nonlinear_advance(norbit, collect=True)(sys_.case,
                                                                  st0)
    drift = float(jnp.max(jnp.abs(st.u - st0.u)))
    print(f"T={T:.6f} norbit={norbit} drift={drift:.3e}", flush=True)
    _ks(sys_, ctx, orbit, norbit, T, drift, t0, tag)


def _ks(sys_, ctx, orbit, norbit, T, drift, t0, tag):
    from nekstab_tpu.algorithms import krylov_schur
    from nekstab_tpu.config import ArnoldiConfig
    from nekstab_tpu.utils import add_noise
    import jax.numpy as jnp

    space = sys_.direct_space(orbit, norbit)
    acfg = ArnoldiConfig(k_dim=20, eigen_tol=1e-7, schur_tgt=4,
                         max_restarts=2, maxmodes=6)
    ks = krylov_schur(space, add_noise(ctx, seed=7), acfg,
                      logger=lambda s: print(s, flush=True))
    mus = ks.evals[np.argsort(-np.abs(ks.evals))]
    i_triv = int(np.argmin(np.abs(mus - 1.0)))
    print("leading multipliers:", [f"{m:.6f}" for m in mus[:5]], flush=True)
    out = {"T": T, "norbit": norbit, "drift": drift,
           "mu_trivial": [float(mus[i_triv].real), float(mus[i_triv].imag)],
           "trivial_err": float(abs(mus[i_triv] - 1.0)),
           "mu_lead": [float(mus[0].real), float(mus[0].imag)],
           "wall_s": round(time.time() - t0, 1)}
    print(json.dumps(out), flush=True)
    with open(f"out/floquet_f64_check{tag}.json", "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--dt", type=float, default=1e-2)
    ap.add_argument("--settle", type=int, default=2)
    ap.add_argument("--tag", default="")
    ap.add_argument("--from-upo", action="store_true")
    a = ap.parse_args()
    main(dt=a.dt, nsettle_periods=a.settle, tag=a.tag, from_upo=a.from_upo)
