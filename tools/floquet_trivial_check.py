"""Direct check of the trivial Floquet multiplier with RAW orbit replay.

The monodromy operator of a periodic orbit has M c = c for c = du/dt
(exactly, up to discretization + replay error). The Krylov-Schur run
(out/floquet_r4.json) reported mu_trivial = 1.082 THROUGH the 3-harmonic
Fourier-compressed orbit; this tool recollects the raw orbit from the saved
on-cycle snapshot and applies one raw-replay monodromy matvec to c,
separating the compression error from the f32/discretization floor:

    python tools/floquet_trivial_check.py        # TPU
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nekstab_tpu.utils.compilecache import enable as enable_cache
enable_cache()

import jax
import jax.numpy as jnp
import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SNAP = os.path.join(HERE, "examples", "_floq_cyl_re60.npz")


def main():
    sys.path.insert(0, os.path.join(HERE, "examples"))
    from cylinder_floquet import build
    from nekstab_tpu.io.checkpoint import load_field
    from nekstab_tpu.solver import initial_state

    t0 = time.time()
    u0, _, meta = load_field(SNAP)
    T, dt, norbit = float(meta["T"]), float(meta["dt"]), int(meta["norbit"])
    sys_, _ = build(dt, tpu=True, re=60.0)
    ctx = sys_.ctx
    u0 = jnp.asarray(np.asarray(u0, np.float32))
    print(f"snapshot: T={T:.6f} norbit={norbit} "
          f"backend={jax.default_backend()}", flush=True)

    # recollect one period of the raw orbit (chunked collect)
    st, (_, orbit) = sys_.nonlinear_advance(norbit, collect=True)(
        sys_.case, initial_state(ctx, u0))
    drift = float(jnp.max(jnp.abs(st.u - u0)))
    print(f"orbit recollected: drift={drift:.3e} ({time.time()-t0:.0f}s)",
          flush=True)

    # trivial eigenvector c = du/dt|_0 (one-sided difference on the orbit)
    c = (orbit[0] - u0) / dt
    dot = sys_.dot_full
    w, _ = sys_.linear_propagator(norbit)(orbit, sys_.sponge_fun, c)
    mu = float(dot(c, w)) / float(dot(c, c))
    # residual orthogonal to c: replay/discretization noise
    resid = w - mu * c
    rel = float(jnp.sqrt(dot(resid, resid) / dot(c, c)))
    out = {"mu_trivial_raw": mu, "err": abs(mu - 1.0),
           "offaxis_rel": rel, "drift": drift,
           "wall_s": round(time.time() - t0, 1)}
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
