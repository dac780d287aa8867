"""Structural scaling evidence from compiled HLO (VERDICT r4 #6).

A wall-clock scaling curve on 2 oversubscribed host cores is meaningless
(RESULTS.md §6), but the compiled SPMD program is hardware-independent: for
each virtual device count this tool compiles the element-sharded linearized
propagator chunk (the matvec hot loop) and reports, from the optimized HLO,

  * the number of collective ops (all-reduce / all-gather /
    collective-permute / reduce-scatter) — the per-step communication
    *structure*;
  * the summed output bytes of those collectives — the communication
    *volume* a real ICI would carry;
  * the count living inside while-loop bodies (executed once per CG
    iteration) vs. outside.

The scaling story the numbers must tell: collective COUNT stays ~constant
as devices increase (no serialization), per-device VOLUME shrinks with the
shard boundary, and nothing in the log says "involuntary full
rematerialization" (the r2-r4 warning tail).

Run:  python tools/scaling_hlo.py            # spawns per-ndev subprocesses
      python tools/scaling_hlo.py --ndev 4   # one measurement (subprocess
                                             # entry; needs JAX_PLATFORMS=cpu)
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
               "pred": 1, "s64": 8, "u64": 8, "s8": 1, "u8": 1}
COLLECTIVES = ("all-reduce", "all-gather", "collective-permute",
               "reduce-scatter", "all-to-all")


def shape_bytes(shape_str: str) -> int:
    """Bytes of an HLO shape string like 'f32[2,16,4,4]' or a tuple
    '(f32[4], f32[4])'."""
    total = 0
    for m in re.finditer(r"(\w+)\[([\d,]*)\]", shape_str):
        dt, dims = m.group(1), m.group(2)
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def analyze_hlo(text: str) -> dict:
    ops = {k: {"count": 0, "bytes": 0} for k in COLLECTIVES}
    in_loop = 0
    # computation names containing 'while' mark loop bodies/conditions
    current_comp = ""
    for line in text.splitlines():
        mcomp = re.match(r"\s*%?([\w\.\-]+)\s*\([^)]*\)\s*->", line)
        if line.strip().startswith(("ENTRY", "%")) and "{" in line:
            mm = re.match(r"\s*(?:ENTRY\s+)?%?([\w\.\-]+)", line)
            if mm:
                current_comp = mm.group(1)
        for op in COLLECTIVES:
            m = re.search(r"=\s*([^\s]+)\s+" + op + r"(?:-start|-done)?\(",
                          line)
            if m:
                ops[op]["count"] += 1
                ops[op]["bytes"] += shape_bytes(m.group(1))
                if "while" in current_comp or "body" in current_comp \
                        or "cond" in current_comp:
                    in_loop += 1
    total = {"count": sum(v["count"] for v in ops.values()),
             "bytes": sum(v["bytes"] for v in ops.values())}
    return {"ops": ops, "total": total, "in_loop_count": in_loop}


def measure(ndev: int, chunk_steps: int = 5) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np
    from nekstab_tpu.config import NSConfig
    from nekstab_tpu.models.cylinder import cylinder_mesh, freestream_ic
    from nekstab_tpu.parallel import ShardedFlowSystem
    from nekstab_tpu.solver.stepper import CaseFields
    from nekstab_tpu.mesh import dirichlet_values
    from nekstab_tpu.utils import add_noise
    from nekstab_tpu.utils.sponge import sponge_fun_box

    assert len(jax.devices()) >= ndev, "set xla_force_host_platform_device_count"
    mesh = cylinder_mesh(4, nq=4, n_ring=2, nx_left=2, nx_right=4, ny_side=2)
    cfg = NSConfig(re=50.0, dt=1e-3, vtol=1e-5, ptol=1e-5, vmaxit=50,
                   pmaxit=80)
    sys_ = ShardedFlowSystem(mesh, cfg, None, ndev=ndev, dtype=jnp.float32,
                             sponge_fun=sponge_fun_box(mesh.x, mesh.y,
                                                       xl=3.0, xr=3.0),
                             sponge_strength=1.0)
    ub = jnp.asarray(dirichlet_values(mesh, {"V": lambda x, y: (
        np.ones_like(x), np.zeros_like(x))}), jnp.float32)
    sys_.case = CaseFields(u_bc=ub, f=jnp.zeros_like(ub),
                           sponge=sys_.sponge_fun,
                           sponge_ref=jnp.zeros_like(ub))
    base = sys_.shard_vel(freestream_ic(sys_))
    v = sys_.shard_vel(add_noise(sys_.ctx, seed=3))
    prop = sys_.linear_propagator(chunk_steps)

    lowered = jax.jit(lambda b, s, vv: prop(b, s, vv)[0]).lower(
        base, sys_.sponge_fun, v)
    compiled = lowered.compile()
    text = compiled.as_text()
    out = analyze_hlo(text)
    out["ndev"] = ndev
    out["nelem"] = mesh.nelem
    out["chunk_steps"] = chunk_steps
    out["remat_warnings"] = text.count("involuntary")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ndev", type=int, default=None)
    ap.add_argument("--out", default="out/scaling_hlo.json")
    args = ap.parse_args()
    if args.ndev is not None:
        print(json.dumps(measure(args.ndev)))
        return

    rows = []
    for nd in (1, 2, 4, 8):
        env = dict(os.environ,
                   JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="",
                   XLA_FLAGS=f"--xla_force_host_platform_device_count={nd}")
        p = subprocess.run([sys.executable, os.path.abspath(__file__),
                            "--ndev", str(nd)],
                           capture_output=True, text=True, env=env,
                           cwd=os.path.dirname(os.path.dirname(
                               os.path.abspath(__file__))))
        line = [l for l in p.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(f"ndev={nd}: FAILED\n{p.stderr[-2000:]}")
            continue
        r = json.loads(line[-1])
        nwarn = sum("Involuntary full rematerialization" in l
                    for l in p.stderr.splitlines())
        r["involuntary_remat_warnings"] = nwarn
        rows.append(r)
        t = r["total"]
        print(f"ndev={nd}: collectives={t['count']} "
              f"bytes={t['bytes']} in_loop={r['in_loop_count']} "
              f"remat_warnings={nwarn}")
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(rows, fh, indent=1)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
