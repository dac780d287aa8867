#!/bin/bash
# Round-5 CPU f64 queue. Waits for the pnpn2 Newton resume (PID $1, if
# given) to exit, then runs the gold-chain eigen stages and the remaining
# CPU physics sequentially (2 vCPUs; one job at a time). Every stage is
# resumable/skippable via its own artifacts; rerunning this script is safe.
set -u
cd "$(dirname "$0")/.."
mkdir -p out/gold out
export JAX_PLATFORMS=cpu
export PALLAS_AXON_POOL_IPS=

if [ "${1:-}" != "" ]; then
  echo "waiting for PID $1 (pnpn2 newton) ..." | tee -a out/gold/r5_queue.log
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ===" | tee -a out/gold/r5_queue.log
  python "$@" > "out/gold/${name}.log" 2>&1
  echo "=== $name rc=$? ($(date +%H:%M:%S)) ===" | tee -a out/gold/r5_queue.log
}

# 1. quick leading-pair refinement on the pnpn2 operator (minutes)
run pnpn2_refine examples/cylinder_dt_study.py --dt 1e-2 --scheme pnpn2 \
    --sweeps 10

# 2. rigorous direct Krylov-Schur seeded from the pnpn leading mode
run seed_extract tools/extract_leading_mode.py \
    examples/_ks_direct_dt0.01.npz examples/_seed_lead_dt0.01.npz
run pnpn2_eig examples/cylinder_reference_gold.py --stage eig \
    --scheme pnpn2 --kdim 130 --schur-tgt 4 --restarts 3 \
    --seed-from examples/_seed_lead_dt0.01.npz

# 3. adjoint Krylov-Schur (seeded from the direct mode: nonzero overlap
#    with the adjoint leading pair; KS restarts do the rest)
run pnpn2_adj examples/cylinder_reference_gold.py --stage adjoint \
    --scheme pnpn2 --kdim 130 --schur-tgt 4 --restarts 4 \
    --seed-from examples/_seed_lead_dt0.01.npz

# 4. cavity at the reference configuration (cav.re2, Re=3600)
run cavity_ref examples/cavity_reference.py

# 5. multi-iteration f64 UPO from a perturbed seed
run upo_f64 examples/cylinder_upo_f64.py
