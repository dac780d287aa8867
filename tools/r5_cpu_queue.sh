#!/bin/bash
# Round-5 CPU f64 queue, v2 (matrix-mode plan). Waits for the matrix-mode
# gold run (PID $1, if given) to exit, then runs the time-stepper KS stages
# seeded from the matrix eigenmodes plus the remaining CPU physics, one job
# at a time (2 vCPUs). Stages are resumable; rerunning is safe.
set -u
cd "$(dirname "$0")/.."
mkdir -p out/gold out
export JAX_PLATFORMS=cpu
export PALLAS_AXON_POOL_IPS=

if [ "${1:-}" != "" ]; then
  echo "waiting for PID $1 (matrix mode) ..." | tee -a out/gold/r5_queue.log
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ===" | tee -a out/gold/r5_queue.log
  python "$@" > "out/gold/${name}.log" 2>&1
  echo "=== $name rc=$? ($(date +%H:%M:%S)) ===" | tee -a out/gold/r5_queue.log
}

# 0. matrix eigenmode -> Arnoldi seed fields + BF cache for stage_eig
run seed_matrix tools/matrix_mode_seed.py --which direct
run seed_matrix_adj tools/matrix_mode_seed.py --which adjoint

# 1. direct Krylov-Schur on the pnpn2 base flow, seeded from the matrix
#    eigenmode (fast convergence; the flagship time-stepper demonstration)
run pnpn2_eig examples/cylinder_reference_gold.py --stage eig \
    --scheme pnpn2 --kdim 130 --schur-tgt 4 --restarts 3 \
    --seed-from examples/_seed_matrix_direct.npz

# 2. adjoint Krylov-Schur seeded from the matrix adjoint eigenmode
run pnpn2_adj examples/cylinder_reference_gold.py --stage adjoint \
    --scheme pnpn2 --kdim 130 --schur-tgt 4 --restarts 4 \
    --seed-from examples/_seed_matrix_adjoint.npz

# 3. cavity at the reference configuration (cav.re2, Re=3600)
run cavity_ref examples/cavity_reference.py

# 4. multi-iteration f64 UPO from a perturbed seed
run upo_f64 examples/cylinder_upo_f64.py

# 5. structural scaling artifact (HLO collective counts at 1/2/4/8 devices)
run scaling_hlo tools/scaling_hlo.py
