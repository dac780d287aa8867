#!/bin/bash
# Round-5 CPU chain, stage 4 (post-thermosyphon): re-run the time-stepper
# KS stages with the STABILIZED pnpn2 stepper, and the UPO-orbit Floquet.
set -u
cd "$(dirname "$0")/.."
if [ "${1:-}" != "" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 60; done
fi
export JAX_PLATFORMS=cpu
export PALLAS_AXON_POOL_IPS=
run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ===" | tee -a out/gold/r5_queue.log
  python "$@" > "out/gold/${name}.log" 2>&1
  echo "=== $name rc=$? ($(date +%H:%M:%S)) ===" | tee -a out/gold/r5_queue.log
}
run floquet_upo_orbit tools/floquet_f64_check.py --from-upo --tag _upo
run pnpn2_eig_stable examples/cylinder_reference_gold.py --stage eig \
    --scheme pnpn2 --kdim 130 --schur-tgt 4 --restarts 3 \
    --seed-from examples/_seed_matrix_direct.npz
run pnpn2_adj_stable examples/cylinder_reference_gold.py --stage adjoint \
    --scheme pnpn2 --kdim 130 --schur-tgt 4 --restarts 3 \
    --seed-from examples/_seed_matrix_adjoint.npz
