#!/bin/bash
# Sequential CPU f64 gold-value queue (round 3): pnpn2 base/eig/adjoint at
# dt=1e-2 on the ingested reference cylinder mesh, logged to out/gold/.
# One job at a time: the host has 2 vCPUs and each stage saturates them.
set -u
cd "$(dirname "$0")/.."
mkdir -p out/gold
export JAX_PLATFORMS=cpu
export PALLAS_AXON_POOL_IPS=

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ===" | tee -a out/gold/queue.log
  python "$@" > "out/gold/${name}.log" 2>&1
  echo "=== $name rc=$? ($(date +%H:%M:%S)) ===" | tee -a out/gold/queue.log
}

run pnpn2_base examples/cylinder_reference_gold.py --stage base \
    --scheme pnpn2 --seed-bf examples/_bf_refmesh_dt0.01.npz
run pnpn2_eig examples/cylinder_reference_gold.py --stage eig \
    --scheme pnpn2 --kdim 200 --schur-tgt 4 --restarts 6
run pnpn2_adj examples/cylinder_reference_gold.py --stage adjoint \
    --scheme pnpn2 --kdim 200 --schur-tgt 4 --restarts 6
