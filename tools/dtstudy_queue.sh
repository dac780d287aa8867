#!/bin/bash
# Sequential CPU f64 dt-convergence queue (VERDICT r4 Next #3): the cylinder
# Re=50 leading eigenvalue at dt in {1e-2, 5e-3, 2.5e-3} on the ingested
# reference mesh (pnpn scheme, host_direct f64), then Richardson limit.
# Newton iterates checkpoint each outer iteration, so re-running this script
# resumes instead of restarting (examples/cylinder_dt_study.py).
set -u
cd "$(dirname "$0")/.."
mkdir -p out/gold
export JAX_PLATFORMS=cpu
export PALLAS_AXON_POOL_IPS=

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ===" | tee -a out/gold/dtstudy.log
  python "$@" > "out/gold/${name}.log" 2>&1
  echo "=== $name rc=$? ($(date +%H:%M:%S)) ===" | tee -a out/gold/dtstudy.log
}

run dt1em2   examples/cylinder_dt_study.py --dt 1e-2   --sweeps 6
run dt5em3   examples/cylinder_dt_study.py --dt 5e-3   --sweeps 6
run dt25em4  examples/cylinder_dt_study.py --dt 2.5e-3 --sweeps 6 --seed-dt 5e-3
run richardson examples/cylinder_dt_study.py --richardson
