#!/bin/bash
# Round-5 TPU job chain. Waits for the BFS base stage (PID $1, if given),
# then runs the queued reference-config physics on the chip, one at a time.
set -u
cd "$(dirname "$0")/.."
mkdir -p out
if [ "${1:-}" != "" ]; then
  echo "waiting for PID $1 (bfs base) ..." | tee -a out/r5_tpu_queue.log
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ===" | tee -a out/r5_tpu_queue.log
  python "$@" > "out/${name}.log" 2>&1
  echo "=== $name rc=$? ($(date +%H:%M:%S)) ===" | tee -a out/r5_tpu_queue.log
}

# 1. BFS transient growth at the two Barkley gold points
run bfs_tg_1723 examples/bfs_reference_tg.py --stage tg --tpu \
    --dt 5e-3 --tau 1.723 --kdim 64 --tol 3e-4
run bfs_tg_3853 examples/bfs_reference_tg.py --stage tg --tpu \
    --dt 5e-3 --tau 3.853 --kdim 64 --tol 3e-4

# 2. bench with the new verifiable Ritz stage (also primes the compile cache)
run bench_r5 bench.py

# 3. Floquet Re=60 rerun on the RAW orbit (trustworthy multipliers in the
#    main record - VERDICT r4 #4)
run floquet_raw examples/cylinder_floquet.py --no-fourier --kdim 48 \
    --tol 1e-4

# 4. tpjet TDF at the reference configuration
run tpjet_tdf examples/tpjet_tdf.py --max-periods 25 --warmup 20
