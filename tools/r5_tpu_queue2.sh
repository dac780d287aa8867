#!/bin/bash
# Round-5 TPU chain, stage 2: after the raw-orbit Floquet run (PID $1).
set -u
cd "$(dirname "$0")/.."
mkdir -p out
if [ "${1:-}" != "" ]; then
  echo "waiting for PID $1 (floquet) ..." | tee -a out/r5_tpu_queue.log
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi

run() {
  name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S)) ===" | tee -a out/r5_tpu_queue.log
  python "$@" > "out/${name}.log" 2>&1
  echo "=== $name rc=$? ($(date +%H:%M:%S)) ===" | tee -a out/r5_tpu_queue.log
}

run bfs_tg_1723 examples/bfs_reference_tg.py --stage tg --tpu \
    --dt 5e-3 --tau 1.723 --kdim 64 --tol 3e-4
run bfs_tg_3853 examples/bfs_reference_tg.py --stage tg --tpu \
    --dt 5e-3 --tau 3.853 --kdim 64 --tol 3e-4
run bench_r5b bench.py
run flipflop_dns examples/flipflop_dns.py --warmup 150 --measure 50
run tpjet_tdf examples/tpjet_tdf.py --max-periods 18 --warmup 15
