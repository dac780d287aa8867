#!/bin/bash
# Round-5 TPU supervisor: runs the remaining TPU jobs in priority order
# after the raw-orbit Floquet run (PID $1), checking the wall-clock budget
# before each job (DEADLINE = epoch seconds after which no new job starts).
set -u
cd "$(dirname "$0")/.."
mkdir -p out
DEADLINE=${DEADLINE:-$(( $(date +%s) + 18000 ))}
if [ "${1:-}" != "" ]; then
  echo "waiting for PID $1 (floquet) ..." | tee -a out/r5_tpu_queue.log
  while kill -0 "$1" 2>/dev/null; do sleep 30; done
fi

run() {
  name=$1; mins=$2; shift 2
  now=$(date +%s)
  if [ $(( now + mins * 60 )) -gt "$DEADLINE" ]; then
    echo "=== $name SKIPPED (budget: need ${mins}m) ===" \
      | tee -a out/r5_tpu_queue.log
    return
  fi
  echo "=== $name: $* ($(date +%H:%M:%S)) ===" | tee -a out/r5_tpu_queue.log
  python "$@" > "out/${name}.log" 2>&1
  echo "=== $name rc=$? ($(date +%H:%M:%S)) ===" | tee -a out/r5_tpu_queue.log
}

run bfs_tg_1723 60 examples/bfs_reference_tg.py --stage tg --tpu \
    --dt 5e-3 --tau 1.723 --kdim 64 --tol 3e-4
run bfs_tg_3853 75 examples/bfs_reference_tg.py --stage tg --tpu \
    --dt 5e-3 --tau 3.853 --kdim 64 --tol 3e-4
run bench_r5b 30 bench.py
run roofline_r5 15 tools/roofline_r5.py
run flipflop_dns 50 examples/flipflop_dns.py --warmup 150 --measure 50
run tpjet_tdf 80 examples/tpjet_tdf.py --max-periods 18 --warmup 15
