#!/bin/bash
# Final TPU chain: after TG 3853 (PID $1): bench -> flipflop -> floquet(k=32)
# -> roofline -> tpjet (budget-gated).
set -u
cd "$(dirname "$0")/.."
DEADLINE=${DEADLINE:?}
if [ "${1:-}" != "" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi
run() {
  name=$1; mins=$2; shift 2
  now=$(date +%s)
  if [ $(( now + mins * 60 )) -gt "$DEADLINE" ]; then
    echo "=== $name SKIPPED (budget) ===" | tee -a out/r5_tpu_queue.log
    return
  fi
  echo "=== $name: $* ($(date +%H:%M:%S)) ===" | tee -a out/r5_tpu_queue.log
  python "$@" > "out/${name}.log" 2>&1
  echo "=== $name rc=$? ($(date +%H:%M:%S)) ===" | tee -a out/r5_tpu_queue.log
}
run bench_r5b 28 bench.py
run flipflop_dns 55 examples/flipflop_dns.py --warmup 150 --measure 50
run floquet_raw_fixed 55 examples/cylinder_floquet.py --no-fourier \
    --kdim 32 --tol 1e-3
run roofline_r5 14 tools/roofline_r5.py
run tpjet_tdf 55 examples/tpjet_tdf.py --max-periods 8 --warmup 8
