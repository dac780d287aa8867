#!/bin/bash
# Round-5 TPU supervisor v2: right-sized TG (k=16 for the leading SPD gain),
# then bench, the FIXED raw-orbit Floquet, flipflop, roofline, short tpjet.
set -u
cd "$(dirname "$0")/.."
mkdir -p out
DEADLINE=${DEADLINE:-$(( $(date +%s) + 14400 ))}
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
run bfs_tg_1723 30 examples/bfs_reference_tg.py --stage tg --tpu \
    --dt 5e-3 --tau 1.723 --kdim 16 --tol 3e-4
run bfs_tg_3853 55 examples/bfs_reference_tg.py --stage tg --tpu \
    --dt 5e-3 --tau 3.853 --kdim 16 --tol 3e-4
run bench_r5b 30 bench.py
run floquet_raw_fixed 75 examples/cylinder_floquet.py --no-fourier \
    --kdim 48 --tol 1e-4
run flipflop_dns 50 examples/flipflop_dns.py --warmup 150 --measure 50
run roofline_r5 15 tools/roofline_r5.py
run tpjet_tdf 60 examples/tpjet_tdf.py --max-periods 10 --warmup 10
