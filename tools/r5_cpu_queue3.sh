#!/bin/bash
# Round-5 CPU chain, stage 3: after the main CPU queue (PID $1).
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
run thermosyphon examples/thermosyphon_stability.py
