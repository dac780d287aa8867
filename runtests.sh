#!/bin/bash
# Test runner: forces CPU and disables the axon TPU relay registration
# (sitecustomize inits the relay at interpreter start; in-process env changes
# are too late and cause multi-minute futex stalls — see .claude/skills/verify)
export JAX_PLATFORMS=cpu
export PALLAS_AXON_POOL_IPS=
if [ $# -eq 0 ]; then set -- tests/ -q; fi
exec python -m pytest "$@"
