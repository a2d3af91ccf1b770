#!/bin/sh
# Pre-snapshot smoke (VERDICT r3 weak #7: BENCH_r02 was a crash artifact
# because nothing forced a bench/dryrun smoke before snapshotting).
#
# Runs, in order:
#   1. the full CPU test suite on the 8-device virtual mesh,
#   2. the driver dryrun (dense + pcg/kernels multichip paths, 8 devices),
#   3. bench.py on the real TPU (one attempt, under timeout).
#
# Exits nonzero on the first failure.  Usage:  scripts/preflight.sh
set -e
cd "$(dirname "$0")/.." || exit 1

echo "== 1/3 CPU test suite =="
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  timeout 4200 python3 -m pytest tests/ -q

echo "== 2/3 dryrun_multichip(8) =="
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  timeout 900 python3 -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

echo "== 3/3 bench.py (real TPU) =="
timeout 1500 python3 bench.py

echo "PREFLIGHT OK"
