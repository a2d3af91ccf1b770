#!/bin/sh
# Run the test suite on host CPU with an 8-device virtual mesh (SURVEY §4).
#
# PALLAS_AXON_POOL_IPS is cleared so the axon TPU sitecustomize shim does not
# dial the (single-client) TPU tunnel for a CPU-only run — with it set, every
# python start claims the TPU and concurrent/killed runs wedge the tunnel.
cd "$(dirname "$0")/.." || exit 1
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  python3 -m pytest tests/ -x -q "$@"
