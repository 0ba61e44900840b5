#!/usr/bin/env bash
# Run the test suite on a virtual 8-device CPU mesh.
#
# PALLAS_AXON_POOL_IPS is cleared so the axon TPU-tunnel sitecustomize does
# not claim the (single) TPU session for a CPU-only test run — concurrent
# claims block each other. JAX_PLATFORMS / XLA_FLAGS are also set by
# tests/conftest.py; setting them here keeps the interpreter from ever
# touching the axon plugin.
set -euo pipefail
cd "$(dirname "$0")/.."
args=("$@")
if [ ${#args[@]} -eq 0 ]; then
    args=(tests/ -q)
fi
exec env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    XLA_FLAGS="--xla_force_host_platform_device_count=8" \
    python -m pytest "${args[@]}"
