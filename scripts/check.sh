#!/usr/bin/env bash
# Full quality gate: lint + typing subset, then the test suite under the
# line-coverage tracer — the analog of the reference's pytest addopts
# `--mypy --flake8 --cov quant` (reference pytest.ini:11-17), built on
# stdlib only (mypy/flake8/coverage are not installed in this image).
set -euo pipefail
cd "$(dirname "$0")/.."
python scripts/lint.py
exec env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    XLA_FLAGS="--xla_force_host_platform_device_count=8" \
    python scripts/coverage.py "$@"
