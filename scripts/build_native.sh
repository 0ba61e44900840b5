#!/usr/bin/env bash
# Build the native data-pipeline library (quant_tpu/data/_quantdata.so).
set -euo pipefail
cd "$(dirname "$0")/.."
g++ -O3 -march=native -fPIC -shared -fopenmp \
    native/quantdata.cpp -o quant_tpu/data/_quantdata.so
echo "built quant_tpu/data/_quantdata.so"
