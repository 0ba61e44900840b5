#!/usr/bin/env bash
# Build the native data-pipeline libraries:
#   quant_tpu/data/_quantdata.so  - fused gather/crop/flip (OpenMP)
#   quant_tpu/data/_quantjpeg.so  - libjpeg scaled decode+crop+resize
# The second needs libjpeg headers; it is skipped (with a note) when
# they are absent — the ImageNet loader then falls back to PIL.
set -euo pipefail
cd "$(dirname "$0")/.."
g++ -O3 -march=native -fPIC -shared -fopenmp \
    native/quantdata.cpp -o quant_tpu/data/_quantdata.so
echo "built quant_tpu/data/_quantdata.so"
if echo '#include <cstdio>
#include <jpeglib.h>' | g++ -xc++ -fsyntax-only - 2>/dev/null; then
    g++ -O3 -march=native -fPIC -shared \
        native/quantjpeg.cpp -o quant_tpu/data/_quantjpeg.so -ljpeg
    echo "built quant_tpu/data/_quantjpeg.so"
else
    echo "libjpeg headers not found; skipping _quantjpeg.so (PIL fallback)"
fi
