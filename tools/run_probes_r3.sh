#!/bin/bash
# v2 (DCE-proof) probe ladder. One TPU claim at a time; int8 conv probe
# late (first s8 conv compile on this toolchain was tiny — a big-shape
# hang is still conceivable); model batch sweep last (longest compiles).
cd /root/repo
run() {
  name=$1; tmo=$2
  echo "=== $name (timeout ${tmo}s) ==="
  timeout "$tmo" python tools/probe_r3.py "$name"
  if [ $? -eq 124 ]; then
    echo "{\"probe\": \"$name\", \"error\": \"timeout ${tmo}s\"}" >> tools/probe_r3_results.jsonl
    echo "TIMED OUT — sleeping 600s for the tunnel claim to clear"
    sleep 600
  fi
}

run matmul_chain_bf16 900
run matmul_chain_f32 900
run matmul_chain_f32_highest 900
run elementwise_chain_v2 600
run conv_chain_bf16 1800
run conv_chain_wide_channels 900
run conv_im2col_chain_bf16 1200
run stem_vs_s2d_v2 900
run conv_chain_int8 1800
run batch_sweep_model 3000
echo "=== r3 ladder complete ==="
