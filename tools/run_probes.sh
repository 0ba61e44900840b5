#!/bin/bash
# Run the round-2 TPU probe ladder sequentially (one TPU claim at a
# time). Risky probes (known compiler-hang candidates) come last so a
# wedged tunnel cannot block the safe measurements. Each probe gets a
# hard timeout; results append to tools/probe_r2_results.jsonl.
cd /root/repo
run() {
  name=$1; tmo=$2
  echo "=== $name (timeout ${tmo}s) ==="
  timeout "$tmo" python tools/probe_r2.py "$name"
  rc=$?
  if [ $rc -eq 124 ]; then
    echo "{\"probe\": \"$name\", \"error\": \"timeout ${tmo}s\"}" >> tools/probe_r2_results.jsonl
    echo "TIMED OUT — sleeping 600s for the tunnel claim to clear"
    sleep 600
  fi
}

run matmul_bf16 900
run matmul_f32 900
run elementwise_chain 600
run maxpool 600
run stem_s2d 900
run conv_l1_batches 1200
run conv_shapes_bf16 1800
run conv_stem_fp32_highest 900
run winograd_matmuls 1500
run pallas_add 600
run pallas_matmul_bf16 1200
run matmul_int8 900
run conv_shift_matmul 1800
run conv_im2col_int8 1500
run matmul_int4 600
run conv_s8_small 420
echo "=== probe ladder complete ==="
