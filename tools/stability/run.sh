#!/bin/bash
# Full stability ladder on the TPU: synthetic data -> fp teacher ->
# full-length ls-2/ls-1 + KD student. ~1-2 h wall including remote
# compiles. Run with nothing else on the chip.
#
# The per-epoch metric CSVs are archived into tools/stability/results/
# (committed) — /tmp does not survive between rounds.
set -e
cd /root/repo
python tools/gen_synthetic_cifar.py /tmp/syncifar 10000 2000
mkdir -p /tmp/stability_runs
python examples/cifar100/cifar100.py --config tools/stability/teacher.yaml \
  --experiment-name teacher
python examples/cifar100/cifar100.py --config tools/stability/student_kd.yaml \
  --experiment-name student_ls2_kd
echo "=== stability ladder complete ==="
mkdir -p tools/stability/results
for run in teacher student_ls2_kd; do
  cp /tmp/stability_runs/$run/metrics/train.csv \
     tools/stability/results/${run}_train.csv
  cp /tmp/stability_runs/$run/metrics/test.csv \
     tools/stability/results/${run}_test.csv
done
echo "--- teacher final test rows"
tail -3 tools/stability/results/teacher_test.csv
echo "--- student final test rows"
tail -3 tools/stability/results/student_ls2_kd_test.csv
