#!/bin/bash
# Full stability ladder on the TPU: synthetic data -> fp teacher ->
# full-length ls-2/ls-1 + KD student. ~1-2 h wall including remote
# compiles. Run with nothing else on the chip.
set -e
cd /root/repo
python tools/gen_synthetic_cifar.py /tmp/syncifar 10000 2000
mkdir -p /tmp/stability_runs
python examples/cifar100/cifar100.py --config tools/stability/teacher.yaml \
  --experiment-name teacher
python examples/cifar100/cifar100.py --config tools/stability/student_kd.yaml \
  --experiment-name student_ls2_kd
echo "=== stability ladder complete ==="
tail -3 /tmp/stability_runs/teacher/metrics/test.csv
tail -3 /tmp/stability_runs/student_ls2_kd/metrics/test.csv
