"""Batch-size sweep on the packed ls-1 ResNet-18 (the headline config).

Every prior throughput number used batch 1024; this sweeps the one
untried knob. One process = one TPU claim; results appended to
tools/bench_ab_results.jsonl (same schema, config='ls1_ls1_sweep').

Usage: python tools/bench_batch_sweep.py [batches_csv] [iters]
"""

import sys

sys.path.insert(0, '/root/repo')
sys.path.insert(0, '/root/repo/tools')

from bench_ab import measure, record  # noqa: E402


def main():
    batches = [int(b) for b in
               (sys.argv[1] if len(sys.argv) > 1 else '512,1024,2048')
               .split(',')]
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    for batch in batches:
        ips = measure('ls-1', 'ls-1', stem_s2d=False, sign_compute='int8',
                      batch=batch, iters=iters)
        record(config='ls1_ls1_sweep', stem_s2d=False, sign_compute='int8',
               batch=batch, ips=round(ips, 1))


if __name__ == '__main__':
    main()
