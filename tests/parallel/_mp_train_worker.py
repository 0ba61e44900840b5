"""Worker for the real 2-process multi-host CPU test.

Run as: python -m tests.parallel._mp_train_worker <pid> <nprocs> <port> <out>

Each process initializes jax.distributed against a local coordinator,
runs one epoch of classification_task on synthetic data (multi-host
wiring: per-host disjoint loader shards + global_batch assembly), and
writes its final train/test metrics to <out> as JSON. Checkpoint saving
is patched out (orbax multi-process persistence is not under test here).
"""

import json
import sys
from pathlib import Path


def main() -> None:
    pid, nprocs, port, out = (int(sys.argv[1]), int(sys.argv[2]),
                              int(sys.argv[3]), sys.argv[4])
    import jax
    jax.distributed.initialize(
        coordinator_address=f'127.0.0.1:{port}',
        num_processes=nprocs, process_id=pid)

    import quant_tpu.train.task as task_mod
    task_mod.save_checkpoint = lambda *a, **k: None

    config = {
        'seed': 0,
        'experiment_name': 'mp',
        'environment': {'platform': 'local', 'nchips': 0},
        'data': {'dataset': 'synthetic', 'train_batch_size': 16,
                 'test_batch_size': 16, 'train_size': 64, 'test_size': 32,
                 'image_shape': (28, 28, 1), 'seed': 3},
        'model': {'architecture': 'lenet5', 'loss': 'nll_loss',
                  'arch_config': {'conv1_filters': 4, 'conv2_filters': 4,
                                  'x_quant': 'ls-1', 'w_quant': 'ls-1',
                                  'clamp': {'kind': 'identity'},
                                  'output_classes': 10}},
        'optimization': {'epochs': 1,
                         'optimizer': {'algorithm': 'sgd', 'lr': 0.1},
                         'lr_scheduler': {'scheduler': 'step_lr',
                                          'step_size': 1, 'gamma': 1.0}},
        'log': {'level': 'WARNING', 'interval': 100,
                'root_experiments_dir': str(Path(out).parent),
                'save_model_freq': 100},
    }
    train_m, test_m = task_mod.classification_task(
        config, Path(out).parent)
    with open(out, 'w') as f:
        json.dump({'pid': pid, 'train': train_m, 'test': test_m}, f)


if __name__ == '__main__':
    main()
