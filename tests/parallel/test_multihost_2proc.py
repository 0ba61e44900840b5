"""REAL 2-process multi-host training test (CPU, Gloo collectives).

Spawns two jax.distributed processes against a local coordinator, each
running classification_task with the multi-host input wiring (per-host
disjoint loader shards assembled into one logical global batch). Asserts:

* both processes compute IDENTICAL global metrics (the collectives and
  global-batch assembly are consistent), and
* the distributed run's train loss matches a single-process run fed the
  same logical batch stream (DP sharding changes nothing numerically
  beyond reduction order).

The reference has no distributed testing at all (SURVEY.md §4); its
DataParallel scatter is implicit (initialization.py:125-127).
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[2]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        return s.getsockname()[1]


@pytest.fixture(scope='module')
def mp_results(tmp_path_factory):
    tmp = tmp_path_factory.mktemp('mp2')
    port = _free_port()
    env = dict(os.environ)
    env.update({'PALLAS_AXON_POOL_IPS': '', 'JAX_PLATFORMS': 'cpu',
                'XLA_FLAGS': '--xla_force_host_platform_device_count=2'})
    procs = []
    outs = []
    for pid in range(2):
        out = tmp / f'proc{pid}.json'
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, '-m', 'tests.parallel._mp_train_worker',
             str(pid), '2', str(port), str(out)],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail('2-process workers timed out')
        logs.append(stdout.decode(errors='replace'))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f'worker failed:\n{log[-3000:]}'
    return [json.loads(o.read_text()) for o in outs]


def test_both_processes_agree(mp_results):
    r0, r1 = mp_results
    assert r0['train'] and r0['test']
    for k in r0['train'][0]:
        np.testing.assert_allclose(r0['train'][0][k], r1['train'][0][k],
                                   rtol=1e-6)
    for k in r0['test'][0]:
        np.testing.assert_allclose(r0['test'][0][k], r1['test'][0][k],
                                   rtol=1e-6)


def test_matches_single_process_reference(mp_results):
    """Single-process run on the SAME logical batch stream -> same loss."""
    from quant_tpu.data.loaders import SyntheticDataLoader
    from quant_tpu.parallel.multihost import shard_loader_for_host
    from quant_tpu.train.engine import make_train_step, train_epoch
    from quant_tpu.train.losses import get_loss_fn
    from quant_tpu.train.optim import make_optimizer
    from quant_tpu.train.state import TrainState
    from quant_tpu.train.task import build_model, init_model_variables

    data_cfg = dict(train_batch_size=16, test_batch_size=16,
                    train_size=64, test_size=32,
                    image_shape=(28, 28, 1), seed=3)
    dl = SyntheticDataLoader(**data_cfg)
    full = dl.get_train_loader()
    shards = [shard_loader_for_host(dl.get_train_loader(), pi, 2)
              for pi in range(2)]

    class _Zipped:
        num_examples = full.num_examples

        def __len__(self):
            return len(shards[0])

        def __iter__(self):
            for (x0, y0), (x1, y1) in zip(*shards):
                # make_array_from_process_local_data lays out rows in
                # process order over the 'data' axis.
                yield (np.concatenate([x0, x1]), np.concatenate([y0, y1]))

    model = build_model('lenet5', {
        'conv1_filters': 4, 'conv2_filters': 4, 'x_quant': 'ls-1',
        'w_quant': 'ls-1', 'clamp': {'kind': 'identity'},
        'output_classes': 10})
    variables = init_model_variables(model, np.zeros((2, 28, 28, 1),
                                                     np.float32), 0)
    opt_cfg = {'epochs': 1, 'optimizer': {'algorithm': 'sgd', 'lr': 0.1},
               'lr_scheduler': {'scheduler': 'step_lr', 'step_size': 1,
                                'gamma': 1.0}}
    tx, _ = make_optimizer(opt_cfg, 1, len(shards[0]))
    state = TrainState.create(model.apply, variables, tx)
    step = make_train_step(get_loss_fn('nll_loss'))
    _, metrics = train_epoch(step, state, _Zipped(), epoch=1,
                             log_interval=100)

    dist_loss = mp_results[0]['train'][0]['Loss']
    # Sharded vs unsharded layouts reorder f32 reductions (BN batch
    # stats, loss means); after 4 SGD steps that compounds to ~2e-4.
    np.testing.assert_allclose(metrics['Loss'], dist_loss, rtol=1e-3)
