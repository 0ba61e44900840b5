"""Offline serving-artifact preparation (serving/prepare.py).

The 'experiment' worker spec re-exports/folds in every process; the
prepared artifact does that once and workers load it directly. The
artifact must be STRIPPED (no fp32 kernels for packed layers), carry
the fold, and serve identically to the experiment path."""

import pathlib

import jax
import jax.numpy as jnp
import numpy as np

from quant_tpu.experiment import Experiment
from quant_tpu.serving.prepare import (
    load_serving_artifact, prepare_serving_artifact,
)
from quant_tpu.serving.worker import build_engine_from_spec
from quant_tpu.train.task import classification_task


def _train_tiny_xnor(tmp_path, name='prepexp'):
    qlayer = {'x_quant': 'ls-1', 'w_quant': 'ls-1',
              'clamp': {'kind': 'symmetric', 'alpha': 2},
              'double_shortcut': True}
    cfg = {
        'seed': 11,
        'environment': {'nchips': 1},
        'data': {'dataset': 'synthetic', 'train_batch_size': 16,
                 'test_batch_size': 16, 'train_size': 32, 'test_size': 16,
                 'image_shape': [32, 32, 3]},
        'model': {'architecture': 'resnet', 'loss': 'cross_entropy',
                  'arch_config': {
                      'block': 'xnor',
                      'moving_average_mode': 'eval_only',
                      'layer0': {'n_in_channels': 4, 'kernel_size': 3,
                                 'stride': 1, 'padding': 1, 'bias': False,
                                 'maxpool': {'type': 'identity'}},
                      'layer1': dict(qlayer), 'layer2': dict(qlayer),
                      'layer3': dict(qlayer), 'layer4': None,
                      'nonlins': ['prelu', 'prelu'],
                      'num_blocks': [1, 1, 1],
                      'output_classes': 10}},
        'optimization': {'epochs': 1,
                         'optimizer': {'algorithm': 'sgd', 'lr': 0.05},
                         'lr_scheduler': {'scheduler': 'step_lr',
                                          'step_size': 1, 'gamma': 1.0}},
        'log': {'level': 'WARNING', 'interval': 100, 'save_model_freq': 1,
                'tensorboard': False,
                'root_experiments_dir': str(tmp_path / 'experiments')},
        'experiment_name': name,
    }
    Experiment(classification_task, cfg).run()
    return tmp_path / 'experiments' / name


def test_prepared_artifact_matches_experiment_serving(tmp_path):
    exp_dir = _train_tiny_xnor(tmp_path)
    out = prepare_serving_artifact(exp_dir, input_shape=(32, 32, 3))
    assert (out / 'serving.yaml').exists()
    import yaml
    meta = yaml.safe_load((out / 'serving.yaml').read_text())
    assert meta['bn_fold'] is True  # xnor + EMA: threshold-folded

    model, variables, shape = load_serving_artifact(out)
    assert shape == (32, 32, 3)
    # Stripped: packed layers carry no fp32 kernel.
    flat = str(jax.tree_util.tree_structure(variables['params']))
    pp_flat = str(jax.tree_util.tree_structure(
        variables['packed_params']))
    assert 'x_thresh' in pp_flat
    assert 'layer1_block0' in flat
    assert 'kernel' not in str(jax.tree_util.tree_structure(
        variables['params']['layer1_block0']['conv1']))

    rng = np.random.default_rng(3)
    images = rng.standard_normal((4, 32, 32, 3)).astype(np.float32)
    got = np.asarray(model.apply(variables, jnp.asarray(images), False))

    # Oracle: the 'experiment' worker path on the same checkpoint.
    eng = build_engine_from_spec(
        {'model': 'experiment', 'experiment_dir': str(exp_dir),
         'input_shape': [32, 32, 3], 'warmup': False})
    want = np.asarray(eng.apply_fn(eng.variables,
                                   jnp.asarray(images), False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    # The 'artifact' worker spec serves it too.
    eng2 = build_engine_from_spec(
        {'model': 'artifact', 'artifact_dir': str(out), 'warmup': False})
    got2 = np.asarray(eng2.apply_fn(eng2.variables,
                                    jnp.asarray(images), False))
    np.testing.assert_allclose(got2, want, rtol=1e-4, atol=1e-4)


def test_prepare_cli_and_artifact_worker_process(tmp_path):
    """CLI entry + a REAL worker process on the artifact spec."""
    import subprocess
    import sys

    from quant_tpu.serving.worker import spawn_engine_workers

    exp_dir = _train_tiny_xnor(tmp_path, name='prepexp2')
    env_patch = {'JAX_PLATFORMS': 'cpu', 'PALLAS_AXON_POOL_IPS': '',
                 'XLA_FLAGS': ''}
    import os
    env = dict(os.environ)
    env.update(env_patch)
    out = subprocess.run(
        [sys.executable, '-m', 'quant_tpu.serving.prepare',
         '--experiment', str(exp_dir), '--input-shape', '32,32,3'],
        env=env, capture_output=True, text=True, timeout=600,
        cwd=str(pathlib.Path(__file__).resolve().parents[2]))
    assert out.returncode == 0, out.stderr[-2000:]
    art = pathlib.Path(out.stdout.strip().splitlines()[-1])
    assert art.exists()

    spec = {'model': 'artifact', 'artifact_dir': str(art),
            'max_batch': 8, 'warmup': False}
    procs, clients = spawn_engine_workers(1, spec, env=env_patch)
    try:
        rng = np.random.default_rng(4)
        img = rng.standard_normal((32, 32, 3)).astype(np.float32)
        outv = clients[0].submit(img).result(timeout=300)
        assert np.isfinite(outv).all() and outv.shape == (10,)
    finally:
        for c in clients:
            c.shutdown_server()
            c.stop()
        for p in procs:
            p.wait(timeout=60)


def test_prepare_cli_real_data_calibration(tmp_path):
    """--calibrate-dataset rebuilds the experiment's own loader against
    the given path and calibrates on real train batches — an off-mode
    checkpoint prepares as a FOLDED artifact."""
    import yaml

    from quant_tpu.experiment import Experiment
    from quant_tpu.serving import prepare as prep

    cfg = {
        'seed': 9,
        'environment': {'nchips': 1},
        'data': {'dataset': 'synthetic', 'train_batch_size': 8,
                 'test_batch_size': 8, 'train_size': 16, 'test_size': 8},
        'model': {'architecture': 'lenet5', 'loss': 'nll_loss',
                  'arch_config': {'conv1_filters': 2, 'conv2_filters': 2,
                                  'x_quant': 'ls-1', 'w_quant': 'ls-1'}},
        'optimization': {'epochs': 1,
                         'optimizer': {'algorithm': 'sgd', 'lr': 0.05},
                         'lr_scheduler': {'scheduler': 'step_lr',
                                          'step_size': 1, 'gamma': 1.0}},
        'log': {'level': 'WARNING', 'interval': 100, 'save_model_freq': 1,
                'tensorboard': False,
                'root_experiments_dir': str(tmp_path / 'experiments')},
        'experiment_name': 'calprep',
    }
    Experiment(classification_task, cfg).run()
    exp_dir = tmp_path / 'experiments' / 'calprep'
    out = tmp_path / 'art'
    prep.main(['--experiment', str(exp_dir), '--out', str(out),
               '--input-shape', '28,28,1',
               '--calibrate-dataset', str(tmp_path),
               '--calibrate-batches', '2'])
    meta = yaml.safe_load((out / 'serving.yaml').read_text())
    assert meta['bn_fold'] is True  # calibrated lenet threshold-folds
