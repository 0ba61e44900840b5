"""Regression tests for code-review findings (round 1)."""

import numpy as np

from quant_tpu.data.loaders import BatchIterable, random_crop_flip
from quant_tpu.serving import InferenceEngine


def _toy_apply(variables, x, train):
    import jax.numpy as jnp
    return jnp.mean(x, axis=(1, 2, 3))[:, None] + variables['b']


def test_engine_non_power_of_two_max_batch(rng):
    """max_batch is always a usable bucket (48 items must not overflow a
    32-bucket)."""
    eng = InferenceEngine(_toy_apply, {'b': np.float32(0.0)}, (4, 4, 1),
                          max_batch=48)
    assert eng._bucket_for(48) == 48
    imgs = rng.standard_normal((48, 4, 4, 1)).astype(np.float32)
    out = eng.predict(imgs)
    assert out.shape[0] == 48


def test_engine_predict_chunks_oversized_batches(rng):
    eng = InferenceEngine(_toy_apply, {'b': np.float32(0.0)}, (4, 4, 1),
                          max_batch=16)
    imgs = rng.standard_normal((37, 4, 4, 1)).astype(np.float32)
    out = eng.predict(imgs)
    assert out.shape[0] == 37
    np.testing.assert_allclose(out[:, 0], imgs.mean(axis=(1, 2, 3)),
                               rtol=1e-5, atol=1e-6)


def test_nonstrict_restore_structure_mismatch(tmp_path):
    """strict_keys=False with a mismatched checkpoint merges by path and
    keeps fresh values elsewhere."""
    import jax.numpy as jnp
    from quant_tpu.train.task import _restore_into

    fresh = {'params': {'a': jnp.zeros((2,)), 'b': jnp.zeros((3,))}}
    payload = {'params': {'a': np.ones((2,), np.float32),
                          'c': np.ones((5,), np.float32)}}
    out = _restore_into(fresh, payload, strict_keys=False)
    np.testing.assert_array_equal(np.asarray(out['params']['a']),
                                  np.ones((2,)))
    np.testing.assert_array_equal(np.asarray(out['params']['b']),
                                  np.zeros((3,)))


def test_augment_without_shuffle_works(rng):
    x = rng.standard_normal((16, 8, 8, 1)).astype(np.float32)
    y = np.zeros(16)
    it = BatchIterable(x, y, batch_size=8, shuffle=False,
                       augment=random_crop_flip)
    batches = list(it)
    assert len(batches) == 2  # no UnboundLocalError


def test_crop_pad_value_matches_pad_then_normalize(rng):
    """Padding fills with the normalized black value, not 0."""
    mean = np.array([0.5, 0.4, 0.3], np.float32)
    std = np.array([0.2, 0.25, 0.3], np.float32)
    pv = (0.0 - mean) / std
    img = np.ones((1, 6, 6, 3), np.float32)

    # Force a maximal shift so borders are definitely padding.
    class _R:
        def integers(self, lo, hi, n):
            return np.full(n, hi - 1)

        def random(self, n):
            return np.zeros(n)

    out = random_crop_flip(img, _R(), pad=2, pad_value=pv)
    np.testing.assert_allclose(out[0, -1, -1], pv, rtol=1e-6)


def test_final_epoch_checkpoint_on_resume(tmp_path):
    """A resumed run checkpoints its true last epoch."""
    import yaml
    from quant_tpu.experiment import Experiment
    from quant_tpu.train.task import classification_task

    cfg = {
        'seed': 1,
        'environment': {'nchips': 1},
        'data': {'dataset': 'synthetic', 'train_batch_size': 16,
                 'test_batch_size': 32, 'train_size': 32, 'test_size': 32},
        'model': {'architecture': 'lenet5', 'loss': 'nll_loss',
                  'arch_config': {'conv1_filters': 2, 'conv2_filters': 3}},
        'optimization': {'epochs': 2,
                         'optimizer': {'algorithm': 'sgd', 'lr': 0.01},
                         'lr_scheduler': {'scheduler': 'step_lr',
                                          'step_size': 10, 'gamma': 1.0}},
        'log': {'level': 'WARNING', 'interval': 100,
                'save_model_freq': 5,  # never divides the epochs run
                'tensorboard': False,
                'root_experiments_dir': str(tmp_path)},
        'experiment_name': 'resume-ckpt',
    }
    Experiment(classification_task, cfg).run()
    exp = tmp_path / 'resume-ckpt'
    assert (exp / 'checkpoints' / 'checkpoint_2').exists()

    cfg2 = dict(cfg)
    cfg2['restore_experiment'] = str(exp)
    Experiment(classification_task, cfg2).run()
    # Resumed run trains epochs 3..4; epoch 4 must be checkpointed even
    # though 4 % 5 != 0 and 4 != cfg epochs (2).
    assert (exp / 'checkpoints' / 'checkpoint_4').exists()
