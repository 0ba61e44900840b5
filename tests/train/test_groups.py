"""Per-group optimizer treatment over quantized/fp param labels
(the reference's quantized_parameters scaffolding, binary_conv.py:93-96,
made real via optax.multi_transform)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax.traverse_util import flatten_dict

from quant_tpu.nn import QLeNet5
from quant_tpu.train.groups import quantized_param_labels
from quant_tpu.train.optim import make_optimizer


def _lenet_vars():
    model = QLeNet5(conv1_filters=4, conv2_filters=6,
                    x_quant='ls-1', w_quant='ls-1')
    x = jnp.zeros((2, 28, 28, 1))
    return model, model.init(jax.random.key(0), x, True)


def test_labels_mark_only_quantized_kernels():
    _, variables = _lenet_vars()
    labels = flatten_dict(quantized_param_labels(variables))
    # QLeNet5: conv1/fc1/fc2 full-precision, conv2 quantized
    # (reference lenet.py:67-94 keeps first/last layers fp).
    quantized = sorted('/'.join(p) for p, v in labels.items()
                       if v == 'quantized')
    assert quantized == ['conv2/kernel']
    # Everything else is fp, including conv2's bias.
    assert labels[('conv2', 'bias')] == 'fp'
    assert labels[('conv1', 'kernel')] == 'fp'
    # Labels cover the full params tree.
    assert set(labels) == set(flatten_dict(dict(variables['params'])))


def test_param_groups_frozen_quantized_group():
    """lr_scale 0 on the quantized group freezes exactly those kernels."""
    _, variables = _lenet_vars()
    labels = quantized_param_labels(variables)
    cfg = {'optimizer': {'algorithm': 'sgd', 'lr': 0.1,
                         'param_groups': {'quantized': {'lr_scale': 0.0}}},
           'lr_scheduler': {'scheduler': 'step_lr', 'step_size': 10,
                            'gamma': 1.0}}
    tx, _ = make_optimizer(cfg, epochs=1, steps_per_epoch=1,
                           param_labels=labels)
    params = variables['params']
    opt_state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    flat = flatten_dict(dict(updates))
    assert np.all(np.asarray(flat[('conv2', 'kernel')]) == 0.0)
    assert np.all(np.asarray(flat[('conv1', 'kernel')]) == -0.1)
    assert np.all(np.asarray(flat[('conv2', 'bias')]) == -0.1)


def test_param_groups_per_group_weight_decay():
    """Global weight_decay applies to fp only when the quantized group
    overrides it to 0 (the standard BNN recipe)."""
    _, variables = _lenet_vars()
    labels = quantized_param_labels(variables)
    cfg = {'optimizer': {'algorithm': 'sgd', 'lr': 1.0,
                         'weight_decay': 0.5,
                         'param_groups': {'quantized':
                                          {'weight_decay': 0.0}}},
           'lr_scheduler': {'scheduler': 'step_lr', 'step_size': 10,
                            'gamma': 1.0}}
    tx, _ = make_optimizer(cfg, epochs=1, steps_per_epoch=1,
                           param_labels=labels)
    params = variables['params']
    opt_state = tx.init(params)
    grads = jax.tree.map(jnp.zeros_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    flat_u = flatten_dict(dict(updates))
    flat_p = flatten_dict(dict(params))
    # fp group: update = -lr * wd * param; quantized group: 0.
    np.testing.assert_allclose(
        np.asarray(flat_u[('conv1', 'kernel')]),
        -0.5 * np.asarray(flat_p[('conv1', 'kernel')]), rtol=1e-6)
    assert np.all(np.asarray(flat_u[('conv2', 'kernel')]) == 0.0)


def test_param_groups_requires_labels():
    cfg = {'optimizer': {'algorithm': 'sgd', 'lr': 0.1,
                         'param_groups': {'quantized': {'lr_scale': 2.0}}}}
    with pytest.raises(ValueError, match='param labels'):
        make_optimizer(cfg, epochs=1, steps_per_epoch=1)


def test_param_groups_unknown_key_raises():
    _, variables = _lenet_vars()
    labels = quantized_param_labels(variables)
    cfg = {'optimizer': {'algorithm': 'sgd', 'lr': 0.1,
                         'param_groups': {'quantized': {'bogus': 1}}}}
    with pytest.raises(ValueError, match='bogus'):
        make_optimizer(cfg, epochs=1, steps_per_epoch=1,
                       param_labels=labels)


def test_param_groups_lr_scale_is_multi_transform():
    """lr_scale 2 doubles the quantized group's sgd step."""
    _, variables = _lenet_vars()
    labels = quantized_param_labels(variables)
    cfg = {'optimizer': {'algorithm': 'sgd', 'lr': 0.1,
                         'param_groups': {'quantized': {'lr_scale': 2.0}}},
           'lr_scheduler': {'scheduler': 'step_lr', 'step_size': 10,
                            'gamma': 1.0}}
    tx, _ = make_optimizer(cfg, epochs=1, steps_per_epoch=1,
                           param_labels=labels)
    params = variables['params']
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, tx.init(params), params)
    flat = flatten_dict(dict(updates))
    np.testing.assert_allclose(np.asarray(flat[('conv2', 'kernel')]), -0.2,
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(flat[('conv1', 'kernel')]), -0.1,
                               rtol=1e-6)


def test_task_level_param_groups_end_to_end(tmp_path):
    """A config with param_groups trains through classification_task."""
    from quant_tpu.experiment import Experiment
    from quant_tpu.train.task import classification_task

    cfg = {
        'seed': 7,
        'environment': {'nchips': 1},
        'data': {'dataset': 'synthetic', 'train_batch_size': 16,
                 'test_batch_size': 32, 'train_size': 32, 'test_size': 32},
        'model': {
            'architecture': 'lenet5',
            'loss': 'nll_loss',
            'arch_config': {'conv1_filters': 2, 'conv2_filters': 3,
                            'x_quant': 'ls-1', 'w_quant': 'ls-1'},
        },
        'optimization': {
            'epochs': 1,
            'optimizer': {'algorithm': 'adam', 'lr': 0.001,
                          'weight_decay': 1e-4,
                          'param_groups': {'quantized':
                                           {'lr_scale': 0.5,
                                            'weight_decay': 0.0}}},
            'lr_scheduler': {'scheduler': 'step_lr', 'step_size': 1,
                             'gamma': 0.7},
        },
        'log': {'level': 'WARNING', 'interval': 10, 'save_model_freq': 1,
                'tensorboard': False,
                'root_experiments_dir': str(tmp_path / 'experiments')},
        'experiment_name': 'pg',
    }
    train_m, test_m = Experiment(classification_task, cfg).run()
    assert len(train_m) == 1 and len(test_m) == 1
    assert np.isfinite(train_m[0]['Loss'])
