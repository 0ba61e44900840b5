"""Optimizer/schedule tests (oracle: reference
tests/utils/test_linear_lr_scheduler.py and initialization.py rescaling
semantics)."""

import numpy as np
import pytest

from quant_tpu.train.optim import make_lr_schedule, make_optimizer


def test_linear_lr_values():
    # lr = max(lr0 - step/total*(lr0+min_lr), min_lr),
    # total = (epochs-1)*steps_per_epoch  (reference linear_lr_scheduler.py)
    lr0, min_lr, epochs, spe = 1.0, 0.1, 3, 10
    sched = make_lr_schedule({'scheduler': 'linear_lr', 'lr': lr0,
                              'min_lr': min_lr}, epochs, spe)
    total = (epochs - 1) * spe
    for step in (0, 5, 10, 19, 20, 100):
        expected = max(lr0 - step / total * (lr0 + min_lr), min_lr)
        np.testing.assert_allclose(float(sched(step)), expected, rtol=1e-6)


def test_step_lr_rescaled_by_steps_per_epoch():
    sched = make_lr_schedule({'scheduler': 'step_lr', 'lr': 1.0,
                              'step_size': 1, 'gamma': 0.5}, 5, 4)
    assert float(sched(0)) == 1.0
    assert float(sched(3)) == 1.0
    assert float(sched(4)) == 0.5
    assert float(sched(8)) == 0.25


def test_multi_step_lr_milestones_in_epochs():
    sched = make_lr_schedule({'scheduler': 'multi_step_lr', 'lr': 1.0,
                              'milestones': [2, 4], 'gamma': 0.1}, 5, 10)
    assert float(sched(19)) == 1.0
    np.testing.assert_allclose(float(sched(20)), 0.1)
    np.testing.assert_allclose(float(sched(45)), 0.01, rtol=1e-6)


def test_lambda_lr_eval_string():
    sched = make_lr_schedule({'scheduler': 'lambda_lr', 'lr': 2.0,
                              'lr_lambda': 'lambda step: 1 / (1 + step)',
                              'allow_eval': True},
                             1, 1)
    assert float(sched(0)) == 2.0
    assert float(sched(1)) == 1.0


def test_lambda_lr_requires_opt_in():
    with pytest.raises(ValueError, match='allow_eval'):
        make_lr_schedule({'scheduler': 'lambda_lr', 'lr': 2.0,
                          'lr_lambda': 'lambda step: 1.0'}, 1, 1)


def test_unknown_scheduler_raises():
    with pytest.raises(ValueError):
        make_lr_schedule({'scheduler': 'bogus', 'lr': 1.0}, 1, 1)


@pytest.mark.parametrize('algorithm,extra', [
    ('sgd', {'momentum': 0.9}),
    ('adam', {}),
    ('adadelta', {}),
])
def test_optimizers_step(algorithm, extra):
    import jax.numpy as jnp
    import optax
    tx, sched = make_optimizer(
        {'optimizer': dict(algorithm=algorithm, lr=0.1,
                           weight_decay=1e-4, **extra),
         'lr_scheduler': {'scheduler': 'step_lr', 'step_size': 10,
                          'gamma': 0.9}},
        epochs=1, steps_per_epoch=10)
    params = {'w': jnp.ones((3,))}
    opt_state = tx.init(params)
    grads = {'w': jnp.ones((3,))}
    updates, opt_state = tx.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)
    assert float(jnp.sum(jnp.abs(new_params['w'] - params['w']))) > 0


def test_unknown_optimizer_raises():
    with pytest.raises(ValueError):
        make_optimizer({'optimizer': {'algorithm': 'bogus', 'lr': 1.0}},
                       1, 1)
