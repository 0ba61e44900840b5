"""Train/eval engine tests (oracle: reference tests/common/test_training.py
loop tests + test_tasks.py incremental chains, scaled to tiny synthetic
data)."""

from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quant_tpu.data import SyntheticDataLoader
from quant_tpu.nn import QLeNet5
from quant_tpu.train import (
    TrainState, get_loss_fn, make_eval_step, make_optimizer, make_train_step,
    train_epoch, evaluate,
)


def _tiny_setup(x_quant='ls-1', w_quant='ls-1', epochs=1):
    model = QLeNet5(conv1_filters=2, conv2_filters=3,
                    x_quant=x_quant, w_quant=w_quant)
    loader = SyntheticDataLoader(train_batch_size=16, test_batch_size=32,
                                 train_size=64, test_size=32)
    train_loader = loader.get_train_loader()
    sample = next(iter(train_loader))[0]
    variables = model.init(jax.random.key(0), jnp.asarray(sample), True)
    tx, sched = make_optimizer(
        {'optimizer': {'algorithm': 'adadelta', 'lr': 1.0},
         'lr_scheduler': {'scheduler': 'step_lr', 'step_size': 1,
                          'gamma': 0.7}},
        epochs, len(train_loader))
    state = TrainState.create(model.apply, variables, tx)
    return model, loader, state, sched


def test_train_epoch_reduces_loss_and_calls_hooks():
    model, loader, state, sched = _tiny_setup()
    loss_fn = get_loss_fn('nll_loss')
    step = make_train_step(loss_fn, donate=False)
    hook = mock.MagicMock()

    train_loader = loader.get_train_loader()
    state, m1 = train_epoch(step, state, train_loader, epoch=1,
                            hooks=[hook], lr_schedule=sched,
                            steps_per_epoch=len(train_loader))
    assert hook.called
    state, m2 = train_epoch(step, state, train_loader, epoch=2,
                            lr_schedule=sched,
                            steps_per_epoch=len(train_loader))
    assert m2['Loss'] < m1['Loss']
    assert int(state.step) == 2 * len(train_loader)


def test_evaluate_computes_metrics():
    model, loader, state, _ = _tiny_setup()
    eval_step = make_eval_step(get_loss_fn('nll_loss'))
    m = evaluate(eval_step, state, loader.get_test_loader())
    assert set(m) == {'Loss', 'Top-1 Accuracy', 'Top-5 Accuracy'}
    assert 0.0 <= m['Top-1 Accuracy'] <= 1.0
    assert m['Top-1 Accuracy'] <= m['Top-5 Accuracy']


def test_quant_state_updates_during_train_not_eval():
    model, loader, state, _ = _tiny_setup()
    step = make_train_step(get_loss_fn('nll_loss'), donate=False)
    before = jax.tree.map(lambda x: np.asarray(x).copy(), state.quant_state)
    data, target = next(iter(loader.get_train_loader()))
    from quant_tpu.train.metrics import init_metric_state
    new_state, _, _ = step(state, jnp.asarray(data), jnp.asarray(target),
                           init_metric_state())
    changed = jax.tree.map(
        lambda a, b: not np.allclose(np.asarray(a), np.asarray(b)),
        before, new_state.quant_state)
    assert any(jax.tree.leaves(changed))


def test_kd_train_step_runs():
    model, loader, state, _ = _tiny_setup(x_quant='fp', w_quant='fp')
    from quant_tpu.train.kd import kd_criterion

    teacher_vars = state.model_variables

    def teacher_apply(data):
        out, _ = model.apply(teacher_vars, data, True,
                             mutable=['batch_stats', 'quant_state'])
        return jax.lax.stop_gradient(out)

    def kd_loss(out, t_out, target):
        return kd_criterion(out, t_out, target, temperature=5.0)

    step = make_train_step(kd_loss, teacher_apply, donate=False)
    data, target = next(iter(loader.get_train_loader()))
    from quant_tpu.train.metrics import init_metric_state
    new_state, metrics, loss = step(state, jnp.asarray(data),
                                    jnp.asarray(target), init_metric_state())
    assert np.isfinite(float(loss))


def test_data_parallel_step_on_virtual_mesh():
    """DP over the 8-device CPU mesh: same math, batch sharded over 'data'
    (the reference has no distributed tests at all — SURVEY.md §4).

    Exact param parity is checked on the fp model only: quantized layers
    have discontinuous STE gradients, so ULP-level reduction-order
    differences between the sharded and unsharded programs can flip mask
    bits (loss parity still holds for both)."""
    from quant_tpu.parallel import make_mesh
    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices')
    mesh = make_mesh()
    from quant_tpu.train.metrics import init_metric_state

    # fp model: bitwise-comparable.
    model, loader, state, _ = _tiny_setup(x_quant='fp', w_quant='fp')
    loss_fn = get_loss_fn('nll_loss')
    step_sharded = make_train_step(loss_fn, mesh=mesh, donate=False)
    step_local = make_train_step(loss_fn, donate=False)
    data, target = next(iter(loader.get_train_loader()))
    s1, m1, l1 = step_sharded(state, jnp.asarray(data), jnp.asarray(target),
                              init_metric_state())
    s2, m2, l2 = step_local(state, jnp.asarray(data), jnp.asarray(target),
                            init_metric_state())
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for p1, p2 in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                                   rtol=1e-4, atol=1e-6)

    # Quantized model: sharded step runs and loss matches closely.
    model, loader, state, _ = _tiny_setup()
    stepq = make_train_step(loss_fn, mesh=mesh, donate=False)
    stepl = make_train_step(loss_fn, donate=False)
    sq, _, lq = stepq(state, jnp.asarray(data), jnp.asarray(target),
                      init_metric_state())
    sl, _, ll = stepl(state, jnp.asarray(data), jnp.asarray(target),
                      init_metric_state())
    np.testing.assert_allclose(float(lq), float(ll), rtol=1e-4)
