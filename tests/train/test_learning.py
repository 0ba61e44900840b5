"""End-to-end learnability: the full stack must actually learn.

No real datasets exist in this environment (zero egress), so the oracle
is a synthetic but genuinely learnable task: labels are the argmax of a
fixed random linear projection of the image. A LeNet must climb from
~chance to high train accuracy within a few epochs — exercising the STE
gradients, the quantizer state updates, BN, the optimizer and the LR
schedule together.
"""

import jax
import jax.numpy as jnp
import numpy as np

from quant_tpu.data.loaders import BatchIterable
from quant_tpu.nn import QLeNet5
from quant_tpu.train import (
    TrainState, get_loss_fn, make_optimizer, make_train_step, train_epoch,
)


def _separable_data(n, num_classes=4, seed=0):
    # Low-frequency class templates (7x7 upsampled 4x) so the signal
    # survives LeNet's pooling stages.
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, 28, 28, 1)).astype(np.float32)
    t = np.random.default_rng(99).standard_normal((num_classes, 7, 7))
    templates = np.kron(t, np.ones((4, 4))).reshape(num_classes, -1)
    y = np.argmax(x.reshape(n, -1) @ templates.T, axis=1).astype(np.int64)
    return x, y


def _train(x_quant, w_quant, epochs, lr=1.0):
    x, y = _separable_data(1024)
    loader = BatchIterable(x, y, batch_size=64, shuffle=True, seed=0)
    model = QLeNet5(conv1_filters=8, conv2_filters=16, output_classes=4,
                    x_quant=x_quant, w_quant=w_quant)
    variables = model.init(jax.random.key(0), jnp.asarray(x[:2]), True)
    tx, sched = make_optimizer(
        {'optimizer': {'algorithm': 'adadelta', 'lr': lr},
         'lr_scheduler': {'scheduler': 'step_lr', 'step_size': 10 ** 6,
                          'gamma': 1.0}},
        epochs, len(loader))
    state = TrainState.create(model.apply, variables, tx)
    step = make_train_step(get_loss_fn('nll_loss'), donate=False)
    metrics = {}
    for epoch in range(1, epochs + 1):
        state, metrics = train_epoch(step, state, loader, epoch,
                                     log_interval=1000)
    return state, metrics


def test_fp_lenet_learns_synthetic_task():
    state, metrics = _train('fp', 'fp', epochs=5)
    # Measured ~0.62 after 5 epochs; chance is 0.25.
    assert metrics['Top-1 Accuracy'] > 0.5, metrics


def test_binary_lenet_learns_synthetic_task():
    # Quantized net learns more slowly but must clearly beat chance (0.25).
    state, metrics = _train('ls-1', 'ls-1', epochs=6)
    # Measured ~0.53 after 6 epochs; chance is 0.25.
    assert metrics['Top-1 Accuracy'] > 0.4, metrics
