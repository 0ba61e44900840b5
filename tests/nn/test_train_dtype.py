"""Mixed-precision training (arch_config.train_dtype = bfloat16).

Contract (full AMP): the whole training forward chain — quantized conv
operands and outputs, BN, nonlins, shortcuts, stem, head — runs in
train_dtype; the quantizer scale solves ALWAYS run f32 (ops/quantize.py
upcasts internally), BN statistics are computed in f32 (flax), and
params / grads / optimizer state / loss stay f32. Single-layer outputs
match the f32 path to bf16 rounding and the scale solves stay
bit-identical on f32 inputs; whole-model parity is NOT asserted
(binarize() downstream of a rounded feature map legitimately flips
near-zero signs), instead the model must LEARN in bf16 like in f32.
"""

import jax
import jax.numpy as jnp
import numpy as np

from quant_tpu.nn import QLeNet5, QResNet
from quant_tpu.nn.layers import QuantConv2d

_LAYER = {'x_quant': 'ls-2', 'w_quant': 'ls-1',
          'clamp': {'kind': 'symmetric', 'alpha': 2.0}}
_KW = dict(
    block='xnor',
    layer0={'n_in_channels': 8, 'kernel_size': 3, 'stride': 1,
            'padding': 1, 'bias': False, 'maxpool': {'type': 'identity'}},
    layer1=dict(_LAYER), layer2=dict(_LAYER), layer3=dict(_LAYER),
    layer4=dict(_LAYER), nonlins=['prelu', 'prelu'],
    num_blocks=[1, 1, 1, 1], output_classes=10)


def test_single_layer_scales_exact_output_bf16_close(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32)
    kw = dict(features=8, kernel_size=3, x_quant='ls-2', w_quant='ls-1',
              clamp={'kind': 'symmetric', 'alpha': 2.0}, padding=1)
    f32 = QuantConv2d(**kw)
    bf16 = QuantConv2d(**kw, train_dtype='bfloat16')
    variables = f32.init(jax.random.key(0), x, True)
    out0, mut0 = f32.apply(variables, x, True, mutable=['quant_state'])
    out1, mut1 = bf16.apply(variables, x, True, mutable=['quant_state'])
    # The chain stays in train_dtype (the downstream BN/nonlin consume
    # it at reduced precision; the model upcasts only at the loss).
    assert out1.dtype == jnp.bfloat16
    # The scale solves run in f32 on the unrounded input: bit-identical.
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)),
        mut0['quant_state'], mut1['quant_state'])
    # One layer deviates only by bf16 operand/output rounding.
    scale = float(jnp.max(jnp.abs(out0)))
    np.testing.assert_allclose(np.asarray(out1, np.float32),
                               np.asarray(out0),
                               atol=0.02 * scale, rtol=0.02)


def test_eval_path_unaffected(rng):
    """train_dtype must not change eval-mode outputs at all."""
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
    f32 = QResNet(**_KW)
    bf16 = QResNet(**_KW, train_dtype='bfloat16')
    variables = f32.init(jax.random.key(0), x, True)
    _, mut = f32.apply(variables, x, True,
                       mutable=['quant_state', 'batch_stats'])
    variables = {**variables, **mut}
    np.testing.assert_array_equal(
        np.asarray(f32.apply(variables, x, False)),
        np.asarray(bf16.apply(variables, x, False)))


def test_chain_runs_bf16(rng):
    """The inter-conv chain (block outputs, logits input) runs in
    train_dtype — the AMP contract, and the source of the HBM win."""
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
    model = QResNet(**_KW, train_dtype='bfloat16')
    variables = model.init(jax.random.key(0), x, True)
    out, state = model.apply(variables, x, True,
                             mutable=['quant_state', 'batch_stats'],
                             capture_intermediates=True)
    assert out.dtype == jnp.float32  # loss-side logits stay f32
    inter = state['intermediates']
    for name in ('layer1_block0', 'layer4_block0', 'conv1', 'fc'):
        y = jax.tree.leaves(inter[name]['__call__'])[0]
        assert y.dtype == jnp.bfloat16, (name, y.dtype)
    # Scale state stays f32 (solves are upcast inside the quantizers).
    for leaf in jax.tree.leaves(state['quant_state']):
        assert leaf.dtype in (jnp.float32, jnp.int32)


def test_bf16_model_grads_finite_and_f32(rng):
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
    model = QResNet(**_KW, train_dtype='bfloat16')
    variables = model.init(jax.random.key(0), x, True)

    def loss(params):
        out, _ = model.apply({**variables, 'params': params}, x, True,
                             mutable=['quant_state', 'batch_stats'])
        return jnp.mean(out ** 2)

    grads = jax.grad(loss)(variables['params'])
    for v in jax.tree.leaves(grads):
        assert v.dtype == jnp.float32
        assert np.isfinite(np.asarray(v)).all()


def test_composes_with_remat(rng):
    """remat + train_dtype together (the TPU recipe config enables
    both): grads finite, f32, same pytree as the plain model."""
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
    plain = QResNet(**_KW)
    both = QResNet(**_KW, remat=True, train_dtype='bfloat16')
    variables = plain.init(jax.random.key(0), x, True)

    def loss(params):
        out, _ = both.apply({**variables, 'params': params}, x, True,
                            mutable=['quant_state', 'batch_stats'])
        return jnp.mean(out ** 2)

    grads = jax.grad(loss)(variables['params'])
    assert (jax.tree.structure(grads)
            == jax.tree.structure(variables['params']))
    for v in jax.tree.leaves(grads):
        assert v.dtype == jnp.float32
        assert np.isfinite(np.asarray(v)).all()


def test_bf16_lenet_learns_synthetic_task():
    """The mixed-precision model must learn like the f32 one (the real
    acceptance criterion — whole-model logit parity is not expected)."""
    from quant_tpu.data.loaders import BatchIterable
    from quant_tpu.train import (
        TrainState, get_loss_fn, make_optimizer, make_train_step,
        train_epoch,
    )
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1024, 28, 28, 1)).astype(np.float32)
    t = np.random.default_rng(99).standard_normal((4, 7, 7))
    templates = np.kron(t, np.ones((4, 4))).reshape(4, -1)
    y = np.argmax(x.reshape(len(x), -1) @ templates.T, axis=1)

    loader = BatchIterable(x, y.astype(np.int64), batch_size=64,
                           shuffle=True, seed=0)
    model = QLeNet5(conv1_filters=8, conv2_filters=16, output_classes=4,
                    x_quant='ls-1', w_quant='ls-1',
                    train_dtype='bfloat16')
    variables = model.init(jax.random.key(0), jnp.asarray(x[:2]), True)
    tx, _ = make_optimizer(
        {'optimizer': {'algorithm': 'adadelta', 'lr': 1.0},
         'lr_scheduler': {'scheduler': 'step_lr', 'step_size': 10 ** 6,
                          'gamma': 1.0}}, 8, len(loader))
    state = TrainState.create(model.apply, variables, tx)
    step = make_train_step(get_loss_fn('nll_loss'), donate=False)
    metrics = {}
    for epoch in range(1, 9):
        state, metrics = train_epoch(step, state, loader, epoch,
                                     log_interval=1000)
    # f32 path reaches ~0.45 after 8 epochs (test_learning.py); chance
    # is 0.25 — bf16 must clearly learn too.
    assert metrics['Top-1 Accuracy'] > 0.4, metrics
