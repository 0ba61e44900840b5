"""Packed-inference model parity: same trained variables, packed vs dense
eval forwards must agree within int8/bf16 tolerance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quant_tpu.nn import QLeNet5, QResNet


def _trained_vars(model, x):
    variables = model.init(jax.random.key(0), x, True)
    # One train pass to populate quantizer scale caches and BN stats.
    _, mut = model.apply(variables, x, True,
                         mutable=['quant_state', 'batch_stats'])
    v = dict(variables)
    v.update(mut)
    return v


@pytest.mark.parametrize('x_quant,w_quant', [
    ('ls-1', 'ls-1'), ('ls-2', 'ls-1'), ('ls-T', 'ls-1'),
    ('gf-2', 'ls-1'), ('fp', 'ls-1'), ('ls-1', 'ls-2'), ('ls-1', 'ls-T'),
    ('gf-3', 'gf-2'),  # k>2 on both sides: 6 plane-pair passes fuse
])
def test_lenet_packed_matches_dense(rng, x_quant, w_quant):
    x = jnp.asarray(rng.standard_normal((4, 28, 28, 1)), jnp.float32)
    dense = QLeNet5(conv1_filters=4, conv2_filters=6,
                    x_quant=x_quant, w_quant=w_quant,
                    clamp={'kind': 'symmetric', 'alpha': 2.0})
    variables = _trained_vars(dense, x)
    out_dense = dense.apply(variables, x, False)
    packed = dense.clone(inference_mode='packed')
    out_packed = packed.apply(variables, x, False)
    np.testing.assert_allclose(np.asarray(out_packed),
                               np.asarray(out_dense), rtol=5e-2, atol=5e-2)
    # Predictions agree.
    np.testing.assert_array_equal(np.argmax(out_packed, -1),
                                  np.argmax(out_dense, -1))


def test_resnet_packed_matches_dense(rng):
    layer = {'x_quant': 'ls-1', 'w_quant': 'ls-1',
             'clamp': {'kind': 'symmetric', 'alpha': 2.0},
             'double_shortcut': True}
    model = QResNet(
        block='xnor',
        layer0={'n_in_channels': 8, 'kernel_size': 3, 'stride': 1,
                'padding': 1, 'bias': False,
                'maxpool': {'type': 'identity'}},
        layer1=dict(layer), layer2=dict(layer), layer3=dict(layer),
        layer4=None,
        nonlins=['relu', 'relu'],
        num_blocks=[1, 1, 1],
        output_classes=10,
    )
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
    variables = _trained_vars(model, x)
    out_dense = model.apply(variables, x, False)
    out_packed = model.clone(inference_mode='packed').apply(
        variables, x, False)
    np.testing.assert_allclose(np.asarray(out_packed),
                               np.asarray(out_dense), rtol=5e-2, atol=1e-1)


def test_resnet_packed_bf16_eval_dtype(rng):
    """Packed + bf16 feature-map chain: predictions must track the fp32
    dense path (looser tolerance — bf16 BN/nonlin rounding)."""
    import jax.numpy as jnp
    layer = {'x_quant': 'ls-1', 'w_quant': 'ls-1',
             'clamp': {'kind': 'symmetric', 'alpha': 2.0},
             'double_shortcut': True}
    model = QResNet(
        block='xnor',
        layer0={'n_in_channels': 8, 'kernel_size': 3, 'stride': 1,
                'padding': 1, 'bias': False,
                'maxpool': {'type': 'identity'}},
        layer1=dict(layer), layer2=dict(layer), layer3=dict(layer),
        layer4=None,
        nonlins=['prelu', 'prelu'],
        num_blocks=[1, 1, 1],
        output_classes=10,
    )
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
    variables = _trained_vars(model, x)
    out_dense = model.apply(variables, x, False)
    packed16 = model.clone(inference_mode='packed', eval_dtype=jnp.bfloat16)
    out_p16 = packed16.apply(variables, x, False)
    assert out_p16.dtype == jnp.float32  # logits cast back
    np.testing.assert_allclose(np.asarray(out_p16), np.asarray(out_dense),
                               rtol=1e-1, atol=2e-1)


@pytest.mark.parametrize('block', ['regular_bottleneck',
                                   'xnor_bottleneck'])
def test_bottleneck_packed_matches_dense(rng, block):
    """Packed inference through 1x1 reduce/expand convs (bottleneck
    family) must track the dense path like the basic blocks do."""
    layer = {'x_quant': 'ls-2', 'w_quant': 'ls-1',
             'clamp': {'kind': 'symmetric', 'alpha': 2.0}}
    model = QResNet(
        block=block,
        layer0={'n_in_channels': 8, 'kernel_size': 3, 'stride': 1,
                'padding': 1, 'bias': False,
                'maxpool': {'type': 'identity'}},
        layer1=dict(layer), layer2=dict(layer), layer3=dict(layer),
        layer4=None,
        nonlins=['relu', 'relu'],
        num_blocks=[1, 1, 1],
        output_classes=10,
    )
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
    variables = _trained_vars(model, x)
    out_dense = model.apply(variables, x, False)
    out_packed = model.clone(inference_mode='packed').apply(
        variables, x, False)
    np.testing.assert_allclose(np.asarray(out_packed),
                               np.asarray(out_dense), rtol=5e-2, atol=1e-1)


@pytest.mark.parametrize('x_quant', ['ls-2', 'ls-T', 'gf-2'])
def test_lenet_packed_ema_multi_bit_parity(rng, x_quant):
    """Packed path with eval_only EMA scales must match the dense path for
    every multi-bit activation scheme."""
    import jax.numpy as jnp
    x = jnp.asarray(rng.standard_normal((4, 28, 28, 1)), jnp.float32)
    model = QLeNet5(conv1_filters=4, conv2_filters=6, x_quant=x_quant,
                    w_quant='ls-1', moving_average_mode='eval_only')
    variables = _trained_vars(model, x)
    out_dense = model.apply(variables, x, False)
    out_packed = model.clone(inference_mode='packed').apply(
        variables, x, False)
    np.testing.assert_allclose(np.asarray(out_packed),
                               np.asarray(out_dense), rtol=5e-2, atol=5e-2)


@pytest.mark.parametrize('x_quant,w_quant', [
    ('ls-1', 'ls-1'), ('ls-2', 'ls-1'), ('ls-T', 'ls-1'),
    ('gf-2', 'ls-1'), ('ls-1', 'ls-2'), ('ls-1', 'ls-T'),
])
def test_lenet_packed_int8_compute_bit_exact(rng, x_quant, w_quant):
    """sign_compute='int8' is integer-exact: it must match the UNFUSED
    bf16 multi-pass path bit-for-bit at f32 epilogue tolerance."""
    x = jnp.asarray(rng.standard_normal((4, 28, 28, 1)), jnp.float32)
    dense = QLeNet5(conv1_filters=4, conv2_filters=6,
                    x_quant=x_quant, w_quant=w_quant,
                    clamp={'kind': 'symmetric', 'alpha': 2.0})
    variables = _trained_vars(dense, x)
    ref = dense.clone(inference_mode='packed', pass_fusion=False).apply(
        variables, x, False)
    got = dense.clone(inference_mode='packed',
                      sign_compute='int8').apply(variables, x, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_resnet_packed_int8_compute(rng):
    layer = {'x_quant': 'ls-1', 'w_quant': 'ls-1',
             'clamp': {'kind': 'symmetric', 'alpha': 2.0},
             'double_shortcut': True}
    model = QResNet(
        block='xnor',
        layer0={'n_in_channels': 8, 'kernel_size': 3, 'stride': 1,
                'padding': 1, 'bias': False,
                'maxpool': {'type': 'identity'}},
        layer1=dict(layer), layer2=dict(layer), layer3=dict(layer),
        layer4=None, nonlins=['relu', 'relu'], num_blocks=[1, 1, 1],
        output_classes=10)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
    variables = _trained_vars(model, x)
    ref = model.clone(inference_mode='packed').apply(variables, x, False)
    got = model.clone(inference_mode='packed',
                      sign_compute='int8').apply(variables, x, False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize('x_quant,expected_like', [
    ('ls-1', 'int8'), ('ls-T', 'int8'), ('ls-2', 'bf16'),
    ('gf-2', 'bf16'),
])
def test_auto_sign_compute_picks_fastest_exact_path(rng, x_quant,
                                                    expected_like):
    """'auto' must equal int8 for single-plane schemes and the bf16 bake
    otherwise (outputs of the two paths differ at bf16 rounding level,
    so exact equality identifies which path ran)."""
    x = jnp.asarray(rng.standard_normal((4, 28, 28, 1)), jnp.float32)
    dense = QLeNet5(conv1_filters=4, conv2_filters=6,
                    x_quant=x_quant, w_quant='ls-1',
                    clamp={'kind': 'symmetric', 'alpha': 2.0})
    variables = _trained_vars(dense, x)
    auto = dense.clone(inference_mode='packed').apply(variables, x, False)
    expected = dense.clone(inference_mode='packed',
                           sign_compute=expected_like).apply(
        variables, x, False)
    np.testing.assert_array_equal(np.asarray(auto), np.asarray(expected))
