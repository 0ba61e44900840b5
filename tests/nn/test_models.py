"""Model smoke tests (oracle: reference tests/models/test_resnet.py:113-136)."""

import jax
import jax.numpy as jnp
import pytest

from quant_tpu.nn import QLeNet5, QResNet

CIFAR_LAYER = {
    'x_quant': 'ls-2', 'w_quant': 'ls-1',
    'clamp': {'kind': 'symmetric', 'alpha': 2.0},
}


def _resnet(block='xnor', layer4=True, **layer_extra):
    layer = dict(CIFAR_LAYER, **layer_extra)
    return QResNet(
        block=block,
        layer0={'n_in_channels': 16, 'kernel_size': 3, 'stride': 1,
                'padding': 1, 'bias': False,
                'maxpool': {'type': 'identity'}},
        layer1=dict(layer), layer2=dict(layer), layer3=dict(layer),
        layer4=dict(layer) if layer4 else None,
        nonlins=['relu', 'relu'],
        num_blocks=[1, 1, 1, 1],
        output_classes=10,
    )


def test_lenet_forward_shapes():
    model = QLeNet5(conv1_filters=4, conv2_filters=6, x_quant='ls-1',
                    w_quant='ls-1')
    x = jnp.zeros((2, 28, 28, 1))
    variables = model.init(jax.random.key(0), x, True)
    out, _ = model.apply(variables, x, True, mutable=['quant_state',
                                                      'batch_stats'])
    assert out.shape == (2, 10)
    # log_softmax rows sum to 1 in prob space.
    assert jnp.allclose(jnp.sum(jnp.exp(out), axis=1), 1.0, atol=1e-5)


@pytest.mark.parametrize('block,extra', [
    ('regular', {}),
    ('xnor', {}),
    ('xnor', {'double_shortcut': True}),
])
def test_resnet_forward_shapes(block, extra):
    model = _resnet(block=block, **extra)
    x = jnp.zeros((2, 32, 32, 3))
    variables = model.init(jax.random.key(0), x, True)
    out, _ = model.apply(variables, x, True, mutable=['quant_state',
                                                      'batch_stats'])
    assert out.shape == (2, 10)
    out_eval = model.apply(variables, x, False)
    assert out_eval.shape == (2, 10)


def test_resnet_three_stage_variant():
    model = _resnet(layer4=False)
    x = jnp.zeros((2, 32, 32, 3))
    variables = model.init(jax.random.key(0), x, True)
    out, _ = model.apply(variables, x, True, mutable=['quant_state',
                                                      'batch_stats'])
    assert out.shape == (2, 10)


def test_resnet_imagenet_stem_maxpool():
    layer = dict(CIFAR_LAYER)
    model = QResNet(
        block='xnor',
        layer0={'n_in_channels': 8, 'kernel_size': 7, 'stride': 2,
                'padding': 3, 'bias': False,
                'maxpool': {'type': 'maxpool2d', 'kernel_size': 3,
                            'stride': 2, 'padding': 1}},
        layer1=layer, layer2=layer, layer3=layer, layer4=layer,
        nonlins=['prelu', 'prelu'],
        num_blocks=[1, 1, 1, 1],
        output_classes=5,
    )
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init(jax.random.key(0), x, True)
    out, _ = model.apply(variables, x, True, mutable=['quant_state',
                                                      'batch_stats'])
    assert out.shape == (1, 5)


def test_resnet_bad_block_raises():
    model = _resnet().clone(block='bogus')
    with pytest.raises(ValueError):
        model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), True)


@pytest.mark.parametrize('block', ['regular_bottleneck',
                                   'xnor_bottleneck'])
def test_bottleneck_forward_shapes(block):
    model = _resnet(block=block)
    x = jnp.zeros((2, 32, 32, 3))
    variables = model.init(jax.random.key(0), x, True)
    out, _ = model.apply(variables, x, True, mutable=['quant_state',
                                                      'batch_stats'])
    assert out.shape == (2, 10)
    out_eval = model.apply(variables, x, False)
    assert out_eval.shape == (2, 10)
    # Expansion: layer4 block's conv3 outputs 8*width*4 channels.
    conv3 = variables['params']['layer4_block0']['conv3']['kernel']
    assert conv3.shape[-1] == 8 * 16 * 4


def test_bottleneck_double_shortcut_raises():
    model = _resnet(block='xnor_bottleneck', double_shortcut=True)
    with pytest.raises(ValueError, match='double_shortcut'):
        model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), True)


def test_resnet50_block_plan_builds():
    """ResNet-50 geometry: bottleneck block, [3,4,6,3] plan."""
    layer = dict(CIFAR_LAYER)
    model = QResNet(
        block='regular_bottleneck',
        layer0={'n_in_channels': 8, 'kernel_size': 3, 'stride': 1,
                'padding': 1, 'bias': False,
                'maxpool': {'type': 'identity'}},
        layer1=dict(layer), layer2=dict(layer), layer3=dict(layer),
        layer4=dict(layer), nonlins=['relu', 'relu'],
        num_blocks=[3, 4, 6, 3], output_classes=10)
    x = jnp.zeros((2, 32, 32, 3))
    variables = model.init(jax.random.key(0), x, True)
    n_blocks = sum(1 for k in variables['params'] if '_block' in k)
    assert n_blocks == 16
    out, _ = model.apply(variables, x, True,
                         mutable=['quant_state', 'batch_stats'])
    assert out.shape == (2, 10)


def test_resnet34_depth_builds_and_forwards():
    """Deeper family member (ResNet-34 block plan [3,4,6,3]) — the
    num_blocks knob generalizes past ResNet-18 (reference
    resnet.py:342-391 builds arbitrary per-stage depths)."""
    layer = dict(CIFAR_LAYER)
    model = QResNet(
        block='xnor',
        layer0={'n_in_channels': 16, 'kernel_size': 3, 'stride': 1,
                'padding': 1, 'bias': False,
                'maxpool': {'type': 'identity'}},
        layer1=dict(layer), layer2=dict(layer), layer3=dict(layer),
        layer4=dict(layer), nonlins=['relu', 'relu'],
        num_blocks=[3, 4, 6, 3], output_classes=10)
    x = jnp.zeros((2, 32, 32, 3))
    variables = model.init(jax.random.key(0), x, True)
    n_blocks = sum(1 for k in variables['params'] if '_block' in k)
    assert n_blocks == 16  # 3+4+6+3
    out, _ = model.apply(variables, x, True,
                         mutable=['quant_state', 'batch_stats'])
    assert out.shape == (2, 10)
