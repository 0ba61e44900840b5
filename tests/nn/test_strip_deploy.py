"""Stripped deployment checkpoints: fp32 kernels of packed layers gone,
packed serving output unchanged."""

import jax
import jax.numpy as jnp
import numpy as np

from quant_tpu.nn import QLeNet5, QResNet
from quant_tpu.nn.export import (export_packed_variables,
                                 packed_weight_bytes, strip_for_deployment)


def _tree_size(tree):
    return sum(leaf.size * leaf.dtype.itemsize
               for leaf in jax.tree.leaves(tree))


def _check(model, x):
    variables = model.init(jax.random.key(0), x, True)
    _, mut = model.apply(variables, x, True,
                         mutable=['quant_state', 'batch_stats'])
    variables = dict(variables)
    variables.update(mut)
    full = export_packed_variables(model, variables, x[:1])
    packed = model.clone(inference_mode='packed')
    ref = packed.apply(full, x, False)

    stripped = strip_for_deployment(full)
    got = packed.apply(stripped, x, False)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    return full, stripped


def test_lenet_stripped_serving_identical(rng):
    x = jnp.asarray(rng.standard_normal((4, 28, 28, 1)), jnp.float32)
    model = QLeNet5(conv1_filters=4, conv2_filters=6,
                    x_quant='ls-1', w_quant='ls-1',
                    clamp={'kind': 'symmetric', 'alpha': 2.0})
    full, stripped = _check(model, x)
    # The quantized conv kernel is gone; bias and fp layers remain.
    assert _tree_size(stripped['params']) < _tree_size(full['params'])
    pk, fp = packed_weight_bytes(full)
    # cin=4 wastes 28/32 pad bits per word, so only ~4x here; real
    # widths (cin >= 32) give the full 32x.
    assert pk < fp


def test_resnet_stripped_serving_identical(rng):
    layer = {'x_quant': 'ls-1', 'w_quant': 'ls-2',
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
    full, stripped = _check(model, x)

    # Every packed layer lost exactly its kernel + cached weight scales.
    def kernels(tree):
        out = []

        def walk(t, path):
            if isinstance(t, dict):
                for k, v in t.items():
                    walk(v, path + (k,))
            elif path[-1] == 'kernel':
                out.append(path)
        walk(tree, ())
        return set(out)

    gone = kernels(full['params']) - kernels(stripped['params'])
    assert len(gone) == 6  # 2 quantized convs x 3 stages
    assert all('conv1' in p or 'conv2' in p for block in gone
               for p in [block] if True)


def test_strip_requires_packed_params(rng):
    import pytest
    with pytest.raises(ValueError, match='packed_params'):
        strip_for_deployment({'params': {}})
