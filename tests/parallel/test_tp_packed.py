"""Packed tensor-parallel inference: the bit-packed sign words and scale
stacks shard over 'model' and the sharded forward matches the unsharded
packed forward (north star: "packed binary weights and activations
tensor-sharded over ICI")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from quant_tpu.nn import QLeNet5
from quant_tpu.nn.export import export_packed_variables
from quant_tpu.parallel import make_mesh, shard_model_variables
from quant_tpu.parallel.sharding import batch_sharding


def _trained_packed(rng):
    x = jnp.asarray(rng.standard_normal((8, 28, 28, 1)), jnp.float32)
    model = QLeNet5(conv1_filters=4, conv2_filters=16,
                    x_quant='ls-1', w_quant='ls-2',
                    clamp={'kind': 'symmetric', 'alpha': 2.0})
    variables = model.init(jax.random.key(0), x, True)
    _, mut = model.apply(variables, x, True,
                         mutable=['quant_state', 'batch_stats'])
    variables = {**variables, **mut}
    packed_vars = export_packed_variables(model, variables, x[:2])
    return model.clone(inference_mode='packed'), packed_vars, x


def test_packed_params_get_model_sharding(rng):
    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices')
    _, packed_vars, _ = _trained_packed(rng)
    mesh = make_mesh(model=2)
    sh = shard_model_variables(packed_vars, mesh, tensor_parallel=True)
    leaves = jax.tree_util.tree_leaves_with_path(sh['packed_params'])
    specs = {jax.tree_util.keystr(p): s.spec for p, s in leaves}
    w_packed_specs = [s for k, s in specs.items() if 'w_packed' in k]
    w_scale_specs = [s for k, s in specs.items() if 'w_scales' in k]
    assert w_packed_specs and all(s[-1] == 'model' for s in w_packed_specs)
    assert w_scale_specs and all(s == P(None, 'model')
                                 for s in w_scale_specs)


def test_packed_tp_forward_matches_unsharded(rng):
    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices')
    packed_model, packed_vars, x = _trained_packed(rng)
    ref = packed_model.apply(packed_vars, x, False)

    mesh = make_mesh(data=4, model=2)
    shardings = shard_model_variables(packed_vars, mesh,
                                      tensor_parallel=True)
    sharded_vars = jax.tree.map(jax.device_put, packed_vars, shardings,
                                is_leaf=lambda v: hasattr(v, 'shape'))
    xs = jax.device_put(x, batch_sharding(mesh))

    @jax.jit
    def fwd(v, xb):
        return packed_model.apply(v, xb, False)

    out = fwd(sharded_vars, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_packed_tp_bottleneck_forward_matches_unsharded(rng):
    """TP-sharded packed inference through the bottleneck family
    (1x1 reduce/expand convs shard over 'model' like the 3x3s)."""
    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices')
    from quant_tpu.nn import QResNet
    layer = {'x_quant': 'ls-1', 'w_quant': 'ls-1',
             'clamp': {'kind': 'symmetric', 'alpha': 2.0}}
    model = QResNet(
        block='regular_bottleneck',
        layer0={'n_in_channels': 8, 'kernel_size': 3, 'stride': 1,
                'padding': 1, 'bias': False,
                'maxpool': {'type': 'identity'}},
        layer1=dict(layer), layer2=dict(layer), layer3=dict(layer),
        layer4=None, nonlins=['relu', 'relu'], num_blocks=[1, 1, 1],
        output_classes=10)
    x = jnp.asarray(rng.standard_normal((8, 16, 16, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), x, True)
    _, mut = model.apply(variables, x, True,
                         mutable=['quant_state', 'batch_stats'])
    variables = {**variables, **mut}
    packed_vars = export_packed_variables(model, variables, x[:2])
    packed_model = model.clone(inference_mode='packed')
    ref = packed_model.apply(packed_vars, x, False)

    mesh = make_mesh(data=4, model=2)
    shardings = shard_model_variables(packed_vars, mesh,
                                      tensor_parallel=True)
    sharded_vars = jax.tree.map(jax.device_put, packed_vars, shardings,
                                is_leaf=lambda v: hasattr(v, 'shape'))
    xs = jax.device_put(x, batch_sharding(mesh))

    @jax.jit
    def fwd(v, xb):
        return packed_model.apply(v, xb, False)

    out = fwd(sharded_vars, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_folded_packed_tp_forward_matches_unsharded(rng):
    """Threshold-folded serving composes with TP: thresholds/flips/va
    are per-INPUT-channel (replicated), sign words + scales shard over
    'model', and the sharded folded forward equals the unsharded one."""
    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices')
    from quant_tpu.nn import QResNet
    from quant_tpu.nn.export import fold_xnor_thresholds

    layer = {'x_quant': 'ls-1', 'w_quant': 'ls-1',
             'clamp': {'kind': 'symmetric', 'alpha': 2.0},
             'double_shortcut': True}
    model = QResNet(
        block='xnor',
        layer0={'n_in_channels': 8, 'kernel_size': 3, 'stride': 1,
                'padding': 1, 'bias': False,
                'maxpool': {'type': 'identity'}},
        layer1=dict(layer), layer2=dict(layer), layer3=dict(layer),
        layer4=None, nonlins=['prelu', 'prelu'], num_blocks=[1, 1, 1],
        output_classes=16, moving_average_mode='eval_only')
    x = jnp.asarray(rng.standard_normal((8, 16, 16, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), x, True)
    _, mut = model.apply(variables, x, True,
                         mutable=['quant_state', 'batch_stats'])
    variables = {**variables, **mut}
    packed = model.clone(inference_mode='packed')
    pv = export_packed_variables(packed, variables, x[:2])
    fv = fold_xnor_thresholds(packed, pv)
    folded = packed.clone(bn_fold=True)
    ref = folded.apply(fv, x, False)

    mesh = make_mesh(data=4, model=2)
    shardings = shard_model_variables(fv, mesh, tensor_parallel=True)
    # Fold metadata is per-input-channel: must be replicated.
    t_specs = [s.spec for p, s in jax.tree_util.tree_leaves_with_path(
        shardings['packed_params'])
        if 'x_thresh' in jax.tree_util.keystr(p)]
    assert t_specs and all(s == P() for s in t_specs)
    sharded_vars = jax.tree.map(jax.device_put, fv, shardings,
                                is_leaf=lambda v: hasattr(v, 'shape'))
    xs = jax.device_put(x, batch_sharding(mesh))

    @jax.jit
    def fwd(v, xb):
        return folded.apply(v, xb, False)

    out = fwd(sharded_vars, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
