"""Spatial partitioning (H-axis sharding with halo exchange).

Parity oracles: the unsharded ops in quant_tpu.ops.conv. Covers every
conv/pool geometry the model zoo uses (stem 7x7/s2/p3, body 3x3/s1/p1 and
3x3/s2/p1, downsample 1x1/s2/p0, maxpool 3x3/s2/p1), the GSPMD-sharded
full packed model, and the geometry validation errors.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from quant_tpu.ops.conv import conv2d, max_pool2d
from quant_tpu.parallel.spatial import (
    halo_exchange_conv2d, halo_exchange_max_pool2d, spatial_sharding,
)


def _space_mesh(p=4):
    if len(jax.devices()) < p:
        pytest.skip(f'needs {p} virtual devices')
    devs = np.asarray(jax.devices()[:p])
    return Mesh(devs, ('space',))


GEOMETRIES = [
    # (kh, kw, stride, padding) — every shape the model zoo uses
    (3, 3, 1, 1),    # body conv
    (3, 3, 2, 1),    # body downsampling conv
    (1, 1, 2, 0),    # fp shortcut downsample
    (7, 7, 2, 3),    # ImageNet stem
    (5, 5, 1, 2),    # LeNet-style
]


@pytest.mark.parametrize('kh,kw,stride,padding', GEOMETRIES)
def test_halo_conv_matches_unsharded(rng, kh, kw, stride, padding):
    mesh = _space_mesh()
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 8)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((kh, kw, 8, 16)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((16,)), jnp.float32)
    ref = conv2d(x, w, stride=stride, padding=padding, bias=b)
    xs = jax.device_put(x, spatial_sharding(mesh))
    out = halo_exchange_conv2d(xs, w, mesh=mesh, stride=stride,
                               padding=padding, bias=b)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_halo_maxpool_matches_unsharded(rng):
    mesh = _space_mesh()
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 8)), jnp.float32)
    ref = max_pool2d(x, kernel_size=3, stride=2, padding=1)
    xs = jax.device_put(x, spatial_sharding(mesh))
    out = halo_exchange_max_pool2d(xs, mesh=mesh, kernel_size=3,
                                   stride=2, padding=1)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_halo_conv_jits_and_stays_sharded(rng):
    mesh = _space_mesh()
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 8)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 8)), jnp.float32)
    xs = jax.device_put(x, spatial_sharding(mesh))

    @jax.jit
    def two_layer(xv, wv):
        y = halo_exchange_conv2d(xv, wv, mesh=mesh, stride=1, padding=1)
        return halo_exchange_conv2d(y, wv, mesh=mesh, stride=1, padding=1)

    out = two_layer(xs, w)
    ref = conv2d(conv2d(x, w, stride=1, padding=1), w, stride=1, padding=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
    # Output H stays band-sharded over 'space'
    assert out.sharding.spec[1] == 'space'


def test_halo_conv_with_batch_axis(rng):
    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices')
    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ('data', 'space'))
    x = jnp.asarray(rng.standard_normal((4, 16, 16, 8)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 16)), jnp.float32)
    ref = conv2d(x, w, stride=1, padding=1)
    xs = jax.device_put(x, spatial_sharding(mesh, batch_axis='data'))
    out = halo_exchange_conv2d(xs, w, mesh=mesh, batch_axis='data',
                               stride=1, padding=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_geometry_validation():
    mesh = _space_mesh()
    x = jnp.zeros((1, 16, 16, 4), jnp.float32)
    w_valid = jnp.zeros((3, 3, 4, 4), jnp.float32)
    # VALID conv shrinks H: rejected
    with pytest.raises(ValueError, match='shape-preserving'):
        halo_exchange_conv2d(x, w_valid, mesh=mesh, stride=1, padding=0)
    # H not divisible by shard count
    with pytest.raises(ValueError, match='divide'):
        halo_exchange_conv2d(jnp.zeros((1, 18, 16, 4)), w_valid,
                             mesh=mesh, stride=1, padding=1)
    # local band not divisible by stride
    with pytest.raises(ValueError, match='stride'):
        halo_exchange_conv2d(jnp.zeros((1, 12, 16, 4)), w_valid,
                             mesh=mesh, stride=2, padding=1)


def test_gspmd_spatial_packed_model(rng):
    """Idiomatic path: H-sharded input through the full packed ResNet —
    GSPMD partitions the convs itself; parity vs the replicated run."""
    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices')
    from quant_tpu.nn import QResNet
    from quant_tpu.nn.export import export_packed_variables

    layer = {'x_quant': 'ls-1', 'w_quant': 'ls-1',
             'clamp': {'kind': 'symmetric', 'alpha': 2.0}}
    model = QResNet(
        block='xnor',
        layer0={'n_in_channels': 16, 'kernel_size': 3, 'stride': 1,
                'padding': 1, 'bias': False,
                'maxpool': {'type': 'identity'}},
        layer1=dict(layer), layer2=dict(layer), layer3=dict(layer),
        layer4=dict(layer), nonlins=['prelu', 'prelu'],
        num_blocks=[1, 1, 1, 1], output_classes=10)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), x, True)
    _, mut = model.apply(variables, x, True,
                         mutable=['quant_state', 'batch_stats'])
    variables = {**variables, **mut}
    packed_model = model.clone(inference_mode='packed')
    packed_vars = export_packed_variables(model, variables, x)

    ref = packed_model.apply(packed_vars, x, False)

    devs = np.asarray(jax.devices()[:4])
    mesh = Mesh(devs, ('space',))
    xs = jax.device_put(x, spatial_sharding(mesh))
    vars_rep = jax.device_put(packed_vars, NamedSharding(mesh, P()))

    @jax.jit
    def fwd(v, xb):
        return packed_model.apply(v, xb, False)

    out = fwd(vars_rep, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
