"""stem_conv_s2d must be EXACTLY the 7x7/s2/p3 conv it reformulates."""

import jax
import jax.numpy as jnp
import numpy as np

from quant_tpu.ops.conv import conv2d, stem_conv_s2d


def test_s2d_stem_exact_fp32():
    key = jax.random.key(0)
    kx, kw, kb = jax.random.split(key, 3)
    x = jax.random.normal(kx, (2, 224, 224, 3), jnp.float32)
    w = jax.random.normal(kw, (7, 7, 3, 64), jnp.float32) * 0.1
    b = jax.random.normal(kb, (64,), jnp.float32)

    ref = conv2d(x, w, stride=2, padding=3, bias=b)
    got = stem_conv_s2d(x, w, bias=b)
    assert got.shape == ref.shape == (2, 112, 112, 64)
    # Same multiply-adds in a different association order: allow only
    # accumulation-order rounding.
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_s2d_stem_exact_small_odd_size():
    # 30x30 exercises the right-edge padding logic (pad (4,2) -> 18
    # blocks -> 15 outputs).
    key = jax.random.key(1)
    x = jax.random.normal(key, (1, 30, 30, 3), jnp.float32)
    w = jax.random.normal(key, (7, 7, 3, 8), jnp.float32)
    ref = conv2d(x, w, stride=2, padding=3)
    got = stem_conv_s2d(x, w)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_model_stem_s2d_matches_regular():
    from quant_tpu.nn import QResNet
    layer = {'x_quant': 'ls-1', 'w_quant': 'ls-1',
             'clamp': {'kind': 'symmetric', 'alpha': 2.0},
             'double_shortcut': True}
    kwargs = dict(
        block='xnor',
        layer0={'n_in_channels': 8, 'kernel_size': 7, 'stride': 2,
                'padding': 3, 'bias': False,
                'maxpool': {'type': 'maxpool2d', 'kernel_size': 3,
                            'stride': 2, 'padding': 1}},
        layer1=dict(layer), layer2=dict(layer), layer3=dict(layer),
        layer4=None, nonlins=['prelu', 'prelu'], num_blocks=[1, 1, 1],
        output_classes=10)
    key = jax.random.key(0)
    x = jax.random.normal(key, (2, 64, 64, 3), jnp.float32)
    m0 = QResNet(**kwargs)
    v = m0.init(key, x, True)
    y0 = m0.apply(v, x, False)
    y1 = QResNet(stem_s2d=True, **kwargs).apply(v, x, False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y0),
                               rtol=1e-4, atol=1e-4)
