"""QuantConv2d / quantizer-module tests.

Oracles mirrored from the reference suite (SURVEY.md §4):
tests/binary/test_binary_conv.py (fp-scheme equivalence incl. gradients,
scheme validation), tests/binary/test_weight_quantization.py (train-caches/
eval-reuses), tests/binary/test_activation_quantization.py (EMA modes with
hand-computed values).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quant_tpu.nn import ActivationQuantizer, QuantConv2d, WeightQuantizer
from quant_tpu.ops import quantizer_ls_1
from quant_tpu.ops.conv import conv2d


def _init_and_apply(module, x, train, variables=None, rngs=None):
    if variables is None:
        variables = module.init(jax.random.key(0), x, train)
    out, mut = module.apply(variables, x, train,
                            mutable=['quant_state', 'batch_stats'])
    new_vars = dict(variables)
    new_vars.update(mut)
    return out, new_vars


def test_fp_scheme_equals_plain_conv(rng):
    """fp/fp QuantConv2d == plain conv2d, forward and gradient
    (reference tests/binary/test_binary_conv.py:18-38)."""
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 3)), jnp.float32)
    layer = QuantConv2d(4, 3, x_quant='fp', w_quant='fp', padding=1)
    variables = layer.init(jax.random.key(0), x, True)

    def f_quant(v, t):
        return jnp.sum(layer.apply(v, t, True,
                                   mutable=['quant_state'])[0] ** 2)

    def f_plain(v, t):
        return jnp.sum(conv2d(t, v['params']['kernel'], padding=1,
                              bias=v['params']['bias']) ** 2)

    np.testing.assert_allclose(f_quant(variables, x), f_plain(variables, x),
                               rtol=1e-5)
    g_q = jax.grad(f_quant, argnums=1)(variables, x)
    g_p = jax.grad(f_plain, argnums=1)(variables, x)
    np.testing.assert_allclose(np.asarray(g_q), np.asarray(g_p), rtol=1e-5)


@pytest.mark.parametrize('x_quant', ['fp', 'ls-1', 'ls-2', 'ls-T', 'gf-2'])
@pytest.mark.parametrize('w_quant', ['fp', 'ls-1', 'ls-2', 'ls-T', 'gf-3'])
def test_all_scheme_pairs_construct_and_run(rng, x_quant, w_quant):
    x = jnp.asarray(rng.standard_normal((2, 6, 6, 3)), jnp.float32)
    layer = QuantConv2d(4, 3, x_quant=x_quant, w_quant=w_quant, padding=1,
                        clamp={'kind': 'symmetric', 'alpha': 2.0})
    out, variables = _init_and_apply(layer, x, train=True)
    assert out.shape == (2, 6, 6, 4)
    out_eval, _ = layer.apply(variables, x, False, mutable=[])
    assert out_eval.shape == (2, 6, 6, 4)


def test_invalid_scheme_raises(rng):
    x = jnp.zeros((1, 4, 4, 2))
    for bad in ('ls-3', 'abc', 'gf', 'gf-'):
        with pytest.raises(ValueError):
            QuantConv2d(2, 3, x_quant=bad).init(jax.random.key(0), x, True)
        with pytest.raises(ValueError):
            QuantConv2d(2, 3, w_quant=bad).init(jax.random.key(0), x, True)


def test_weight_quantizer_caches_in_train_uses_cache_in_eval(rng):
    w1 = jnp.asarray(rng.standard_normal((4, 18)), jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((4, 18)), jnp.float32)
    q = WeightQuantizer(scheme='ls-1', size=4)
    variables = q.init(jax.random.key(0), w1, True)

    # Train on w1: caches scales of w1.
    _, variables = _init_and_apply(q, w1, True, variables)
    v1_w1, _ = quantizer_ls_1(w1)
    np.testing.assert_allclose(
        np.asarray(variables['quant_state']['vs']), np.asarray(v1_w1),
        rtol=1e-6)

    # Eval on w2: must use w1's cached scales, not recompute.
    out_eval, _ = q.apply(variables, w2, False, mutable=[])
    _, expected = quantizer_ls_1(w2, v1_w1[0])
    np.testing.assert_allclose(np.asarray(out_eval), np.asarray(expected),
                               rtol=1e-6)
    # And the cache must be unchanged after a train pass on w2 re-runs.
    _, variables2 = _init_and_apply(q, w2, True, variables)
    v1_w2, _ = quantizer_ls_1(w2)
    np.testing.assert_allclose(
        np.asarray(variables2['quant_state']['vs']), np.asarray(v1_w2),
        rtol=1e-6)


def test_activation_ema_off_mode_has_no_state(rng):
    x = jnp.asarray(rng.standard_normal((3, 4, 4, 2)), jnp.float32)
    q = ActivationQuantizer(scheme='ls-1', moving_average_mode='off')
    variables = q.init(jax.random.key(0), x, True)
    assert 'quant_state' not in variables or not variables['quant_state']


def test_activation_ema_eval_only_tracks_and_applies(rng):
    momentum = 0.5
    q = ActivationQuantizer(scheme='ls-1', moving_average_mode='eval_only',
                            moving_average_momentum=momentum)
    x1 = jnp.asarray(rng.standard_normal((3, 4, 4, 2)), jnp.float32)
    x2 = jnp.asarray(rng.standard_normal((3, 4, 4, 2)), jnp.float32)
    variables = q.init(jax.random.key(0), x1, True)

    out1, variables = _init_and_apply(q, x1, True, variables)
    # Training output is the per-batch quantization (EMA only tracked).
    _, expected1 = quantizer_ls_1(x1)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(expected1),
                               rtol=1e-6)
    m1 = float(jnp.mean(quantizer_ls_1(x1)[0]))
    np.testing.assert_allclose(
        float(variables['quant_state']['ema'][0]), m1, rtol=1e-6)

    out2, variables = _init_and_apply(q, x2, True, variables)
    m2 = float(jnp.mean(quantizer_ls_1(x2)[0]))
    ema = momentum * m1 + (1 - momentum) * m2
    np.testing.assert_allclose(
        float(variables['quant_state']['ema'][0]), ema, rtol=1e-6)
    assert int(variables['quant_state']['ema_count']) == 2

    # Eval applies the EMA scale to every sample.
    out_eval, _ = q.apply(variables, x2, False, mutable=[])
    _, expected_eval = quantizer_ls_1(
        x2, jnp.full((x2.shape[0],), ema))
    np.testing.assert_allclose(np.asarray(out_eval),
                               np.asarray(expected_eval), rtol=1e-5)


def test_activation_ema_train_and_eval_applies_in_train(rng):
    q = ActivationQuantizer(scheme='ls-1',
                            moving_average_mode='train_and_eval',
                            moving_average_momentum=0.9)
    x = jnp.asarray(rng.standard_normal((3, 4, 4, 2)), jnp.float32)
    variables = q.init(jax.random.key(0), x, True)
    out, variables = _init_and_apply(q, x, True, variables)
    m = float(jnp.mean(quantizer_ls_1(x)[0]))
    _, expected = quantizer_ls_1(x, jnp.full((x.shape[0],), m))
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=1e-5)


def test_quant_conv_tiny_hand_computed():
    """ls-1/ls-1 on constant tensors is exactly computable
    (reference tests/binary/test_binary_conv.py:54-67)."""
    x = jnp.full((1, 4, 4, 1), 2.0)
    layer = QuantConv2d(1, 3, x_quant='ls-1', w_quant='ls-1', padding=0,
                        use_bias=False)
    variables = layer.init(jax.random.key(0), x, True)
    k = jnp.full((3, 3, 1, 1), -0.5)
    variables = {'params': {'kernel': k}}
    out, _ = layer.apply(variables, x, True, mutable=['quant_state'])
    # x_q = 2*sign = +2 everywhere; w_q = 0.5*(-1) = -0.5; sum over 3x3 = -9
    # -> 2 * -0.5 * 9 = -9.
    np.testing.assert_allclose(np.asarray(out), -9.0, rtol=1e-6)
