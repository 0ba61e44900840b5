"""Quantizer property tests (oracle: reference tests/binary/test_quantization.py).

Same structure as the reference test suite: optimality vs suboptimal scales,
cost ordering between schemes, monotonicity in bits, and degenerate inputs.
"""

import jax
import jax.numpy as jnp
import numpy as np

from quant_tpu.ops import (
    binarize, binary_sign, clamp_identity, clamp_symmetric,
    quantizer_fp, quantizer_gf, quantizer_ls_1, quantizer_ls_2,
    quantizer_ls_ternary,
)

SHAPE = (200, 3, 16, 16)


def _x(rng, shape=SHAPE):
    return jnp.asarray(rng.standard_normal(shape), jnp.float32)


def _costs(x_q, x):
    d = (x_q - x).reshape(x.shape[0], -1)
    return jnp.linalg.norm(d, axis=1)


def test_clamps():
    x = jnp.array([-1.0, 0.0, 1.0, 2.0])
    np.testing.assert_array_equal(np.asarray(clamp_identity(x)), np.asarray(x))
    np.testing.assert_array_equal(
        np.asarray(clamp_symmetric(x, 1)), [-1, 0, 1, 1])
    np.testing.assert_array_equal(
        np.asarray(clamp_symmetric(x, 0.5)), [-0.5, 0, 0.5, 0.5])
    np.testing.assert_array_equal(
        np.asarray(clamp_symmetric(x, 3)), [-1, 0, 1, 2])


def test_quantizer_fp_identity():
    x = jnp.array([[-1.0, 0.0], [1.0, 2.0]])
    _, x_q = quantizer_fp(x)
    np.testing.assert_array_equal(np.asarray(x_q), np.asarray(x))


def test_ls1_optimal_vs_random_scales(rng):
    x = _x(rng)
    _, x_q = quantizer_ls_1(x)
    assert x_q.shape == x.shape

    sub_v = jnp.abs(jnp.asarray(rng.standard_normal((SHAPE[0], 1, 1, 1)),
                                jnp.float32))
    sub_q = sub_v * binarize(x)
    assert jnp.all(_costs(x_q, x) <= _costs(sub_q, x) + 1e-5)


def test_ls2_optimal_vs_random_candidate_scales(rng):
    x = _x(rng)
    _, x_q = quantizer_ls_2(x, skip=1)
    assert x_q.shape == x.shape

    flat = x.reshape(SHAPE[0], -1)
    idx = rng.integers(0, flat.shape[1], SHAPE[0])
    sub_v1 = jnp.abs(flat[jnp.arange(SHAPE[0]), idx])[:, None]
    s2 = flat - sub_v1 * binary_sign(flat)
    sub_v2 = jnp.mean(jnp.abs(s2), axis=-1, keepdims=True)

    b1 = binarize(x)
    sub_v1 = sub_v1.reshape(-1, 1, 1, 1)
    sub_v2 = sub_v2.reshape(-1, 1, 1, 1)
    sub_q = sub_v1 * b1 + sub_v2 * binarize(x - sub_v1 * b1)
    assert jnp.all(_costs(x_q, x) <= _costs(sub_q, x) + 1e-5)


def test_lsT_optimal_vs_random_candidate_scales(rng):
    x = _x(rng)
    _, x_q = quantizer_ls_ternary(x, skip=1)

    flat = x.reshape(SHAPE[0], -1)
    idx = rng.integers(0, flat.shape[1], SHAPE[0])
    sub_v1 = jnp.abs(flat[jnp.arange(SHAPE[0]), idx]).reshape(-1, 1, 1, 1)
    b1 = binarize(x)
    sub_q = sub_v1 * b1 + sub_v1 * binarize(x - sub_v1 * b1)
    assert jnp.all(_costs(x_q, x) <= _costs(sub_q, x) + 1e-5)


def test_lsT_all_inputs_equal(rng):
    x = jnp.ones((32, 3, 8, 8)) * 2
    _, x_q = quantizer_ls_ternary(x)
    assert jnp.all(x_q == 2.0)

    x = jnp.asarray(rng.random((32, 3, 8, 8)), jnp.float32)
    x = x.at[1].set(2.0)
    x = x.at[9].set(-3.0)
    _, x_q = quantizer_ls_ternary(x)
    assert jnp.all(x_q[1] == 2.0)
    assert jnp.all(x_q[9] == -3.0)


def test_gf_more_bits_are_better(rng):
    x = _x(rng)
    costs = []
    for k in range(1, 5):
        _, x_q = quantizer_gf(x, k=k)
        costs.append(_costs(x_q, x))
    for lo, hi in zip(costs[1:], costs[:-1]):
        assert jnp.all(lo <= hi + 1e-5)


def test_ls2_better_than_lsT_better_than_ls1(rng):
    x = _x(rng)
    _, x_q_ls2 = quantizer_ls_2(x, skip=1)
    _, x_q_lsT = quantizer_ls_ternary(x, skip=1)
    _, x_q_ls1 = quantizer_ls_1(x)
    assert jnp.all(_costs(x_q_ls2, x) <= _costs(x_q_lsT, x) + 1e-5)
    assert jnp.all(_costs(x_q_lsT, x) <= _costs(x_q_ls1, x) + 1e-5)


def test_ls2_better_than_gf2_better_than_ls1(rng):
    x = _x(rng)
    _, x_q_ls2 = quantizer_ls_2(x, skip=1)
    _, x_q_gf2 = quantizer_gf(x, k=2)
    _, x_q_ls1 = quantizer_ls_1(x)
    assert jnp.all(_costs(x_q_ls2, x) <= _costs(x_q_gf2, x) + 1e-5)
    assert jnp.all(_costs(x_q_gf2, x) <= _costs(x_q_ls1, x) + 1e-5)


def test_gf1_equals_ls1(rng):
    x = _x(rng)
    _, q_gf1 = quantizer_gf(x, k=1)
    _, q_ls1 = quantizer_ls_1(x)
    np.testing.assert_allclose(np.asarray(q_gf1), np.asarray(q_ls1), rtol=1e-6)


def test_cached_scales_reproduce_quantization(rng):
    """Passing returned scales back in reproduces the quantization exactly
    (the eval-mode path of the reference weight quantizers)."""
    x = _x(rng, (16, 4, 5, 5))
    for fn in (quantizer_ls_1,
               lambda t, vs=None: quantizer_ls_2(t, vs),
               lambda t, vs=None: quantizer_ls_ternary(t, vs),
               lambda t, vs=None: quantizer_gf(t, 3, vs)):
        vs, x_q = fn(x)
        _, x_q2 = fn(x, vs)
        np.testing.assert_allclose(np.asarray(x_q), np.asarray(x_q2),
                                   rtol=1e-6)


def test_quantizers_jit(rng):
    x = _x(rng, (8, 2, 4, 4))
    for fn in (quantizer_ls_1,
               lambda t: quantizer_ls_2(t),
               lambda t: quantizer_ls_ternary(t),
               lambda t: quantizer_gf(t, 2)):
        vs, x_q = jax.jit(fn)(x)
        assert x_q.shape == x.shape


def test_ls1_gradient_is_scaled_ste(rng):
    x = jnp.array([[0.5, -2.0, 0.25, -0.75]])
    v1 = jnp.mean(jnp.abs(x))

    def f(t):
        _, q = quantizer_ls_1(t)
        return jnp.sum(q)

    g = jax.grad(f)(x)
    # grad = v1 * 1{|x|<=1}; scale path is stop-gradient.
    np.testing.assert_allclose(np.asarray(g), [[v1, 0.0, v1, v1]], rtol=1e-6)
