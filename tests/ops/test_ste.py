"""STE sign tests (oracle: reference tests/binary/test_ste.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from quant_tpu.ops import binarize, binary_sign


def test_binary_sign_zero_is_positive():
    x = jnp.array([-2.0, -0.0, 0.0, 0.5, 3.0])
    np.testing.assert_array_equal(
        np.asarray(binary_sign(x)), [-1.0, 1.0, 1.0, 1.0, 1.0])


def test_binarize_forward():
    x = jnp.array([[-1.5, -0.2], [0.0, 2.5]])
    np.testing.assert_array_equal(
        np.asarray(binarize(x)), [[-1.0, -1.0], [1.0, 1.0]])


def test_binarize_backward_clips_outside_unit_interval():
    x = jnp.array([-2.0, -1.0, -0.5, 0.0, 0.5, 1.0, 2.0])
    g = jax.grad(lambda t: jnp.sum(binarize(t) * jnp.arange(1.0, 8.0)))(x)
    # Pass-through on [-1, 1] (inclusive), zero outside.
    np.testing.assert_array_equal(
        np.asarray(g), [0.0, 2.0, 3.0, 4.0, 5.0, 6.0, 0.0])


def test_binarize_jit_and_grad_compose():
    x = jnp.linspace(-2, 2, 32).reshape(4, 8)
    f = jax.jit(jax.grad(lambda t: jnp.sum(binarize(t) ** 2)))
    assert f(x).shape == x.shape
