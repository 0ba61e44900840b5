"""Pallas XNOR-popcount GEMM parity tests (interpret mode on CPU).

Oracle: dense ±1 matmul with the same scales. The popcount core is exact
integer math, so tolerance is float-epsilon only.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from quant_tpu.ops.binary_gemm import (
    pack_for_xnor, xnor_gemm, xnor_gemm_reference,
)
from quant_tpu.ops.ste import binary_sign


@pytest.mark.parametrize('m,k,n', [
    (8, 64, 16),        # sub-tile everything
    (128, 128, 128),    # exactly one tile
    (130, 100, 140),    # ragged in every direction
    (16, 512 + 17, 64),  # multi word-tile with ragged K
])
def test_xnor_gemm_matches_dense(rng, m, k, n):
    a = binary_sign(jnp.asarray(rng.standard_normal((m, k)), jnp.float32))
    b = binary_sign(jnp.asarray(rng.standard_normal((k, n)), jnp.float32))
    vx = jnp.asarray(rng.random(m) + 0.1, jnp.float32)
    vw = jnp.asarray(rng.random(n) + 0.1, jnp.float32)

    a_p, bt_p = pack_for_xnor(a, b)
    got = xnor_gemm(a_p, bt_p, vx, vw, k_total=k, interpret=True)
    want = xnor_gemm_reference(a, b, vx, vw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-4)


def test_xnor_gemm_unit_scales_integer_exact(rng):
    m = k = n = 32
    a = binary_sign(jnp.asarray(rng.standard_normal((m, k)), jnp.float32))
    b = binary_sign(jnp.asarray(rng.standard_normal((k, n)), jnp.float32))
    ones_m = jnp.ones((m,), jnp.float32)
    ones_n = jnp.ones((n,), jnp.float32)
    a_p, bt_p = pack_for_xnor(a, b)
    got = xnor_gemm(a_p, bt_p, ones_m, ones_n, k_total=k, interpret=True)
    want = a @ b
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
