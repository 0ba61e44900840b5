"""Ring-overlapped TP binary matmul: parity vs the unsharded oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quant_tpu.parallel import make_mesh
from quant_tpu.parallel.tp_overlap import (
    tp_binary_matmul_overlapped, tp_binary_matmul_reference,
)
from quant_tpu.ops.ste import binary_sign


@pytest.mark.parametrize('p', [2, 4, 8])
def test_overlapped_matches_reference(rng, p):
    if len(jax.devices()) < p:
        pytest.skip('not enough devices')
    mesh = make_mesh(data=1, model=p, devices=jax.devices()[:p])
    m, k, n = 16, 32 * p, 8 * p
    x = binary_sign(jnp.asarray(rng.standard_normal((m, k)), jnp.float32))
    w = binary_sign(jnp.asarray(rng.standard_normal((k, n)), jnp.float32))

    got = tp_binary_matmul_overlapped(x, w, mesh)
    want = tp_binary_matmul_reference(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


def test_overlapped_scatter_output(rng):
    p = 4
    if len(jax.devices()) < p:
        pytest.skip('not enough devices')
    mesh = make_mesh(data=1, model=p, devices=jax.devices()[:p])
    m, k, n = 8, 32 * p, 4 * p
    x = binary_sign(jnp.asarray(rng.standard_normal((m, k)), jnp.float32))
    w = binary_sign(jnp.asarray(rng.standard_normal((k, n)), jnp.float32))
    got = tp_binary_matmul_overlapped(x, w, mesh, gather_output=False)
    want = tp_binary_matmul_reference(x, w)
    # Scatter output is the same logical array, sharded over columns.
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)

@pytest.mark.parametrize('p', [2, 4])
def test_packed_overlapped_matches_reference(rng, p):
    """North-star form: packed int32 operands sharded over the ring."""
    from quant_tpu.ops.binary_gemm import pack_for_xnor
    from quant_tpu.parallel.tp_overlap import tp_packed_matmul_overlapped
    if len(jax.devices()) < p:
        pytest.skip('not enough devices')
    mesh = make_mesh(data=1, model=p, devices=jax.devices()[:p])
    m, k, n = 16, 64 * p, 8 * p
    x = binary_sign(jnp.asarray(rng.standard_normal((m, k)), jnp.float32))
    w = binary_sign(jnp.asarray(rng.standard_normal((k, n)), jnp.float32))
    xp, wtp = pack_for_xnor(x, w)          # (M, W), (W, N)

    got = tp_packed_matmul_overlapped(xp, wtp, k_total=k, mesh=mesh)
    want = tp_binary_matmul_reference(x, w)
    # +-1 in bf16 with f32 accumulation is exact.
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
