"""Pallas fused stem maxpool parity tests (interpret mode on CPU).

Oracle: `ops.conv.max_pool2d` (lax.reduce_window), the production stem
pool. The Pallas kernel is a pure max over the same 9-element windows,
so equality is exact — including the -inf padding semantics at all four
borders and the halo-row duplication at the first H tile.

On silicon the kernel is bit-exact too but LOSES to XLA's fused
reduce_window (docs/DESIGN.md "Pallas stem maxpool"); it is kept as the
documented negative result, not a production path.
"""

import jax.numpy as jnp
import pytest

from quant_tpu.ops.conv import max_pool2d
from quant_tpu.ops.pool import max_pool_3x3_s2_p1, pool_fusable


@pytest.mark.parametrize('shape', [
    (2, 8, 8, 16),      # tiny: single H tile
    (1, 16, 8, 8),      # rectangular, multi-tile H
    (3, 28, 28, 4),     # odd-ish channel count, H/2 = 14
    (2, 32, 32, 8),     # H/2 = 16 = max block
])
@pytest.mark.parametrize('w_stage', ['reshape', 'lane', 'swap'])
def test_pool_matches_reduce_window(rng, shape, w_stage):
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    ref = max_pool2d(x, kernel_size=3, stride=2, padding=1)
    got = max_pool_3x3_s2_p1(x, interpret=True, w_stage=w_stage)
    assert got.shape == ref.shape
    assert bool(jnp.all(got == ref))


def test_pool_bf16_exact(rng):
    x = jnp.asarray(rng.standard_normal((2, 14, 12, 8)), jnp.bfloat16)
    ref = max_pool2d(x, kernel_size=3, stride=2, padding=1)
    got = max_pool_3x3_s2_p1(x, interpret=True)
    assert got.dtype == jnp.bfloat16
    assert bool(jnp.all(got == ref))


def test_pool_rejects_odd_spatial():
    x = jnp.zeros((1, 7, 8, 4))
    with pytest.raises(ValueError, match='even'):
        max_pool_3x3_s2_p1(x, interpret=True)


def test_pool_fusable_predicate():
    assert pool_fusable((1, 112, 112, 64), 3, 2, 1)
    assert pool_fusable((1, 112, 112, 64), (3, 3), (2, 2), (1, 1))
    assert not pool_fusable((1, 112, 112, 64), 2, 2, 0)   # LeNet pool
    assert not pool_fusable((1, 111, 112, 64), 3, 2, 1)   # odd H
    assert not pool_fusable((1, 112, 112, 64), 3, 1, 1)   # stride 1


def test_pool_halo_first_tile_uses_pad_semantics(rng):
    # Row 0 of the output must see only rows {0, 1} (pad row is -inf);
    # the clamped halo duplicates row 0, which max absorbs. Make row 0
    # the max everywhere to catch any off-by-one in the halo index.
    x = jnp.asarray(rng.standard_normal((1, 16, 8, 4)), jnp.float32)
    x = x.at[:, 0].set(100.0)
    ref = max_pool2d(x, kernel_size=3, stride=2, padding=1)
    got = max_pool_3x3_s2_p1(x, interpret=True)
    assert bool(jnp.all(got == ref))
