"""Bit-packing of sign planes.

A k-bit least-squares quantized tensor is sum_i v_i * b_i with
b_i in {-1,+1} (quant_tpu/ops/quantize.py). For storage and
bandwidth-bound inference the b_i planes are packed 32 signs/int32 word
(bit j of word w = 1 iff element 32w+j is non-negative, matching
binary_sign's sign(0)=+1). Packed weights cut HBM weight traffic 32x
versus fp32; compute paths unpack on-chip (VMEM) or consume bits directly
via XNOR-popcount (quant_tpu/ops/binary_gemm.py).

The reference has no packed representation at all — its "binary" conv is
dense fp32 (quant/binary/binary_conv.py:161-173 in apple/ml-quant); this
module is part of what the TPU build adds (BASELINE.md north star).
"""

import jax
import jax.numpy as jnp

WORD = 32


def packed_width(k: int) -> int:
    """Number of int32 words needed for k signs."""
    return -(-k // WORD)


def pack_signs(x: jax.Array) -> jax.Array:
    """Pack signs of the last axis: (..., K) float -> (..., ceil(K/32)) int32.

    Padding bits (when K % 32 != 0) are set (i.e. +1 signs); consumers
    correct for padding via the popcount identity (see binary_gemm).
    """
    k = x.shape[-1]
    pad = packed_width(k) * WORD - k
    bits = (x >= 0)
    if pad:
        bits = jnp.concatenate(
            [bits, jnp.ones(x.shape[:-1] + (pad,), bool)], axis=-1)
    bits = bits.reshape(x.shape[:-1] + (packed_width(k), WORD))
    weights = (jnp.uint32(1) << jnp.arange(WORD, dtype=jnp.uint32))
    words = jnp.sum(jnp.where(bits, weights, jnp.uint32(0)), axis=-1,
                    dtype=jnp.uint32)
    return words.astype(jnp.int32)


def unpack_signs(words: jax.Array, k: int,
                 dtype: object = jnp.float32) -> jax.Array:
    """Unpack int32 words back to {-1,+1} values: (..., W) -> (..., K)."""
    w = words.astype(jnp.uint32)
    shifts = jnp.arange(WORD, dtype=jnp.uint32)
    bits = (w[..., None] >> shifts) & jnp.uint32(1)
    flat = bits.reshape(words.shape[:-1] + (words.shape[-1] * WORD,))
    flat = flat[..., :k]
    return (flat.astype(dtype) * 2 - 1)
