"""Pallas XNOR-popcount binary GEMM over bit-packed operands.

The kernel computes C[m,n] = sum_k a[m,k]*b[k,n] for a,b in {-1,+1}
directly from packed sign words, with the least-squares scale epilogue
fused:

    dot(m,n)  = K - 2 * sum_w popcount(A[m,w] XOR Bt[w,n])
    C[m,n]    = dot(m,n) * vx[m] * vw[n]

(equal padding bits in both operands XOR to zero, so padding needs no
correction). This is the classic XNOR-Net inner loop (Rastegari et al.
2016) that the reference only emulates in dense fp32
(quant/binary/binary_conv.py:161-173 in apple/ml-quant).

TPU mapping:
  * grid (M/TM, N/TN, W/TW); the W axis is innermost so a VMEM scratch
    accumulator carries partial popcounts across word-tiles of one (m,n)
    output block.
  * per word (static unroll inside a word-tile): the A column (TM,1)
    broadcast-XORs against the Bt row (1,TN) to a full (TM,TN) VPU tile;
    population_count and accumulate are elementwise. Static lane/sublane
    indices keep the slices free of dynamic-lane penalties.
  * B is consumed pre-transposed (W, N) so its per-word row is a sublane
    slice; A's per-word column is a static lane slice.
  * 3 VPU ops per word per output element = 3 ops / 32 MACs. On v5e this
    tops out below the MXU int8 path (quant_tpu/ops/binary_infer.py),
    which is why the int8 path is the production default — this kernel is
    the bandwidth-optimal variant (operands stay packed end-to-end) and
    the reference XNOR implementation.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quant_tpu.ops.packing import WORD, pack_signs


def _xnor_kernel(a_ref, bt_ref, vx_ref, vw_ref, out_ref, acc_ref, *,
                 k_total: int, tw: int):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    acc = acc_ref[:, :]
    for w in range(tw):  # static unroll over the word-tile
        a_col = a_ref[:, w:w + 1]          # (TM, 1) static lane slice
        b_row = bt_ref[w:w + 1, :]         # (1, TN) static sublane slice
        mism = jax.lax.population_count(jax.lax.bitwise_xor(a_col, b_row))
        acc = acc + mism
    acc_ref[:, :] = acc

    @pl.when(pl.program_id(2) == pl.num_programs(2) - 1)
    def _epilogue():
        dot = (k_total - 2 * acc_ref[:, :]).astype(jnp.float32)
        out_ref[:, :] = dot * vx_ref[:, :] * vw_ref[:, :]


def _pad_to(x, axis, mult, value=0):
    pad = (-x.shape[axis]) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(jax.jit, static_argnames=('k_total', 'interpret'))
def xnor_gemm(a_packed: jax.Array, bt_packed: jax.Array,
              vx: jax.Array, vw: jax.Array, k_total: int,
              interpret: bool = False) -> jax.Array:
    """Scaled binary GEMM from packed signs.

    Args:
        a_packed: (M, W) int32 packed sign words of A (M, K).
        bt_packed: (W, N) int32 packed sign words of B (K, N), word axis
            leading (pack along K then transpose).
        vx: (M,) row scales; vw: (N,) column scales.
        k_total: unpacked contraction length K.

    Returns:
        (M, N) float32: (v x ⊗ vw) * (A·B).
    """
    m, w_words = a_packed.shape
    w2, n = bt_packed.shape
    assert w_words == w2, (a_packed.shape, bt_packed.shape)

    tm, tn, tw = 128, 128, 16
    a_p = _pad_to(_pad_to(a_packed, 0, tm), 1, tw)
    bt_p = _pad_to(_pad_to(bt_packed, 0, tw), 1, tn)
    vx_p = _pad_to(vx.reshape(-1, 1).astype(jnp.float32), 0, tm)
    vw_p = _pad_to(vw.reshape(1, -1).astype(jnp.float32), 1, tn)
    mp, wp = a_p.shape
    np_ = bt_p.shape[1]

    # Padding words in the W direction are zeros in BOTH operands -> XOR 0
    # -> they inflate the "match" count by 32*pad_w words; correct by using
    # the padded K in the kernel and subtracting the pad contribution.
    k_padded = wp * WORD

    grid = (mp // tm, np_ // tn, wp // tw)
    out = pl.pallas_call(
        functools.partial(_xnor_kernel, k_total=k_padded, tw=tw),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tw), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tw, tn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1), lambda i, j, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.int32)],
        interpret=interpret,
    )(a_p, bt_p, vx_p, vw_p)

    # Remove the padded-K inflation: padded zero words match on all 32
    # bits, adding (k_padded - k_real_padded_bits) to every dot. The real
    # operands were padded with SET bits only inside their last real word
    # (pack_signs pads with ones on both sides -> also matches). All
    # padding therefore contributes `k_padded - k_total` matches uniformly.
    if k_padded != k_total:
        out = out - (k_padded - k_total) * (
            vx_p.reshape(-1, 1) * vw_p.reshape(1, -1))
    return out[:m, :n]


def xnor_gemm_reference(a_signs: jax.Array, b_signs: jax.Array,
                        vx: jax.Array, vw: jax.Array) -> jax.Array:
    """Dense oracle used by the parity tests."""
    dot = a_signs.astype(jnp.float32) @ b_signs.astype(jnp.float32)
    return dot * vx.reshape(-1, 1) * vw.reshape(1, -1)


def pack_for_xnor(a_signs: jax.Array, b_signs: jax.Array):
    """Pack dense {-1,+1} operands A (M,K), B (K,N) for xnor_gemm."""
    a_packed = pack_signs(a_signs)                   # (M, W)
    bt_packed = pack_signs(b_signs.T)                # (N, W)
    return a_packed, bt_packed.T                     # (M, W), (W, N)
