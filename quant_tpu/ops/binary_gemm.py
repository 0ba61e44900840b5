"""Pallas XNOR-popcount binary GEMM over bit-packed operands.

The kernel computes C[m,n] = sum_k a[m,k]*b[k,n] for a,b in {-1,+1}
directly from packed sign words, with the least-squares scale epilogue
fused:

    dot(m,n)  = K - 2 * sum_w popcount(A[m,w] XOR Bt[w,n])
    C[m,n]    = dot(m,n) * vx[m] * vw[n]

(equal padding bits in both operands XOR to zero, so padding needs no
correction beyond a uniform constant). This is the classic XNOR-Net inner
loop (Rastegari et al. 2016) that the reference only emulates in dense
fp32 (quant/binary/binary_conv.py:161-173 in apple/ml-quant).

TPU mapping:
  * grid (M/TM, N/TN); each program owns one (TM, TN) output tile and
    consumes the FULL word axis (W <= ~150 for ResNet-18-scale reductions,
    i.e. a (128, W) int32 A-tile and (W, 128) Bt-tile comfortably fit
    VMEM). Full-axis blocks satisfy Mosaic's lane/sublane divisibility
    rules without padding the word axis.
  * per word (static unroll): the A column (TM,1) broadcast-XORs against
    the Bt row (1,TN) into a (TM,TN) VPU tile; population_count and
    accumulate are elementwise. Static indices keep the slices free of
    dynamic-lane penalties.
  * 3 VPU ops per word per output element = 3 ops / 32 MACs; on v5e this
    peaks below the MXU sign-plane path (quant_tpu/ops/binary_infer.py),
    which is why the MXU path is the production default — this kernel is
    the bandwidth-optimal variant (operands stay packed end-to-end).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quant_tpu.ops.packing import WORD, pack_signs


def _xnor_kernel(a_ref: object, bt_ref: object, vx_ref: object,
                 vw_ref: object, out_ref: object, *,
                 k_total: int, w_words: int) -> None:
    acc = jnp.zeros(out_ref.shape, jnp.int32)
    for w in range(w_words):  # static unroll over the word axis
        a_col = a_ref[:, w:w + 1]          # (TM, 1) static lane slice
        b_row = bt_ref[w:w + 1, :]         # (1, TN) static sublane slice
        acc = acc + jax.lax.population_count(
            jax.lax.bitwise_xor(a_col, b_row))
    dot = (k_total - 2 * acc).astype(jnp.float32)
    out_ref[:, :] = dot * vx_ref[:, :] * vw_ref[:, :]


def _pad_to(x: jax.Array, axis: int, mult: int,
            value: float = 0) -> jax.Array:
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
        (M, N) float32: (vx ⊗ vw) * (A·B).
    """
    m, w_words = a_packed.shape
    w2, n = bt_packed.shape
    assert w_words == w2, (a_packed.shape, bt_packed.shape)

    tm, tn = 128, 128
    a_p = _pad_to(a_packed, 0, tm)
    bt_p = _pad_to(bt_packed, 1, tn)
    vx_p = _pad_to(vx.reshape(-1, 1).astype(jnp.float32), 0, tm)
    vw_p = _pad_to(vw.reshape(1, -1).astype(jnp.float32), 1, tn)
    mp = a_p.shape[0]
    np_ = bt_p.shape[1]

    # All padding bits are SET in both operands (pack_signs pads with
    # ones), so they XOR to zero and uniformly inflate each dot by the
    # number of padded bits; use the padded K and subtract afterwards.
    k_padded = w_words * WORD

    grid = (mp // tm, np_ // tn)
    out = pl.pallas_call(
        functools.partial(_xnor_kernel, k_total=k_padded, w_words=w_words),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, w_words), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w_words, tn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, np_), jnp.float32),
        interpret=interpret,
    )(a_p, bt_p, vx_p, vw_p)

    if k_padded != k_total:
        out = out - (k_padded - k_total) * (
            vx_p.reshape(-1, 1) * vw_p.reshape(1, -1))
    return out[:m, :n]


def xnor_gemm_reference(a_signs: jax.Array, b_signs: jax.Array,
                        vx: jax.Array, vw: jax.Array) -> jax.Array:
    """Dense oracle used by the parity tests."""
    dot = a_signs.astype(jnp.float32) @ b_signs.astype(jnp.float32)
    return dot * vx.reshape(-1, 1) * vw.reshape(1, -1)


def pack_for_xnor(a_signs: jax.Array,
                  b_signs: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Pack dense {-1,+1} operands A (M,K), B (K,N) for xnor_gemm."""
    a_packed = pack_signs(a_signs)                   # (M, W)
    bt_packed = pack_signs(b_signs.T)                # (N, W)
    return a_packed, bt_packed.T                     # (M, W), (W, N)
