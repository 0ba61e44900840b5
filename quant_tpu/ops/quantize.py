"""Quantizer functions: ls-1, ls-2, ls-T, gf-k, and activation clamps.

Behavioral parity with the reference (quant/binary/quantization.py in
apple/ml-quant), re-expressed as pure jittable functions:

* All quantizers operate on a "row-major" view: scales are solved per row
  of `x` reshaped to (rows, -1), where rows = out-channels for weights and
  rows = batch samples for activations (reference quantization.py:53-56).
* Scale computations are wrapped in `stop_gradient` (the reference computes
  them from detached clones); the quantized output is differentiable w.r.t.
  x through the STE `binarize`.
* Scale solves always run in float32 (reductions/sorts on a reduced-dtype
  x are upcast first), while the quantized output x_q keeps x's dtype —
  so bf16 mixed-precision chains (eval_dtype / train_dtype) stay bf16
  end-to-end without losing solver precision. Returned scale stacks are
  float32 (they live in f32 'quant_state' buffers).
* Each quantizer returns `(scales, x_q)` where `scales` is a (k, rows)
  array stacking v_1..v_k — the explicit functional replacement for the
  reference's stateful buffer caching, threaded through layer state by
  `quant_tpu.nn`.

A k-bit quantized tensor has the form x_q = sum_i v_i * b_i with
b_i in {-1,+1} — the algebraic fact the packed binary-GEMM kernels exploit
(see quant_tpu/ops/binary_gemm.py).
"""

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from quant_tpu.ops.optimal import opt_v1
from quant_tpu.ops.ste import binarize, binary_sign


def clamp_identity(x: jax.Array) -> jax.Array:
    """Identity clamp (reference quantization.py:17-19)."""
    return x


def clamp_symmetric(x: jax.Array, alpha: float) -> jax.Array:
    """Clamp x to [-alpha, +alpha] (reference quantization.py:22-24)."""
    return jnp.clip(x, -alpha, alpha)


def quantizer_fp(x: jax.Array,
                 vs: Optional[jax.Array] = None) -> tuple[jax.Array, jax.Array]:
    """Full-precision passthrough (reference QuantizerFP)."""
    del vs
    return jnp.zeros((0, x.shape[0]), x.dtype), x


def _rows(x: jax.Array) -> jax.Array:
    return x.reshape(x.shape[0], -1)


def _rows32(x: jax.Array) -> jax.Array:
    """Detached f32 row view — the solver operand (solves stay f32 even
    when the surrounding chain runs bf16)."""
    return jax.lax.stop_gradient(_rows(x)).astype(jnp.float32)


def _per_row(v: jax.Array, x: jax.Array) -> jax.Array:
    """Broadcast a (rows,) scale vector against x's trailing dims,
    cast to x's dtype (keeps reduced-precision chains closed)."""
    return v.reshape((-1,) + (1,) * (x.ndim - 1)).astype(x.dtype)


def quantizer_ls_1(x: jax.Array,
                   v1: Optional[jax.Array] = None
                   ) -> tuple[jax.Array, jax.Array]:
    """1-bit least-squares quantization (XNOR-Net scaling).

    v1 = per-row mean(|x|) when not supplied (reference quantization.py:35-56).
    Returns ((1, rows) scales, v1 * binarize(x)).
    """
    if v1 is None:
        v1 = jnp.mean(jnp.abs(_rows32(x)), axis=-1)
    v1 = v1.reshape(-1)
    return v1[None, :], _per_row(v1, x) * binarize(x)


def quantizer_ls_2(x: jax.Array,
                   vs: Optional[jax.Array] = None,
                   skip: int = 3,
                   mode: str = 'exact') -> tuple[jax.Array, jax.Array]:
    """2-bit least-squares quantization: x_q = v1*b1 + v2*sign(residual).

    v1 is the exact per-row LS optimum from `opt_v1`; v2 is the mean
    absolute residual (reference quantization.py:59-92). `vs` optionally
    supplies cached scales stacked as (2, rows).
    """
    if vs is None:
        xd = _rows32(x)
        v1 = opt_v1(xd, ternary=False, skip=skip, mode=mode)
        residual = xd - v1[:, None] * binary_sign(xd)
        v2 = jnp.mean(jnp.abs(residual), axis=-1)
    else:
        v1, v2 = vs[0].reshape(-1), vs[1].reshape(-1)

    b1 = binarize(x)
    v1b = _per_row(v1, x)
    x_q = v1b * b1 + _per_row(v2, x) * binarize(x - v1b * b1)
    return jnp.stack([v1, v2]), x_q


def quantizer_ls_ternary(x: jax.Array,
                         vs: Optional[jax.Array] = None,
                         skip: int = 3,
                         mode: str = 'exact') -> tuple[jax.Array, jax.Array]:
    """Ternary least-squares quantization: x_q = v1*(b1 + sign(residual)).

    The two passes share one scale (v2 = v1), so values fall in
    {-2v1, 0, +2v1} (reference quantization.py:95-115).
    """
    if vs is None:
        v1 = opt_v1(_rows32(x), ternary=True, skip=skip, mode=mode)
    else:
        v1 = vs[0].reshape(-1)

    b1 = binarize(x)
    v1b = _per_row(v1, x)
    return v1[None, :], v1b * (b1 + binarize(x - v1b * b1))


def quantizer_gf(x: jax.Array, k: int,
                 vs: Optional[jax.Array] = None
                 ) -> tuple[jax.Array, jax.Array]:
    """Greedy-foldable k-bit quantization.

    Each pass i greedily quantizes the residual with v_i = mean |residual|
    (reference quantization.py:118-148). The scale recursion runs on the
    detached residual (binary_sign); the value recursion accumulates
    binarize(x - result) so STE gradients flow through every pass.
    """
    residual = _rows32(x)
    result = jnp.zeros_like(x)
    saved = []
    for i in range(k):
        v = vs[i].reshape(-1) if vs is not None \
            else jnp.mean(jnp.abs(residual), axis=-1)
        saved.append(v)
        residual = residual - v[:, None] * binary_sign(residual)
        result = result + _per_row(v, x) * binarize(x - result)
    return jnp.stack(saved), result


def get_clamp_fn(kind: str = 'identity',
                 alpha: float = 2.0) -> 'Callable':
    """Resolve a clamp config (reference binary_conv.py:147-159)."""
    if kind == 'identity':
        return clamp_identity
    if kind == 'symmetric':
        return partial(clamp_symmetric, alpha=alpha)
    raise ValueError(f'{kind} is not a valid clamping function.')
