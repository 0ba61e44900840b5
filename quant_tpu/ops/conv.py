"""Convolution primitives in TPU-native layout (NHWC / HWIO).

The dense QAT path: quantized tensors of the form sum_i v_i*b_i are fed to
`lax.conv_general_dilated`, which XLA tiles directly onto the MXU. This is
the exact functional analog of the reference's `F.conv2d(w_q, x_q)`
(quant/binary/binary_conv.py:161-173) and doubles as the numerical oracle
for the packed binary kernels in `quant_tpu.ops.binary_gemm`.

Layout note: the reference is NCHW/OIHW (torch); here everything is
NHWC/HWIO, the layout XLA/TPU prefers (channels on the 128-lane minor
dimension). Per-out-channel weight scales index the trailing O axis of
HWIO; per-sample activation scales index the leading N axis of NHWC.
"""

from typing import Any, Sequence, Union

import jax
import jax.numpy as jnp
from jax import lax

IntOr2 = Union[int, Sequence[int]]


def _pair(v: IntOr2) -> tuple[int, int]:
    if isinstance(v, int):
        return (v, v)
    a, b = v
    return (int(a), int(b))


def conv2d(x: jax.Array, w: jax.Array, *,
           stride: IntOr2 = 1, padding: IntOr2 = 0,
           dilation: IntOr2 = 1, groups: int = 1,
           bias: jax.Array | None = None,
           preferred_element_type: Any = jnp.float32) -> jax.Array:
    """2D convolution, NHWC x HWIO -> NHWC, torch-style integer padding.

    Args:
        x: (N, H, W, Cin) activations.
        w: (kh, kw, Cin // groups, Cout) filters.
        stride/padding/dilation: ints or (h, w) pairs; padding is symmetric
            per spatial dim (the reference's `nn.Conv2d` semantics).
        groups: feature group count.
        bias: optional (Cout,) bias added to the result.
    """
    ph, pw = _pair(padding)
    y = lax.conv_general_dilated(
        x, w,
        window_strides=_pair(stride),
        padding=((ph, ph), (pw, pw)),
        rhs_dilation=_pair(dilation),
        feature_group_count=groups,
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=preferred_element_type,
    )
    if bias is not None:
        y = y + bias
    return y


def stem_conv_s2d(x: jax.Array, w: jax.Array,
                  bias: jax.Array | None = None,
                  preferred_element_type: Any = jnp.float32) -> jax.Array:
    """EXACT space-to-depth reformulation of a 7x7/stride-2/pad-3 stem.

    The C_in=3 stem conv is pathological on the MXU (3 channels on a
    128-lane axis); regrouping 2x2 pixel blocks into channels turns it
    into a 4x4/stride-1 conv over 4*C_in channels computing the SAME
    function (measured ~7x faster on this chip — tools/
    probe_r2_results.jsonl stem_s2d vs stem_regular).

    Derivation: out[i,j] reads padded rows 2i+1..2i+7 of pad((4,2)).
    Row 2i+1+di lands in 2x2-block (i + (1+di)//2) at parity (1+di)%2,
    so tap (di,dj) of the 7x7 kernel scatters to block-tap
    ((1+di)//2, (1+dj)//2) and block-channel (r_i*2 + r_j)*C + c. The
    (r=0, a=0) slots are never read and stay zero. pad (4,2) gives 115
    blocks -> exactly 112 valid 4x4 windows.
    """
    n, h, wdt, c = x.shape
    kh, kw, wc, cout = w.shape
    if (kh, kw) != (7, 7) or h % 2 or wdt % 2:
        raise ValueError('stem_conv_s2d needs a 7x7/s2/p3 stem on '
                         'even spatial dims.')
    xp = jnp.pad(x, ((0, 0), (4, 2), (4, 2), (0, 0)))
    hb, wb = (h + 6) // 2, (wdt + 6) // 2
    xs = xp.reshape(n, hb, 2, wb, 2, c).transpose(0, 1, 3, 2, 4, 5)
    xs = xs.reshape(n, hb, wb, 4 * c)

    w4 = jnp.zeros((4, 4, 4 * c, cout), w.dtype)
    for di in range(7):
        a, r = (1 + di) // 2, (1 + di) % 2
        for dj in range(7):
            b, s = (1 + dj) // 2, (1 + dj) % 2
            w4 = w4.at[a, b, (r * 2 + s) * c:(r * 2 + s) * c + c].set(
                w[di, dj])

    y = lax.conv_general_dilated(
        xs, w4, window_strides=(1, 1), padding=((0, 0), (0, 0)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
        preferred_element_type=preferred_element_type)
    if bias is not None:
        y = y + bias
    return y


def max_pool2d(x: jax.Array, *, kernel_size: IntOr2, stride: IntOr2,
               padding: IntOr2 = 0) -> jax.Array:
    """Max pooling over NHWC spatial dims, torch-style integer padding."""
    kh, kw = _pair(kernel_size)
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    return lax.reduce_window(
        x, -jnp.inf, lax.max,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, sh, sw, 1),
        padding=((0, 0), (ph, ph), (pw, pw), (0, 0)),
    )


def global_avg_pool(x: jax.Array) -> jax.Array:
    """AdaptiveAvgPool2d((1,1)) + flatten: NHWC -> (N, C)."""
    return jnp.mean(x, axis=(1, 2))
