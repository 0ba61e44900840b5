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
