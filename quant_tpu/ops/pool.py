"""EXPERIMENTAL (measured-losing): Pallas max-pool for the ResNet stem.

Status: a documented NEGATIVE result, kept for its Mosaic-lowering
notes and interpret-mode parity tests — NOT wired into any model. On
this toolchain the kernel LOSES to XLA's `reduce_window`: at batch
1024 on the (112,112,64) bf16 stem map the best Mosaic-lowerable form
runs 43.9 ms vs reduce_window's 11.1 ms standalone and ~4.4 ms
in-stem, where XLA producer-fuses BN+ReLU into the pool's read
(tools/probe_r5_results.jsonl pool_*; docs/DESIGN.md "Pallas stem
maxpool"). The VPU relayout cost of in-register W-decimation dominates
— the same conclusion as the Pallas matmul ceiling. The stem keeps
`ops.conv.max_pool2d` (reduce_window); re-measure via tools/probe_r5.py
before ever promoting this.

Mosaic constraints shaped the formulation (stride-2 *slicing* lowers to
an unsupported gather; a `(..., 2, C)` reshape pads sublanes 2->16 for
bf16, so at most ONE such value may be live per tile):

    out[i, j] = max_{di,dj in -1..1} z[2i+di, 2j+dj]

  W stage: r[:, j] = max(z[:, j-1], z[:, j])          shift + max, no pad
           w1[:, t] = max(r[:, 2t], r[:, 2t+1])       one pairwise reshape
                    = max(z[:, 2t-1], z[:, 2t], z[:, 2t+1])
  H stage: e[k] = max(w1[k], w1[k+1]); out[t] = max(e[2t], e[2t+1])
           (pairwise reshape here splits the LEADING dim - free).

The grid tiles H; each step reads `2*block_h` input rows plus a 1-row
halo block for input row 2*block_h*i - 1. At i = 0 the halo index
clamps to row 0 - a duplicated row, which max absorbs (idempotent), and
matches the pad=-inf semantics exactly.

The pool is a pure max over the same 9 values reduce_window sees, so the
result is BIT-EXACT vs `ops.conv.max_pool2d` - the parity tests assert
exact equality. Training keeps reduce_window (it has a gradient rule;
eval-only fusion needs none).

The reference has no pooling kernel of its own - torch's MaxPool2d
(quant/models/resnet.py in apple/ml-quant) is the functional analog.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _neg_inf(dtype: object) -> object:
    if jnp.issubdtype(dtype, jnp.floating):
        return -jnp.inf
    return jnp.iinfo(dtype).min


def _pair_max(z: jax.Array, axis: int) -> jax.Array:
    """max(z[..., 2t, ...], z[..., 2t+1, ...]) along `axis` (size even)."""
    shape = list(z.shape)
    shape[axis] //= 2
    shape.insert(axis + 1, 2)
    return jnp.max(z.reshape(shape), axis=axis + 1)


def _w_stage_reshape(r: jax.Array) -> jax.Array:
    # (..., 2, C) reshape: sublane-pads 2->16 for bf16; slow relayout.
    return _pair_max(r, axis=1)


def _w_stage_lane(r: jax.Array) -> jax.Array:
    # Merge W pairs into lanes: (H', W, C) -> (H', W/2, 2C); the pair
    # max is then a lane-slice max. For C=64 the merged dim is exactly
    # one 128-lane register: no padding anywhere.
    h, w, c = r.shape
    r2 = r.reshape(h, w // 2, 2 * c)
    return jnp.maximum(r2[:, :, :c], r2[:, :, c:])


def _w_stage_swap(r: jax.Array) -> jax.Array:
    # Move W to the leading dim so the pair-split reshape is free.
    rt = jnp.swapaxes(r, 0, 1)         # (W, H', C)
    return jnp.swapaxes(_pair_max(rt, axis=0), 0, 1)


_W_STAGES = {'reshape': _w_stage_reshape, 'lane': _w_stage_lane,
             'swap': _w_stage_swap}


def _pool_kernel(halo_ref: object, y_ref: object, o_ref: object, *,
                 w_stage: object) -> None:
    z = jnp.concatenate([halo_ref[0], y_ref[0]], axis=0)  # (2T+1, W, C)
    lo = _neg_inf(z.dtype)
    # W stage: r[:, j] = max(z[:, j-1], z[:, j]) with col -1 = -inf pad.
    pad = jnp.full((z.shape[0], 1, z.shape[2]), lo, z.dtype)
    r = jnp.maximum(z, jnp.concatenate([pad, z[:, :-1]], axis=1))
    w1 = _W_STAGES[w_stage](r)         # (2T+1, W/2, C): cols {2t-1,2t,2t+1}
    # H stage: concat row 0 is input row 2T*i - 1 (the halo).
    e = jnp.maximum(w1[:-1], w1[1:])   # e[k] = max(rows k-1+2Ti, k+2Ti)
    o_ref[0] = _pair_max(e, axis=0)    # rows {2t-1, 2t, 2t+1}


def _block_h(h_out: int) -> int:
    for t in range(min(16, h_out), 0, -1):
        if h_out % t == 0:
            return t
    return 1


@functools.partial(jax.jit, static_argnames=('interpret', 'w_stage'))
def max_pool_3x3_s2_p1(x: jax.Array, interpret: bool = False,
                       w_stage: str = 'lane') -> jax.Array:
    """Fused 3x3/stride-2/pad-1 max pool, NHWC, H and W even.

    Grid = (batch, H/2 / block_h). Each step DMAs 2*block_h input rows
    (+1 halo row) to VMEM, pools on the VPU, and writes block_h output
    rows. Pallas double-buffers blocks across grid steps, so HBM
    transfer overlaps the VPU work of the previous tile.
    """
    n, h, w, c = x.shape
    if h % 2 or w % 2:
        raise ValueError(f'fused pool needs even H, W; got {(h, w)}')
    t = _block_h(h // 2)

    def halo_idx(b, i):
        return (b, jnp.maximum(2 * t * i - 1, 0), 0, 0)

    return pl.pallas_call(
        functools.partial(_pool_kernel, w_stage=w_stage),
        grid=(n, h // 2 // t),
        in_specs=[
            pl.BlockSpec((1, 1, w, c), halo_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * t, w, c), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, w // 2, c), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h // 2, w // 2, c), x.dtype),
        interpret=interpret,
    )(x, x)


IntOr2 = int | tuple[int, int]


def pool_fusable(x_shape: tuple[int, ...], kernel_size: IntOr2,
                 stride: IntOr2, padding: IntOr2) -> bool:
    """True when max_pool_3x3_s2_p1 computes this pool exactly."""
    def pair(v: IntOr2) -> tuple[int, int]:
        return (v, v) if isinstance(v, int) else tuple(v)
    _, h, w, _ = x_shape
    return (pair(kernel_size) == (3, 3) and pair(stride) == (2, 2)
            and pair(padding) == (1, 1) and h % 2 == 0 and w % 2 == 0)
