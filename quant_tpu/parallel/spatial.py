"""Spatial partitioning: H-axis-sharded convs/pools with halo exchange.

The reference has no sequence/context parallelism to mirror (vision CNNs,
SURVEY.md §2.2) — the CNN analog is sharding the activation *spatial* axis
across devices, which is how images larger than per-chip HBM (or
latency-critical single images) are served. Two forms live here:

* **Explicit halo exchange** (`halo_exchange_conv2d`,
  `halo_exchange_max_pool2d`): shard_map kernels where each device holds
  an H/P row band of the NHWC activations, trades `kh - 1` boundary rows
  with its mesh neighbors via `lax.ppermute`, and runs a local conv /
  reduce_window — the spatial analog of ring-overlapped TP: the halo DMA
  of one layer can ride concurrently with compute on the interior rows.
* **GSPMD spatial sharding** (`spatial_sharding`): the idiomatic path —
  annotate the H axis with a mesh axis and let XLA partition the convs
  itself (tested for parity in tests/parallel/test_spatial.py).

Geometry contract: these kernels support the "shape-preserving modulo
stride" convs CNN trunks are built from — output height must equal
H // stride (true for every conv/pool in QLeNet5/QResNet: 3x3/s1/p1,
3x3/s2/p1, 1x1/s2/p0, 7x7/s2/p3, pool 3x3/s2/p1). Arbitrary VALID convs
that shrink H are rejected at trace time.
"""

from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from quant_tpu.ops.conv import IntOr2, _pair


def spatial_sharding(mesh: Mesh, axis: str = 'space',
                     batch_axis: Optional[str] = None) -> NamedSharding:
    """NHWC activation sharding with the H axis split over `axis`."""
    return NamedSharding(mesh, P(batch_axis, axis))


def _halo_geometry(h_loc: int, kh: int, sh: int, ph: int, p: int
                   ) -> tuple[int, int]:
    """Validate the sharded-H geometry and return (halo_top, halo_bot).

    Device d owns input rows [d*h_loc, (d+1)*h_loc) and produces output
    rows [d*h_loc//sh, (d+1)*h_loc//sh). The first local output window
    starts at global row d*h_loc - ph (needs ph rows from above); the
    last reaches kh - sh - ph rows below the band.
    """
    if h_loc % sh:
        raise ValueError(
            f'local height {h_loc} must divide by stride {sh}')
    if ph >= kh:
        raise ValueError(f'padding {ph} >= kernel {kh} unsupported')
    h = h_loc * p
    out_global = (h + 2 * ph - kh) // sh + 1
    if out_global != h // sh:
        raise ValueError(
            f'conv geometry (kh={kh}, stride={sh}, pad={ph}) is not '
            f'shape-preserving modulo stride on H={h}; spatial '
            f'partitioning needs out_H == H // stride')
    halo_top = ph
    halo_bot = max(0, kh - sh - ph)
    if max(halo_top, halo_bot) > h_loc:
        raise ValueError(
            f'halo ({halo_top}, {halo_bot}) exceeds the local band '
            f'{h_loc}; use fewer spatial shards')
    return halo_top, halo_bot


def _exchange_halos(x_loc: jax.Array, halo_top: int, halo_bot: int,
                    axis: str, p: int, pad_value: float) -> jax.Array:
    """Concatenate neighbor halo rows onto the local (N, H/P, W, C) band.

    Non-cyclic ppermutes deliver zeros at the global edges; those rows
    are overwritten with `pad_value` (0 for conv, -inf for maxpool), so
    the global torch-style symmetric padding falls out of the exchange.
    """
    idx = lax.axis_index(axis)
    parts = []
    if halo_top:
        top = lax.ppermute(x_loc[:, -halo_top:], axis,
                           [(j, j + 1) for j in range(p - 1)])
        top = jnp.where(idx == 0, jnp.full_like(top, pad_value), top)
        parts.append(top)
    parts.append(x_loc)
    if halo_bot:
        bot = lax.ppermute(x_loc[:, :halo_bot], axis,
                           [(j + 1, j) for j in range(p - 1)])
        bot = jnp.where(idx == p - 1, jnp.full_like(bot, pad_value), bot)
        parts.append(bot)
    return jnp.concatenate(parts, axis=1) if len(parts) > 1 else x_loc


def halo_exchange_conv2d(x: jax.Array, w: jax.Array, *,
                         mesh: Mesh, axis: str = 'space',
                         batch_axis: Optional[str] = None,
                         stride: IntOr2 = 1, padding: IntOr2 = 0,
                         bias: Optional[jax.Array] = None,
                         preferred_element_type: Any = jnp.float32
                         ) -> jax.Array:
    """Conv2d with the H axis of x sharded over `axis` (halo exchange).

    Args:
        x: (N, H, W, Cin) with H sharded over mesh axis `axis` (and the
            batch optionally over `batch_axis`).
        w: (kh, kw, Cin, Cout) filters, replicated.
        stride/padding: ints or (h, w) pairs, reference nn.Conv2d
            semantics (symmetric integer padding).

    Returns:
        (N, H // stride_h, W_out, Cout), sharded like x.
    """
    p = mesh.shape[axis]
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    kh = w.shape[0]
    if x.shape[1] % p:
        raise ValueError(f'H={x.shape[1]} must divide by shards {p}')
    halo_top, halo_bot = _halo_geometry(x.shape[1] // p, kh, sh, ph, p)
    band = P(batch_axis, axis)

    @partial(jax.shard_map, mesh=mesh, in_specs=(band, P(), P()),
             out_specs=band)
    def kernel(x_loc, w_rep, bias_rep):
        x_ext = _exchange_halos(x_loc, halo_top, halo_bot, axis, p, 0.0)
        y = lax.conv_general_dilated(
            x_ext, w_rep, window_strides=(sh, sw),
            padding=((0, 0), (pw, pw)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            preferred_element_type=preferred_element_type)
        if bias_rep is not None:
            y = y + bias_rep
        return y

    return kernel(x, w, bias)


def halo_exchange_max_pool2d(x: jax.Array, *, mesh: Mesh,
                             axis: str = 'space',
                             batch_axis: Optional[str] = None,
                             kernel_size: IntOr2, stride: IntOr2,
                             padding: IntOr2 = 0) -> jax.Array:
    """Max pool with the H axis of x sharded over `axis` (halo exchange)."""
    p = mesh.shape[axis]
    kh, kw = _pair(kernel_size)
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    if x.shape[1] % p:
        raise ValueError(f'H={x.shape[1]} must divide by shards {p}')
    halo_top, halo_bot = _halo_geometry(x.shape[1] // p, kh, sh, ph, p)
    band = P(batch_axis, axis)

    @partial(jax.shard_map, mesh=mesh, in_specs=band, out_specs=band)
    def kernel(x_loc):
        x_ext = _exchange_halos(x_loc, halo_top, halo_bot, axis, p,
                                -jnp.inf)
        return lax.reduce_window(
            x_ext, -jnp.inf, lax.max,
            window_dimensions=(1, kh, kw, 1),
            window_strides=(1, sh, sw, 1),
            padding=((0, 0), (0, 0), (pw, pw), (0, 0)))

    return kernel(x)
