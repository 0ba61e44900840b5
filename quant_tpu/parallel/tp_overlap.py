"""Tensor-parallel binary GEMM with communication/compute overlap.

The north-star requirement (BASELINE.json): "allgather/reduce-scatter
overlapped with popcount-GEMM compute". This module implements the
input-channel-sharded (contraction-sharded) case, where each device holds
a K/P slice of the packed activations and weights, the partial products
must be summed across devices, and the naive form serializes a full
psum AFTER all compute.

Overlapped form (`tp_binary_matmul_overlapped`): a ring reduce-scatter
interleaved with the per-shard GEMM. Each of the P steps computes one
N/P-wide output column block from the LOCAL K-shard and adds it to the
partial block received from the ring neighbor; `lax.ppermute` moves the
accumulating block one hop per step, so communication of step i rides
concurrently with the compute of step i+1 (XLA schedules the ppermute
DMA-side while the MXU runs the next block). After P steps every device
holds the fully-reduced block it owns — a reduce-scatter by construction;
a final all-gather (cheap, N bytes) restores the replicated output when
requested.

Written with shard_map so the schedule is explicit rather than left to
GSPMD (SURVEY.md §2.2's "manual shard_map + psum_scatter/ppermute where
collective-compute overlap must be scheduled explicitly").
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _local_binary_matmul(x_signs: jax.Array, w_signs: jax.Array
                         ) -> jax.Array:
    """Local-shard sign GEMM on the MXU (exact f32 accumulation)."""
    return jnp.dot(x_signs.astype(jnp.bfloat16),
                   w_signs.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)


def tp_binary_matmul_overlapped(x_signs: jax.Array, w_signs: jax.Array,
                                mesh: Mesh, axis: str = 'model',
                                gather_output: bool = True) -> jax.Array:
    """Contraction-sharded binary matmul with ring-overlapped reduction.

    Args:
        x_signs: (M, K) {-1,+1} activations, K sharded over `axis`.
        w_signs: (K, N) {-1,+1} weights, K sharded over `axis`.
        mesh: mesh containing `axis` (size P; N must divide by P).
        gather_output: all-gather the (M, N) result to every device;
            False returns the reduce-scattered (M, N/P) shard per device.

    Returns:
        (M, N) replicated result (or the local (M, N/P) shard).
    """
    p = mesh.shape[axis]
    n = w_signs.shape[1]
    assert n % p == 0, (n, p)
    nb = n // p

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(None, axis), P(axis, None)),
        out_specs=P(None, axis),
    )
    def kernel(x_loc, w_loc):
        # x_loc: (M, K/P); w_loc: (K/P, N)
        me = jax.lax.axis_index(axis)

        def step(i, acc):
            # Device me computes block (me + i) % p at step i; the acc
            # ring-shifts one hop left per step, so block b starts on
            # device b, collects one partial per hop, and after P hops
            # returns to device b fully reduced.
            blk = (me + i) % p
            w_blk = jax.lax.dynamic_slice_in_dim(w_loc, blk * nb, nb,
                                                 axis=1)
            partial_blk = _local_binary_matmul(x_loc, w_blk)
            acc = acc + partial_blk
            # Pass the accumulating block to the left neighbor; the next
            # step's GEMM overlaps with this transfer.
            acc = jax.lax.ppermute(
                acc, axis, [(j, (j - 1) % p) for j in range(p)])
            return acc

        acc = jnp.zeros((x_loc.shape[0], nb), jnp.float32)
        # Mark the carry as device-varying over the ring axis (the loop
        # body's ppermute makes it so; the initial zeros must agree).
        acc = jax.lax.pvary(acc, axis)
        acc = jax.lax.fori_loop(0, p, step, acc)
        # After P hops the block on this device is its own, fully reduced:
        # a reduce-scatter by construction.
        return acc

    out = kernel(x_signs, w_signs)
    if gather_output:
        out = jax.device_put(out, NamedSharding(mesh, P()))
    return out


def tp_binary_matmul_reference(x_signs: jax.Array, w_signs: jax.Array,
                               mesh: Optional[Mesh] = None) -> jax.Array:
    """Unsharded oracle."""
    return _local_binary_matmul(x_signs, w_signs)


def tp_packed_matmul_overlapped(x_packed: jax.Array, w_packed: jax.Array,
                                k_total: int, mesh: Mesh,
                                axis: str = 'model',
                                gather_output: bool = True) -> jax.Array:
    """The north-star form: PACKED binary operands tensor-sharded over
    ICI, ring reduce-scatter overlapped with the sign-GEMM compute.

    Both operands live bit-packed in HBM (32 signs/int32 word, 32x less
    memory + ICI-resident shard bytes than fp32); each device unpacks
    ONLY its own K-shard to +-1 bf16 on the fly and runs the same
    overlapped ring schedule as `tp_binary_matmul_overlapped` — the
    accumulating f32 block ppermutes while the next block's MXU GEMM
    runs.

    Args:
        x_packed: (M, W) int32 sign words of X (M, K), packed along K;
            W sharded over `axis`.
        w_packed: (W, N) int32 sign words of W (K, N), packed along K
            (word axis leading, as produced by
            ops.binary_gemm.pack_for_xnor); W sharded over `axis`.
        k_total: unpacked K. Must divide by 32 * mesh.shape[axis] so
            every shard unpacks without pad-bit correction.
        mesh / axis / gather_output: as in tp_binary_matmul_overlapped.
    """
    from quant_tpu.ops.packing import WORD, unpack_signs

    p = mesh.shape[axis]
    n = w_packed.shape[1]
    assert n % p == 0, (n, p)
    assert k_total % (WORD * p) == 0, (k_total, WORD, p)
    nb = n // p
    k_loc = k_total // p

    @partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(None, axis), P(axis, None)),
        out_specs=P(None, axis),
    )
    def kernel(xp_loc, wp_loc):
        x_loc = unpack_signs(xp_loc, k_loc, dtype=jnp.bfloat16)
        w_loc = unpack_signs(wp_loc.T, k_loc,
                             dtype=jnp.bfloat16).T  # (k_loc, N)
        me = jax.lax.axis_index(axis)

        def step(i, acc):
            blk = (me + i) % p
            w_blk = jax.lax.dynamic_slice_in_dim(w_loc, blk * nb, nb,
                                                 axis=1)
            acc = acc + jnp.dot(x_loc, w_blk,
                                preferred_element_type=jnp.float32)
            return jax.lax.ppermute(
                acc, axis, [(j, (j - 1) % p) for j in range(p)])

        acc = jnp.zeros((x_loc.shape[0], nb), jnp.float32)
        acc = jax.lax.pvary(acc, axis)
        return jax.lax.fori_loop(0, p, step, acc)

    out = kernel(x_packed, w_packed)
    if gather_output:
        out = jax.device_put(out, NamedSharding(mesh, P()))
    return out
