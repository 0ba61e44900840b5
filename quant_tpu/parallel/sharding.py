"""Sharding rules for train state and batches.

DP: batch axis of (N, H, W, C) inputs sharded over mesh axis 'data'.
TP: trailing out-channel axis of conv/dense kernels — and the matching
per-out-channel quantizer scale vectors in 'quant_state' — sharded over
mesh axis 'model'. GSPMD propagates these seeds through the whole train
step and inserts the collectives (psum for DP grads, all-gathers at the
fp boundaries) over ICI.
"""

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P('data'))


def _kernel_spec(path: tuple, leaf: jax.Array) -> P:
    """Out-channel (trailing-axis) sharding for conv/dense kernels."""
    names = [getattr(p, 'key', getattr(p, 'name', str(p))) for p in path]
    if names and names[-1] == 'kernel' and leaf.ndim >= 2:
        return P(*([None] * (leaf.ndim - 1) + ['model']))
    if names and names[-1] == 'bias' and leaf.ndim == 1:
        return P('model')
    return P()


def _quant_state_spec(path: tuple, leaf: jax.Array) -> P:
    """Weight-scale stacks are (k, out_channels): shard out-channels."""
    names = [getattr(p, 'key', getattr(p, 'name', str(p))) for p in path]
    if names and names[-1] == 'vs' and leaf.ndim == 2:
        return P(None, 'model')
    return P()  # activation EMA etc. replicated


def _packed_spec(path: tuple, leaf: jax.Array) -> P:
    """Packed deployment weights shard over their trailing O axis.

    w_packed is (kh, kw, Wd, O) or (k_w, kh, kw, Wd, O) — the packed
    int32 sign words themselves are tensor-sharded over ICI (north star),
    not just the fp kernels they were derived from. w_scales is
    (k_w, O)."""
    names = [getattr(p, 'key', getattr(p, 'name', str(p))) for p in path]
    if names and names[-1] == 'w_packed' and leaf.ndim >= 4:
        return P(*([None] * (leaf.ndim - 1) + ['model']))
    if names and names[-1] == 'w_scales' and leaf.ndim == 2:
        return P(None, 'model')
    return P()


def shard_model_variables(variables: dict[str, Any], mesh: Mesh,
                          tensor_parallel: bool = False) -> dict[str, Any]:
    """Compute NamedShardings for a model-variable pytree.

    With tensor_parallel=False everything is replicated (pure DP). With
    tensor_parallel=True, kernels/biases and per-out-channel quantizer
    scales shard over 'model'.
    """
    def spec_tree(tree, spec_fn):
        return jax.tree_util.tree_map_with_path(
            lambda path, leaf: NamedSharding(
                mesh, spec_fn(path, leaf) if tensor_parallel else P()),
            tree)

    out = {}
    for col, tree in variables.items():
        if col == 'params':
            out[col] = spec_tree(tree, _kernel_spec)
        elif col == 'quant_state':
            out[col] = spec_tree(tree, _quant_state_spec)
        elif col == 'packed_params':
            out[col] = spec_tree(tree, _packed_spec)
        else:
            out[col] = spec_tree(tree, lambda p, l: P())
    return out
