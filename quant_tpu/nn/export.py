"""Packed-weight export for deployment.

Training produces fp32 kernels plus cached least-squares scales in
'quant_state'. For serving, the binary layers' weights are frozen sign
planes: this module packs them ONCE into a 'packed_params' collection
(int32 sign words + per-out-channel scale stacks) that the packed
inference path consumes directly, skipping the per-forward
quantize/pack work (quant_tpu/nn/layers.py QuantConv2d).

The exported collection checkpoints alongside the other variables (it is
an ordinary pytree), giving the inference engine a self-contained
artifact: 1 bit/weight for every quantized conv versus 32 in the
training checkpoint.
"""

from typing import Any

import jax


def export_packed_variables(model: Any, variables: dict[str, Any],
                            sample_input: Any) -> dict[str, Any]:
    """Compute the 'packed_params' collection for a trained model.

    Args:
        model: the model (any inference_mode; a packed clone is used).
        variables: trained variables ({params, batch_stats, quant_state}).
        sample_input: a (small) batch with the deployment input shape.

    Returns:
        variables plus the populated 'packed_params' collection.
    """
    packed_model = model.clone(inference_mode='packed')
    _, mut = packed_model.apply(variables, sample_input, False,
                                mutable=['packed_params'])
    out = dict(variables)
    out.update(mut)
    return out


def packed_weight_bytes(variables: dict[str, Any]) -> tuple[int, int]:
    """(packed_bytes, fp32_kernel_bytes) for the quantized conv weights."""
    packed = sum(leaf.size * leaf.dtype.itemsize
                 for leaf in jax.tree.leaves(
                     variables.get('packed_params', {})))
    # fp32 kernels of layers that HAVE a packed counterpart.
    fp = 0
    pp = variables.get('packed_params', {})

    def walk(params, packed_tree):
        nonlocal fp
        if not isinstance(params, dict):
            return
        for k, v in params.items():
            if isinstance(v, dict):
                walk(v, packed_tree.get(k, {})
                     if isinstance(packed_tree, dict) else {})
            elif k == 'kernel' and isinstance(packed_tree, dict) \
                    and 'w_packed' in packed_tree:
                fp += v.size * v.dtype.itemsize

    walk(variables.get('params', {}), pp)
    return packed, fp
