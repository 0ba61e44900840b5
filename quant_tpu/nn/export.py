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


def strip_for_deployment(variables: dict[str, Any]) -> dict[str, Any]:
    """Drop what serving never reads: fp32 kernels and cached weight
    scales of every layer that has packed_params.

    The result is the minimal serving artifact (1 bit/weight for the
    quantized convs; biases, fp stem/head/shortcut params, BN stats and
    activation-EMA scales kept). QuantConv2d detects the absent kernel
    and serves purely from packed_params — restoring this artifact into
    a training run is NOT possible (the fp32 master weights are gone).
    """
    if 'packed_params' not in variables:
        raise ValueError('strip_for_deployment needs packed_params — '
                         'run export_packed_variables first.')
    pp = variables['packed_params']

    def strip(tree, packed_tree, drop_key):
        if not isinstance(tree, dict):
            return tree
        out = {}
        for k, v in tree.items():
            sub_packed = (packed_tree.get(k, {})
                          if isinstance(packed_tree, dict) else {})
            if k == drop_key and isinstance(packed_tree, dict) \
                    and 'w_packed' in packed_tree:
                continue
            if isinstance(v, dict):
                out[k] = strip(v, sub_packed, drop_key)
            else:
                out[k] = v
        return out

    out = dict(variables)
    out['params'] = strip(variables.get('params', {}), pp, 'kernel')
    if 'quant_state' in variables:
        out['quant_state'] = strip(variables['quant_state'], pp,
                                   'w_quantizer')
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
