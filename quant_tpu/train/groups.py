"""Parameter grouping: quantized vs full-precision parameters.

The reference exposes per-layer ``quantized_parameters`` dicts grouping
each QuantConv2d's tensors by scheme "for potential per-group optimizer
treatment" (binary_conv.py:93-96) — scaffolding it never wires into an
optimizer. Here the grouping is derived functionally and IS wired in:
``optimization.optimizer.param_groups`` builds an ``optax.multi_transform``
over these labels (quant_tpu/train/optim.py), so configs can e.g. disable
weight decay or scale the lr on binary-quantized kernels — the standard
BNN training tweaks.

A param leaf is 'quantized' iff it is the conv ``kernel`` of a module
whose weight quantizer cached scales into 'quant_state' (which happens
exactly when ``w_quant != 'fp'``, layers.py WeightQuantizer); every other
leaf — biases, BN affine, fp convs/stem/head, PReLU slopes — is 'fp'.
"""

from typing import Any

from flax.traverse_util import flatten_dict, unflatten_dict


def quantized_param_labels(variables: dict[str, Any]) -> dict[str, Any]:
    """Label every params leaf 'quantized' or 'fp'.

    Args:
        variables: full variable dict holding at least 'params'; the
            'quant_state' collection (present after `model.init`) is what
            identifies quantized kernels.

    Returns:
        A pytree matching variables['params'] with string labels, ready
        for ``optax.multi_transform``.
    """
    params_flat = flatten_dict(dict(variables['params']))
    qstate_flat = flatten_dict(dict(variables.get('quant_state', {})))
    quantized_modules = {
        path[:-2] for path in qstate_flat
        if path[-2:] == ('w_quantizer', 'vs')
    }
    labels = {
        path: ('quantized'
               if path[-1] == 'kernel' and path[:-1] in quantized_modules
               else 'fp')
        for path in params_flat
    }
    return unflatten_dict(labels)
