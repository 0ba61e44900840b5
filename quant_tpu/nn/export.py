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

import logging
from typing import Any

import jax

logger = logging.getLogger(__name__)


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


def fold_bn_into_packed(model: Any, variables: dict[str, Any],
                        eps: float = 1e-5) -> dict[str, Any]:
    """Fold eval-mode BN into the packed conv epilogues (conv->BN blocks).

    Eval BN is the per-out-channel affine a*y + b with
    a = gamma/sqrt(var+eps), b = beta - mean*a. For a packed conv,
    a multiplies the per-out-channel scale stack `w_scales` (the conv's
    existing epilogue) and b (+ a*conv_bias) becomes the fused bias
    `b_fold` — serving then never executes the BN modules at all
    (apply the model with bn_fold=True). Defined for the
    regular/regular_bottleneck families, whose BN FOLLOWS each quantized
    conv (reference resnet.py:28-97 ordering); the Xnor families put BN
    before the conv, where the affine feeds the sign quantizer and
    nothing folds.

    Returns variables with a transformed 'packed_params' collection.
    """
    if 'packed_params' not in variables:
        raise ValueError('fold_bn_into_packed needs packed_params — run '
                         'export_packed_variables first.')
    block = getattr(model, 'block', None)
    if block not in ('regular', 'regular_bottleneck'):
        raise ValueError(
            f'BN folding is defined for conv->BN block families '
            f'(regular/regular_bottleneck), not {block!r}.')
    import jax.numpy as jnp

    params = variables['params']
    stats = variables['batch_stats']
    pp = jax.tree.map(lambda x: x, variables['packed_params'])  # copy

    pairs = [('conv1', 'bn1'), ('conv2', 'bn2')]
    if block == 'regular_bottleneck':
        pairs.append(('conv3', 'bn3'))

    for name, node in pp.items():
        if not (isinstance(node, dict) and name in params):
            continue
        for conv, bn in pairs:
            if conv not in node or 'w_packed' not in node[conv]:
                continue
            if bn not in params[name]:
                raise KeyError(f'{name}/{bn} missing — cannot fold')
            g = jnp.asarray(params[name][bn]['bn']['scale'])
            beta = jnp.asarray(params[name][bn]['bn']['bias'])
            mean = jnp.asarray(stats[name][bn]['bn']['mean'])
            var = jnp.asarray(stats[name][bn]['bn']['var'])
            a = g / jnp.sqrt(var + eps)
            b = beta - mean * a
            entry = dict(node[conv])
            entry['w_scales'] = jnp.asarray(entry['w_scales']) * a[None, :]
            conv_bias = params[name][conv].get('bias')
            if conv_bias is not None:
                b = b + a * jnp.asarray(conv_bias)
            entry['b_fold'] = b
            node[conv] = entry

    out = dict(variables)
    out['packed_params'] = pp
    return out


def calibrate_ema_scales(model: Any, variables: dict[str, Any],
                         batches: Any) -> dict[str, Any]:
    """Post-training EMA calibration (PTQ observer pass).

    Most published recipes train with `moving_average_mode: 'off'`
    (per-batch eval scales) — those checkpoints cannot serve
    threshold-folded, and their ls-2/ls-T eval re-solves scales per
    batch (a sort on TPU). This runs eval-mode forwards (BN on running
    stats — exactly what EMA serving sees) with the activation
    quantizers in observer mode, blending each batch's solved scales
    into fresh EMA state.

    Args:
        model: the trained model (any moving_average_mode).
        variables: its trained variables.
        batches: iterable of input batches (calibration set; a few
            hundred representative images suffice).

    Returns:
        variables with 'quant_state' carrying calibrated EMA scales;
        serve with a model cloned to an EMA mode, e.g.
        model.clone(moving_average_mode='eval_only',
        inference_mode='packed') (+ fold_xnor_thresholds where
        applicable).
    """
    calib = model.clone(moving_average_mode='eval_only', calibrate=True)
    variables = dict(variables)
    n = 0
    for batch in batches:
        _, mut = calib.apply(variables, batch, False,
                             mutable=['quant_state'])
        variables['quant_state'] = mut['quant_state']
        n += 1
    if n == 0:
        raise ValueError('calibrate_ema_scales got an empty batch '
                         'iterable — EMA state would stay untracked.')
    return variables


def fold_xnor_thresholds(model: Any, variables: dict[str, Any],
                         eps: float = 1e-5) -> dict[str, Any]:
    """Fold pre-conv BN + clamp + sign extraction into per-channel
    thresholds for the XNOR-ordering packed serving path.

    The Xnor blocks put BN BEFORE each quantized conv (reference
    resnet.py:100-190), where its eval affine y = a*x + b feeds only
    clamp+sign-plane extraction. Since the clamp preserves sign and the
    EMA eval scales don't depend on the batch, every sign plane is a
    per-channel affine threshold comparison on the RAW pre-BN tensor
    (ops/binary_infer.threshold_sign_planes) — serving then executes no
    BN modules and never materializes the BN'd feature map.

    Validity conditions, checked here on the concrete values:
      * moving_average_mode is an EMA mode with tracked batches (per
        -batch eval scales would need the actual clamp(BN(x)) VALUES);
      * |a| > 0 per channel (a zero BN scale has no threshold form);
      * for k-plane schemes under a symmetric clamp, every residual
        must stay inside the clamp box: prefix sums of the EMA scales
        through plane k-1 must be <= alpha (sign(clamp(y) - c) ==
        sign(y - c) only while |c| <= alpha).

    Writes x_thresh (C,), x_flip (C,), x_va (k, C) into each folded
    conv's packed_params. Serve with model.clone(bn_fold=True).

    Families: QResNet with block 'xnor'/'xnor_bottleneck' (every
    in-block BN), and QLeNet5 (its bn_conv2 — affine-free, eps 1e-4 —
    directly precedes the quantized conv2; reference lenet.py:85-86).
    """
    import jax.numpy as jnp
    import numpy as np

    if 'packed_params' not in variables:
        raise ValueError('fold_xnor_thresholds needs packed_params — '
                         'run export_packed_variables first.')
    block = getattr(model, 'block', None)
    is_lenet = type(model).__name__ == 'QLeNet5'
    if block not in ('xnor', 'xnor_bottleneck') and not is_lenet:
        raise ValueError(
            f'threshold folding is defined for the BN->conv (xnor) '
            f'families and QLeNet5, not {block!r}.')
    if getattr(model, 'moving_average_mode', 'off') == 'off':
        raise ValueError(
            "threshold folding requires an EMA moving_average_mode "
            "('eval_only'/'train_and_eval'): with mode 'off' the eval "
            'scales are solved from the actual clamp(BN(x)) values, '
            'which the folded path never computes. Calibrate first '
            '(nn.export.calibrate_ema_scales).')

    params = variables['params']
    stats = variables['batch_stats']
    qstate = variables.get('quant_state', {})
    pp = jax.tree.map(lambda x: x, variables['packed_params'])  # copy

    def fold_one(node, conv, g, beta, mean, var, x_scheme, clamp,
                 qs_conv, label, bn_eps):
        a = g / jnp.sqrt(var + bn_eps)
        abs_a = np.asarray(jnp.abs(a))
        if not (abs_a > 0).all():
            raise ValueError(
                f'{label}: BN scale gamma has a zero channel — '
                'no threshold form exists; serve unfolded.')
        ema = jnp.asarray(qs_conv['x_quantizer']['ema'])
        count = np.asarray(qs_conv['x_quantizer']['ema_count'])
        if not count > 0:
            raise ValueError(
                f'{label}: activation EMA has tracked no batches — '
                'train (or run a calibration pass) first.')
        if clamp.get('kind') == 'symmetric':
            ema_np = np.asarray(ema)
            if x_scheme in ('ls-2', 'ls-T'):
                # Residual before plane 2 is v1*b1 (ls-T shares v1).
                prefix = ema_np[:1]
            elif x_scheme.startswith('gf-'):
                prefix = np.cumsum(ema_np)[:-1]
            else:  # ls-1: single plane, no residual to bound
                prefix = np.zeros(0)
            alpha = float(clamp.get('alpha', 1.0))
            if prefix.size and not (prefix <= alpha).all():
                raise ValueError(
                    f'{label}: EMA scale prefix sums '
                    f'{prefix.tolist()} exceed clamp alpha {alpha} '
                    '— residual planes would leave the clamp box; '
                    'serve unfolded.')
        entry = dict(node[conv])
        entry['x_thresh'] = (-(beta - mean * a) / a).astype(jnp.float32)
        entry['x_flip'] = jnp.where(a >= 0, 1.0, -1.0).astype(
            jnp.float32)
        entry['x_va'] = (ema[:, None] / jnp.abs(a)[None, :]).astype(
            jnp.float32)
        node[conv] = entry

    if is_lenet:
        if model.x_quant == 'fp':
            raise ValueError('threshold folding is undefined for fp '
                             'activations (they consume BN values).')
        if 'conv2' in pp and 'w_packed' in pp.get('conv2', {}):
            bn = stats['bn_conv2']['bn']
            var = jnp.asarray(bn['var'])
            # bn_conv2 is affine-free (lenet.py): gamma=1, beta=0.
            fold_one(pp, 'conv2', jnp.ones_like(var),
                     jnp.zeros_like(var), jnp.asarray(bn['mean']), var,
                     model.x_quant,
                     dict(model.clamp) if model.clamp
                     else {'kind': 'identity'},
                     qstate['conv2'], 'conv2/bn_conv2', bn_eps=1e-4)
        out = dict(variables)
        out['packed_params'] = pp
        return out

    pairs = [('conv1', 'bn1'), ('conv2', 'bn2')]
    if block == 'xnor_bottleneck':
        pairs.append(('conv3', 'bn3'))

    for name, node in pp.items():
        if not (isinstance(node, dict) and name in params):
            continue
        stage_cfg = getattr(model, f'layer{name[5]}', None) or {}
        x_scheme = stage_cfg.get('x_quant', 'fp')
        if x_scheme == 'fp':
            continue  # fp activations consume BN output values directly
        clamp = stage_cfg.get('clamp') or {'kind': 'identity'}
        for conv, bn in pairs:
            if conv not in node or 'w_packed' not in node[conv]:
                continue
            if bn not in params[name]:
                raise KeyError(f'{name}/{bn} missing — cannot fold')
            fold_one(node, conv,
                     jnp.asarray(params[name][bn]['bn']['scale']),
                     jnp.asarray(params[name][bn]['bn']['bias']),
                     jnp.asarray(stats[name][bn]['bn']['mean']),
                     jnp.asarray(stats[name][bn]['bn']['var']),
                     x_scheme, clamp, qstate[name][conv],
                     f'{name}/{conv}', bn_eps=eps)

    out = dict(variables)
    out['packed_params'] = pp
    return out


def fold_for_serving(packed_model: Any, variables: dict[str, Any]
                     ) -> tuple[Any, dict[str, Any], bool]:
    """Apply the family-appropriate export-time BN elimination.

    Tries the conv->BN epilogue fold (fold_bn_into_packed), then the
    BN->conv threshold fold (fold_xnor_thresholds). Returns
    (serve_model, variables, bn_fold): the bn_fold=True clone and
    transformed variables when a fold applied, or the inputs unchanged
    when no fold is defined for the family / its preconditions are
    unmet (e.g. non-EMA scales — calibrate first). The single shared
    dispatch for every serving entry point (worker, prepare, serve
    demo, bench)."""
    try:
        try:
            folded = fold_bn_into_packed(packed_model, variables)
        except (ValueError, KeyError):
            folded = fold_xnor_thresholds(packed_model, variables)
        return packed_model.clone(bn_fold=True), folded, True
    except (ValueError, KeyError) as e:
        logger.info('BN folding not applicable (%s); serving the '
                    'unfolded packed form', e)
        return packed_model, variables, False


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
