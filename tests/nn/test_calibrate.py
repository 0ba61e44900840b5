"""Post-training EMA calibration (nn/export.calibrate_ema_scales).

Checkpoints trained with moving_average_mode='off' have no EMA scale
state; the observer pass must create it from eval-mode forwards so the
solve-free EMA packed path and threshold-folded serving work on them.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quant_tpu.nn import QResNet
from quant_tpu.nn.export import (
    calibrate_ema_scales, export_packed_variables, fold_xnor_thresholds,
)


def _model(**kw):
    layer = {'x_quant': 'ls-1', 'w_quant': 'ls-1',
             'clamp': {'kind': 'symmetric', 'alpha': 2.0},
             'double_shortcut': True}
    return QResNet(
        block='xnor',
        layer0={'n_in_channels': 8, 'kernel_size': 3, 'stride': 1,
                'padding': 1, 'bias': False,
                'maxpool': {'type': 'identity'}},
        layer1=dict(layer), layer2=dict(layer), layer3=dict(layer),
        layer4=None, nonlins=['prelu', 'prelu'], num_blocks=[1, 1, 1],
        output_classes=10, **kw)


def test_calibration_enables_folded_serving_for_off_mode_checkpoint():
    rng = np.random.default_rng(0)
    model = _model(moving_average_mode='off')
    x = jnp.asarray(rng.standard_normal((4, 16, 16, 3)), jnp.float32)
    variables = dict(model.init(jax.random.key(0), x, True))

    # 'off' training left no EMA state.
    flat = str(jax.tree_util.tree_structure(variables['quant_state']))
    assert 'ema' not in flat

    batches = [jnp.asarray(rng.standard_normal((4, 16, 16, 3)),
                           jnp.float32) for _ in range(3)]
    calibrated = calibrate_ema_scales(model, variables, batches)
    flat = str(jax.tree_util.tree_structure(calibrated['quant_state']))
    assert 'ema' in flat and 'ema_count' in flat
    counts = [np.asarray(v) for p, v in jax.tree_util.tree_leaves_with_path(
        calibrated['quant_state']) if 'ema_count' in str(p)]
    assert counts and all(int(c) == 3 for c in counts)

    # The calibrated checkpoint now serves EMA-packed AND folded.
    ema_model = model.clone(moving_average_mode='eval_only')
    packed = ema_model.clone(inference_mode='packed')
    pv = export_packed_variables(packed, calibrated, x[:1])
    ref = packed.apply(pv, x, False)
    fv = fold_xnor_thresholds(packed, pv)
    out = packed.clone(bn_fold=True).apply(fv, x, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_calibrated_ema_tracks_eval_batch_scales():
    """The observed EMA equals the hand-computed blend of per-batch
    eval-mode scale means (momentum semantics match training EMA)."""
    from quant_tpu.nn.layers import ActivationQuantizer

    rng = np.random.default_rng(1)
    q = ActivationQuantizer(scheme='ls-1',
                            moving_average_mode='eval_only',
                            moving_average_momentum=0.9, calibrate=True)
    x0 = jnp.asarray(rng.standard_normal((3, 5)), jnp.float32)
    v = q.init(jax.random.key(0), x0, True)
    v = dict(v)
    v['quant_state'] = jax.tree.map(jnp.zeros_like, v['quant_state'])

    expect = None
    for i in range(3):
        xb = jnp.asarray(rng.standard_normal((3, 5)), jnp.float32)
        _, mut = q.apply(v, xb, False, mutable=['quant_state'])
        v['quant_state'] = mut['quant_state']
        batch_mean = float(jnp.mean(jnp.mean(jnp.abs(xb), axis=1)))
        expect = batch_mean if expect is None \
            else 0.9 * expect + 0.1 * batch_mean
    got = float(np.asarray(v['quant_state']['ema'])[0])
    assert got == pytest.approx(expect, rel=1e-5)


def test_calibrate_requires_ema_mode_and_batches():
    from quant_tpu.nn.layers import ActivationQuantizer

    q = ActivationQuantizer(scheme='ls-1', moving_average_mode='off',
                            calibrate=True)
    x = jnp.ones((2, 4), jnp.float32)
    v = q.init(jax.random.key(0), x, True)
    with pytest.raises(ValueError, match='EMA'):
        q.apply(v, x, False, mutable=['quant_state'])

    model = _model(moving_average_mode='off')
    xb = jnp.zeros((2, 16, 16, 3), jnp.float32)
    variables = model.init(jax.random.key(0), xb, True)
    with pytest.raises(ValueError, match='empty'):
        calibrate_ema_scales(model, variables, [])
