"""Threshold folding parity for the xnor (BN->conv) packed path
(VERDICT r4 #1).

In packed eval with EMA scales, the pre-conv BN + clamp + sign-plane
extraction is a per-channel affine threshold comparison on the RAW
block input (sign(clamp(BN(x))) = flip * sign(x - t); residual planes
likewise while the EMA scale prefix sums stay inside the clamp box).
The folded serving path (bn_fold=True + fold_xnor_thresholds variables)
must match the unfolded packed path numerically while executing no BN
modules."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quant_tpu.nn import QResNet
from quant_tpu.nn.export import (
    export_packed_variables, fold_xnor_thresholds,
)


def _model(block='xnor', x_quant='ls-1', w_quant='ls-1',
           clamp=None, **kw):
    layer = {'x_quant': x_quant, 'w_quant': w_quant,
             'clamp': clamp or {'kind': 'symmetric', 'alpha': 2.0}}
    if block == 'xnor':
        layer['double_shortcut'] = kw.pop('double_shortcut', True)
    return QResNet(
        block=block,
        layer0={'n_in_channels': 8, 'kernel_size': 3, 'stride': 1,
                'padding': 1, 'bias': False,
                'maxpool': {'type': 'identity'}},
        layer1=dict(layer), layer2=dict(layer), layer3=dict(layer),
        layer4=None, nonlins=['prelu', 'prelu'], num_blocks=[1, 1, 1],
        output_classes=10,
        **{'moving_average_mode': 'eval_only', **kw})


def _perturb(variables, rng, ema_lo=0.1, ema_hi=0.9):
    """Non-trivial BN affines/stats (including NEGATIVE gammas, which
    flip the fold's per-channel sign) and tracked EMA scales."""
    def bump(tree, leaf_fn):
        return jax.tree_util.tree_map_with_path(leaf_fn, tree)

    def params_fn(path, leaf):
        names = [getattr(p, 'key', '') for p in path]
        if 'bn' in names and names[-1] == 'scale':
            mag = rng.uniform(0.3, 1.5, leaf.shape)
            sgn = np.where(rng.random(leaf.shape) < 0.3, -1.0, 1.0)
            return jnp.asarray(mag * sgn, leaf.dtype)
        if 'bn' in names and names[-1] == 'bias':
            return jnp.asarray(
                rng.uniform(-0.8, 0.8, leaf.shape), leaf.dtype)
        return leaf

    def stats_fn(path, leaf):
        names = [getattr(p, 'key', '') for p in path]
        if names[-1] == 'mean':
            return jnp.asarray(
                rng.uniform(-0.5, 0.5, leaf.shape), leaf.dtype)
        if names[-1] == 'var':
            return jnp.asarray(
                rng.uniform(0.2, 2.0, leaf.shape), leaf.dtype)
        return leaf

    def quant_fn(path, leaf):
        names = [getattr(p, 'key', '') for p in path]
        if names[-1] == 'ema_count':
            return jnp.ones_like(leaf)
        return jnp.asarray(
            rng.uniform(ema_lo, ema_hi, leaf.shape), leaf.dtype)

    out = dict(variables)
    out['params'] = bump(variables['params'], params_fn)
    out['batch_stats'] = bump(variables['batch_stats'], stats_fn)
    out['quant_state'] = bump(variables['quant_state'], quant_fn)
    return out


def _fold_pair(model, rng, batch=4):
    x = jnp.asarray(rng.standard_normal((batch, 16, 16, 3)), jnp.float32)
    variables = _perturb(model.init(jax.random.key(0), x, True), rng)
    packed = model.clone(inference_mode='packed')
    pvars = export_packed_variables(packed, variables, x[:1])
    ref = packed.apply(pvars, x, False)
    fvars = fold_xnor_thresholds(packed, pvars)
    out = packed.clone(bn_fold=True).apply(fvars, x, False)
    return np.asarray(ref), np.asarray(out), pvars, fvars, packed, x


@pytest.mark.parametrize('x_quant', ['ls-1', 'ls-2', 'ls-T', 'gf-2'])
def test_threshold_fold_parity_schemes(x_quant):
    rng = np.random.default_rng(0)
    model = _model(x_quant=x_quant,
                   w_quant='ls-1' if x_quant != 'ls-2' else 'ls-2')
    ref, out, *_ = _fold_pair(model, rng)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize('block,ds', [('xnor', False),
                                      ('xnor_bottleneck', None)])
def test_threshold_fold_parity_block_variants(block, ds):
    rng = np.random.default_rng(1)
    kw = {} if ds is None else {'double_shortcut': ds}
    model = _model(block=block, **kw)
    ref, out, *_ = _fold_pair(model, rng)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_threshold_fold_parity_identity_clamp():
    rng = np.random.default_rng(2)
    model = _model(clamp={'kind': 'identity'}, x_quant='ls-2')
    ref, out, *_ = _fold_pair(model, rng)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_threshold_fold_sign_planes_bit_exact():
    """The folded sign planes (not just the logits) are bit-identical
    to the unfolded extraction on random data."""
    from quant_tpu.ops.binary_infer import (
        activation_sign_planes, threshold_sign_planes,
    )
    from quant_tpu.ops.quantize import get_clamp_fn

    rng = np.random.default_rng(3)
    n, c = 5, 16
    x = jnp.asarray(rng.standard_normal((n, 7, 7, c)), jnp.float32)
    a = jnp.asarray(rng.uniform(0.3, 1.5, c) *
                    np.where(rng.random(c) < 0.5, -1, 1), jnp.float32)
    b = jnp.asarray(rng.uniform(-0.8, 0.8, c), jnp.float32)
    alpha = 2.0
    clamp = get_clamp_fn(kind='symmetric', alpha=alpha)

    for scheme, k in (('ls-1', 1), ('ls-2', 2), ('ls-T', 1), ('gf-3', 3)):
        ema = jnp.asarray(rng.uniform(0.1, 0.5, (k,)), jnp.float32)
        vs = jnp.broadcast_to(ema[:, None], (k, n))
        z = clamp(a * x + b)
        want, want_scales = activation_sign_planes(
            z, scheme, vs, dtype=jnp.float32)
        got, got_scales = threshold_sign_planes(
            x, scheme, vs, thresh=-b / a,
            flip=jnp.where(a >= 0, 1.0, -1.0),
            va=ema[:, None] / jnp.abs(a)[None, :], dtype=jnp.float32)
        assert len(got) == len(want)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
        for g, w in zip(got_scales, want_scales):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_threshold_fold_requires_ema_mode():
    rng = np.random.default_rng(4)
    model = _model(moving_average_mode='off')
    x = jnp.zeros((2, 16, 16, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x, True)
    packed = model.clone(inference_mode='packed')
    pvars = export_packed_variables(packed, variables, x[:1])
    with pytest.raises(ValueError, match='EMA'):
        fold_xnor_thresholds(packed, pvars)
    del rng


def test_threshold_fold_rejects_regular_family():
    model = _model(block='xnor')  # build an xnor one for vars shape
    regular = model.clone(block='regular')
    with pytest.raises(ValueError, match='xnor'):
        fold_xnor_thresholds(regular, {'packed_params': {}})


def test_threshold_fold_rejects_scale_outside_clamp():
    """EMA prefix sums above the clamp alpha invalidate the residual
    plane equivalence — the fold must refuse."""
    rng = np.random.default_rng(5)
    model = _model(x_quant='ls-2',
                   clamp={'kind': 'symmetric', 'alpha': 0.5})
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
    variables = _perturb(model.init(jax.random.key(0), x, True), rng,
                         ema_lo=0.8, ema_hi=0.9)  # v1 > alpha=0.5
    packed = model.clone(inference_mode='packed')
    pvars = export_packed_variables(packed, variables, x[:1])
    with pytest.raises(ValueError, match='clamp'):
        fold_xnor_thresholds(packed, pvars)


def test_threshold_fold_mismatch_raises_both_ways():
    rng = np.random.default_rng(6)
    model = _model()
    _, _, pvars, fvars, packed, x = _fold_pair(model, rng, batch=2)
    with pytest.raises(ValueError, match='bn_fold=True'):
        packed.apply(fvars, x, False)  # folded vars, unfolded model
    with pytest.raises(ValueError, match='x_thresh'):
        packed.clone(bn_fold=True).apply(pvars, x, False)


def test_threshold_fold_lenet_parity():
    """QLeNet5's bn_conv2 (affine-free, eps 1e-4) directly precedes the
    quantized conv2 — the same foldable BN->conv pattern."""
    from quant_tpu.nn import QLeNet5

    rng = np.random.default_rng(7)
    model = QLeNet5(conv1_filters=4, conv2_filters=4,
                    x_quant='ls-2', w_quant='ls-1',
                    clamp={'kind': 'symmetric', 'alpha': 2.0},
                    moving_average_mode='eval_only')
    x = jnp.asarray(rng.standard_normal((4, 28, 28, 1)), jnp.float32)
    variables = _perturb(model.init(jax.random.key(0), x, True), rng)
    packed = model.clone(inference_mode='packed')
    pvars = export_packed_variables(packed, variables, x[:1])
    ref = packed.apply(pvars, x, False)
    fvars = fold_xnor_thresholds(packed, pvars)
    flat = str(jax.tree_util.tree_structure(fvars['packed_params']))
    assert 'x_thresh' in flat
    out = packed.clone(bn_fold=True).apply(fvars, x, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
