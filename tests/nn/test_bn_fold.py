"""Export-time BN folding parity (VERDICT r3 weak #5).

Eval-mode BN after a packed conv is a per-out-channel affine that folds
algebraically into the conv's scale epilogue + bias. The folded serving
path (bn_fold=True + fold_bn_into_packed variables) must match the
unfolded packed path numerically while executing no BN modules."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quant_tpu.nn import QResNet
from quant_tpu.nn.export import (
    export_packed_variables, fold_bn_into_packed,
)


def _model(block, **kw):
    layer = {'x_quant': 'ls-1', 'w_quant': 'ls-1',
             'clamp': {'kind': 'symmetric', 'alpha': 2.0}}
    return QResNet(
        block=block,
        layer0={'n_in_channels': 8, 'kernel_size': 3, 'stride': 1,
                'padding': 1, 'bias': False,
                'maxpool': {'type': 'identity'}},
        layer1=dict(layer), layer2=dict(layer), layer3=dict(layer),
        layer4=None, nonlins=['prelu', 'prelu'], num_blocks=[1, 1, 1],
        output_classes=10, moving_average_mode='eval_only', **kw)


def _perturb_bn(variables, rng):
    """Give every BN non-trivial affine + stats so the fold is not a
    near-identity (fresh init has scale=1, bias=0, mean=0, var=1)."""
    def bump(tree, leaf_fn):
        return jax.tree_util.tree_map_with_path(leaf_fn, tree)

    def params_fn(path, leaf):
        names = [getattr(p, 'key', '') for p in path]
        if 'bn' in names and names[-1] in ('scale', 'bias'):
            return jnp.asarray(
                rng.uniform(-1.2, 1.5, leaf.shape), leaf.dtype)
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

    out = dict(variables)
    out['params'] = bump(variables['params'], params_fn)
    out['batch_stats'] = bump(variables['batch_stats'], stats_fn)
    out['quant_state'] = jax.tree.map(
        lambda v: jnp.asarray(rng.uniform(0.1, 0.9, v.shape), v.dtype),
        variables['quant_state'])
    return out


@pytest.mark.parametrize('block', ['regular', 'regular_bottleneck'])
def test_bn_fold_parity(block):
    rng = np.random.default_rng(0)
    model = _model(block)
    x = jnp.asarray(rng.standard_normal((4, 16, 16, 3)), jnp.float32)
    variables = _perturb_bn(model.init(jax.random.key(0), x, True), rng)

    packed = model.clone(inference_mode='packed')
    pvars = export_packed_variables(packed, variables, x[:1])
    ref = packed.apply(pvars, x, False)

    fvars = fold_bn_into_packed(packed, pvars)
    folded_model = packed.clone(bn_fold=True)
    out = folded_model.apply(fvars, x, False)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_bn_fold_rejects_xnor():
    model = _model('xnor')
    with pytest.raises(ValueError, match='regular'):
        fold_bn_into_packed(model, {'packed_params': {}})


def test_bn_fold_requires_packed_params():
    model = _model('regular')
    with pytest.raises(ValueError, match='packed_params'):
        fold_bn_into_packed(model, {'params': {}})


def test_fold_mismatch_raises_both_ways():
    """Folded variables through an unfolded model (BN would apply
    twice) and bn_fold=True without folded variables both raise."""
    rng = np.random.default_rng(1)
    model = _model('regular')
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
    variables = _perturb_bn(model.init(jax.random.key(0), x, True), rng)
    packed = model.clone(inference_mode='packed')
    pvars = export_packed_variables(packed, variables, x[:1])
    fvars = fold_bn_into_packed(packed, pvars)

    with pytest.raises(ValueError, match='bn_fold=True'):
        packed.apply(fvars, x, False)  # folded vars, unfolded model
    with pytest.raises(ValueError, match='b_fold'):
        packed.clone(bn_fold=True).apply(pvars, x, False)
