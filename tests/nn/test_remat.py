"""Per-block rematerialization (arch_config.remat -> flax nn.remat).

Oracle: the non-remat model — remat must not change the function, only
the backward-pass memory/recompute schedule. Tolerance is float
reassociation noise from the recomputed forward.
"""

import jax
import jax.numpy as jnp
import numpy as np

from quant_tpu.nn import QResNet

_LAYER = {'x_quant': 'ls-1', 'w_quant': 'ls-1',
          'clamp': {'kind': 'symmetric', 'alpha': 2.0}}
_KW = dict(
    block='xnor',
    layer0={'n_in_channels': 8, 'kernel_size': 3, 'stride': 1,
            'padding': 1, 'bias': False, 'maxpool': {'type': 'identity'}},
    layer1=dict(_LAYER), layer2=dict(_LAYER), layer3=dict(_LAYER),
    layer4=dict(_LAYER), nonlins=['prelu', 'prelu'],
    num_blocks=[1, 1, 1, 1], output_classes=10)


def _loss_and_grad(model, variables, x):
    def f(params):
        out, _ = model.apply({**variables, 'params': params}, x, True,
                             mutable=['quant_state', 'batch_stats'])
        return jnp.sum(out ** 2)
    return jax.jit(jax.value_and_grad(f))(variables['params'])


def test_remat_same_params_loss_and_grads(rng):
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
    plain = QResNet(**_KW)
    remat = QResNet(**_KW, remat=True)
    variables = plain.init(jax.random.key(0), x, True)
    # Identical param pytree structure (remat is a lifted transform).
    v_remat = remat.init(jax.random.key(0), x, True)
    assert (jax.tree.structure(variables['params'])
            == jax.tree.structure(v_remat['params']))

    l0, g0 = _loss_and_grad(plain, variables, x)
    l1, g1 = _loss_and_grad(remat, variables, x)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-5, atol=1e-6), g0, g1)


def test_remat_eval_path_unchanged(rng):
    """Eval (train=False) bypasses remat entirely — identical forward."""
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)), jnp.float32)
    plain = QResNet(**_KW)
    remat = QResNet(**_KW, remat=True)
    variables = plain.init(jax.random.key(0), x, True)
    _, mut = plain.apply(variables, x, True,
                         mutable=['quant_state', 'batch_stats'])
    variables = {**variables, **mut}
    out0 = plain.apply(variables, x, False)
    out1 = remat.apply(variables, x, False)
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(out1))
