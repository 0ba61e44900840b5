"""Pipeline parallelism (GPipe microbatching over a 'pipe' mesh axis).

Parity oracle: sequentially applying the same stage stack to the full
batch. Covers forward parity, gradient parity (the transposed reverse
pipeline), a quantized xnor-style stage, and utilization accounting.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from quant_tpu.parallel.pipeline import (
    pipeline_apply, stack_stage_params, stage_sharding,
)


def _pipe_mesh(s=4):
    if len(jax.devices()) < s:
        pytest.skip(f'needs {s} virtual devices')
    return Mesh(np.asarray(jax.devices()[:s]), ('pipe',))


def _mlp_stage(params, x):
    w, b = params['w'], params['b']
    return jnp.tanh(x @ w + b)


def _sequential(stage_fn, stacked, x):
    s = jax.tree.leaves(stacked)[0].shape[0]
    for i in range(s):
        x = stage_fn(jax.tree.map(lambda v: v[i], stacked), x)
    return x


def _random_stages(rng, s, d):
    return stack_stage_params([
        {'w': jnp.asarray(rng.standard_normal((d, d)) / np.sqrt(d),
                          jnp.float32),
         'b': jnp.asarray(rng.standard_normal((d,)) * 0.1, jnp.float32)}
        for _ in range(s)])


def test_forward_matches_sequential(rng):
    mesh = _pipe_mesh()
    stacked = _random_stages(rng, 4, 8)
    mb = jnp.asarray(rng.standard_normal((6, 3, 8)), jnp.float32)
    params = jax.device_put(stacked, stage_sharding(mesh))
    out = pipeline_apply(_mlp_stage, params, mb, mesh=mesh)
    ref = jax.vmap(lambda x: _sequential(_mlp_stage, stacked, x))(mb)
    assert out.shape == mb.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_single_microbatch_and_many(rng):
    mesh = _pipe_mesh(2)
    stacked = _random_stages(rng, 2, 4)
    for m in (1, 2, 7):
        mb = jnp.asarray(rng.standard_normal((m, 2, 4)), jnp.float32)
        out = pipeline_apply(_mlp_stage, stacked, mb, mesh=mesh)
        ref = jax.vmap(lambda x: _sequential(_mlp_stage, stacked, x))(mb)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_gradient_matches_sequential(rng):
    """jax.grad through the scheduled pipeline == grad of the plain
    sequential composition (the reverse pipeline is the transpose)."""
    mesh = _pipe_mesh()
    stacked = _random_stages(rng, 4, 8)
    mb = jnp.asarray(rng.standard_normal((5, 3, 8)), jnp.float32)

    def loss_pipe(p):
        return jnp.sum(pipeline_apply(_mlp_stage, p, mb, mesh=mesh) ** 2)

    def loss_seq(p):
        out = jax.vmap(lambda x: _sequential(_mlp_stage, p, x))(mb)
        return jnp.sum(out ** 2)

    g_pipe = jax.grad(loss_pipe)(stacked)
    g_seq = jax.grad(loss_seq)(stacked)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4),
        g_pipe, g_seq)


def test_quantized_stage(rng):
    """A binary-quantized residual stage (the QResNet homogeneous-tower
    shape) pipelines bit-exactly vs its sequential application."""
    from quant_tpu.ops.quantize import quantizer_ls_1
    mesh = _pipe_mesh()

    def stage(params, x):
        n, h, wdt, c = x.shape
        _, xq = quantizer_ls_1(x.reshape(n, -1))
        _, wq = quantizer_ls_1(params['w'].reshape(c, -1))
        y = jax.lax.conv_general_dilated(
            xq.reshape(x.shape), wq.reshape(params['w'].shape),
            (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        return x + jnp.tanh(y)

    stacked = stack_stage_params([
        {'w': jnp.asarray(rng.standard_normal((3, 3, 4, 4)) * 0.2,
                          jnp.float32)} for _ in range(4)])
    mb = jnp.asarray(rng.standard_normal((4, 2, 8, 8, 4)), jnp.float32)
    out = pipeline_apply(stage, stacked, mb, mesh=mesh)
    ref = jax.vmap(lambda x: _sequential(stage, stacked, x))(mb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_stage_count_mismatch_raises(rng):
    """A leading dim of k*S (or S/k) must raise, not silently give each
    device k stage slices and drop all but the first (ADVICE round 2)."""
    mesh = _pipe_mesh(2)
    mb = jnp.asarray(rng.standard_normal((4, 2, 4)), jnp.float32)
    for s_bad in (4, 1):
        stacked = _random_stages(rng, s_bad, 4)
        with pytest.raises(ValueError, match='leading dim'):
            pipeline_apply(_mlp_stage, stacked, mb, mesh=mesh)
    # Ragged leading dims across leaves are equally invalid.
    ragged = {'w': jnp.zeros((2, 4, 4)), 'b': jnp.zeros((3, 4))}
    with pytest.raises(ValueError, match='leading dim'):
        pipeline_apply(_mlp_stage, ragged, mb, mesh=mesh)


def test_jit_and_composes_with_data_axis(rng):
    """Pipeline under jit on a ('data','pipe') mesh with batch_axis:
    each data row pipelines only its own mb-shard (true dp x pp), and
    the output keeps the mb dim sharded over 'data'."""
    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices')
    devs = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ('data', 'pipe'))
    stacked = _random_stages(rng, 4, 8)
    mb = jnp.asarray(rng.standard_normal((6, 4, 8)), jnp.float32)

    @jax.jit
    def run(p, x):
        return pipeline_apply(_mlp_stage, p, x, mesh=mesh, axis='pipe',
                              batch_axis='data')

    out = run(stacked, mb)
    ref = jax.vmap(lambda x: _sequential(_mlp_stage, stacked, x))(mb)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    assert out.sharding.spec[1] == 'data'
