"""TP-sharded packed serving on a virtual device mesh.

Closes the loop between three separately-tested pieces: packed-weight
export (nn/export.py), tensor-parallel sharding of the packed words and
scale stacks (parallel/sharding.py), and the continuous-batching
InferenceEngine (serving/engine.py). The engine serves a model whose
variables live sharded over the 'model' mesh axis; results must match
the unsharded packed forward exactly (north star: packed binary weights
tensor-sharded over ICI, production serving path).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from quant_tpu.nn import QLeNet5
from quant_tpu.nn.export import export_packed_variables
from quant_tpu.parallel import make_mesh, shard_model_variables
from quant_tpu.serving.engine import InferenceEngine


def _trained_packed(rng):
    x = jnp.asarray(rng.standard_normal((8, 28, 28, 1)), jnp.float32)
    model = QLeNet5(conv1_filters=4, conv2_filters=16,
                    x_quant='ls-1', w_quant='ls-2',
                    clamp={'kind': 'symmetric', 'alpha': 2.0})
    variables = model.init(jax.random.key(0), x, True)
    _, mut = model.apply(variables, x, True,
                         mutable=['quant_state', 'batch_stats'])
    variables = {**variables, **mut}
    packed_vars = export_packed_variables(model, variables, x[:2])
    return model.clone(inference_mode='packed'), packed_vars, x


def test_engine_serves_tp_sharded_packed_model(rng):
    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices')
    packed_model, packed_vars, x = _trained_packed(rng)
    expected = np.asarray(packed_model.apply(packed_vars, x, False))

    mesh = make_mesh(model=2)
    shardings = shard_model_variables(packed_vars, mesh,
                                      tensor_parallel=True)
    sharded = jax.device_put(packed_vars, shardings)
    engine = InferenceEngine(packed_model.apply, sharded,
                             input_shape=(28, 28, 1), max_batch=8).start()
    try:
        # Synchronous path.
        got = engine.predict(np.asarray(x))
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)
        # Queued continuous-batching path.
        futs = [engine.submit(np.asarray(x[i])) for i in range(x.shape[0])]
        queued = np.stack([f.result(timeout=60) for f in futs])
        np.testing.assert_allclose(queued, expected, rtol=1e-5, atol=1e-5)
        assert engine.stats['requests'] == x.shape[0]
    finally:
        engine.stop()
