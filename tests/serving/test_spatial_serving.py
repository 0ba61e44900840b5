"""Spatially-sharded packed serving on a virtual device mesh.

The engine serves with the batched input H-banded over a 'space' mesh
axis (engine input_sharding = parallel/spatial.spatial_sharding) and the
packed variables replicated; GSPMD inserts the halo exchanges. Results
must match the unsharded packed forward — the low-latency / large-image
serving axis, end-to-end through the continuous-batching engine.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from quant_tpu.nn import QLeNet5
from quant_tpu.nn.export import export_packed_variables
from quant_tpu.parallel import spatial_sharding
from quant_tpu.serving.engine import InferenceEngine


def test_engine_serves_spatially_sharded_input(rng):
    if len(jax.devices()) < 4:
        pytest.skip('needs 4 virtual devices')
    x = jnp.asarray(rng.standard_normal((8, 28, 28, 1)), jnp.float32)
    model = QLeNet5(conv1_filters=4, conv2_filters=16,
                    x_quant='ls-1', w_quant='ls-1',
                    clamp={'kind': 'symmetric', 'alpha': 2.0})
    variables = model.init(jax.random.key(0), x, True)
    _, mut = model.apply(variables, x, True,
                         mutable=['quant_state', 'batch_stats'])
    variables = {**variables, **mut}
    packed_vars = export_packed_variables(model, variables, x[:2])
    packed_model = model.clone(inference_mode='packed')
    expected = np.asarray(packed_model.apply(packed_vars, x, False))

    mesh = Mesh(np.asarray(jax.devices()[:4]), ('space',))
    vars_rep = jax.device_put(packed_vars, NamedSharding(mesh, P()))
    engine = InferenceEngine(
        packed_model.apply, vars_rep, input_shape=(28, 28, 1),
        max_batch=8, input_sharding=spatial_sharding(mesh)).start()
    try:
        got = engine.predict(np.asarray(x))
        np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-5)
        futs = [engine.submit(np.asarray(x[i])) for i in range(x.shape[0])]
        queued = np.stack([f.result(timeout=60) for f in futs])
        np.testing.assert_allclose(queued, expected, rtol=1e-5, atol=1e-5)
    finally:
        engine.stop()
