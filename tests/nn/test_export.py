"""Packed-weight export tests."""

import jax
import jax.numpy as jnp
import numpy as np

from quant_tpu.nn import QLeNet5
from quant_tpu.nn.export import export_packed_variables, packed_weight_bytes


def _trained(model, x):
    v = model.init(jax.random.key(0), x, True)
    _, mut = model.apply(v, x, True, mutable=['quant_state', 'batch_stats'])
    return {**v, **mut}


def test_export_roundtrip_matches_inline_packing(rng):
    x = jnp.asarray(rng.standard_normal((4, 28, 28, 1)), jnp.float32)
    model = QLeNet5(conv1_filters=4, conv2_filters=6,
                    x_quant='ls-1', w_quant='ls-2')
    variables = _trained(model, x)
    packed_model = model.clone(inference_mode='packed')

    inline = packed_model.apply(variables, x, False)
    exported = export_packed_variables(model, variables, x[:1])
    assert 'packed_params' in exported
    stored = packed_model.apply(exported, x, False)
    np.testing.assert_allclose(np.asarray(stored), np.asarray(inline),
                               rtol=1e-5, atol=1e-5)


def test_export_weight_bytes_32x_smaller(rng):
    x = jnp.asarray(rng.standard_normal((2, 28, 28, 1)), jnp.float32)
    # Packing is along input channels; with Cin=64 (two full words) the
    # sign words are a true 1 bit/weight.
    model = QLeNet5(conv1_filters=64, conv2_filters=8,
                    x_quant='ls-1', w_quant='ls-1')
    variables = _trained(model, x)
    exported = export_packed_variables(model, variables, x[:1])
    packed_b, fp_b = packed_weight_bytes(exported)
    assert packed_b > 0 and fp_b > 0
    # 1 bit/weight + small scale vectors vs 32 bits fp32.
    assert packed_b < fp_b / 25


def test_exported_collection_checkpoints(rng, tmp_path):
    from quant_tpu.utils.checkpoints import (restore_checkpoint,
                                             save_checkpoint)
    x = jnp.asarray(rng.standard_normal((2, 28, 28, 1)), jnp.float32)
    model = QLeNet5(conv1_filters=4, conv2_filters=6,
                    x_quant='ls-1', w_quant='ls-1')
    exported = export_packed_variables(model, _trained(model, x), x[:1])
    save_checkpoint(tmp_path / 'ck', exported, epoch=1)
    restored = restore_checkpoint(tmp_path / 'ck' / 'checkpoint_1')
    assert 'packed_params' in restored
    out = model.clone(inference_mode='packed').apply(
        jax.tree.map(jnp.asarray, restored), x, False)
    want = model.clone(inference_mode='packed').apply(exported, x, False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-6)
