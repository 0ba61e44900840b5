"""Torch-export round trip: export(import(oracle)) must reproduce the
frozen reference state dict byte-for-byte (up to BN batch counters,
which flax does not track). If the exported dict equals the oracle,
loading it in the reference stack reproduces the reference model
exactly — the strongest standalone proof that TPU-trained checkpoints
migrate back (reference load path: quant/utils/checkpoints.py:54-104)."""

from pathlib import Path

import jax
import numpy as np
import pytest

from quant_tpu.nn import QLeNet5, QResNet
from quant_tpu.utils.torch_export import (
    export_lenet_state_dict,
    export_resnet_state_dict,
    export_state_dict,
)
from quant_tpu.utils.torch_import import (
    import_lenet_state_dict,
    import_resnet_state_dict,
    merge_imported,
)

ORACLE_DIR = Path(__file__).resolve().parents[1] / 'data_oracle'

# flax cannot know torch's BN batch counters; exported as 0.
_SYNTH = 'num_batches_tracked'


def _load(name):
    path = ORACLE_DIR / name
    if not path.exists():
        pytest.skip(f'{name} missing; run tools/gen_model_oracle.py')
    data = np.load(path)
    return {k[4:]: data[k] for k in data.files if k.startswith('sd::')}


def _assert_round_trip(oracle_sd, exported):
    assert set(exported) == set(oracle_sd)
    for k, v in exported.items():
        ref = oracle_sd[k]
        assert v.shape == ref.shape, k
        if k.endswith(_SYNTH) and 'moving_avg_module' not in k:
            continue  # BN counter: synthesized, value not recoverable
        np.testing.assert_allclose(v, ref, rtol=0, atol=0, err_msg=k)


def test_resnet_export_round_trip():
    sd = _load('resnet_small_ls2_ls1.npz')
    layer = {'x_quant': 'ls-2', 'w_quant': 'ls-1',
             'clamp': {'kind': 'symmetric', 'alpha': 2.0},
             'double_shortcut': True}
    model = QResNet(
        block='xnor',
        layer0={'n_in_channels': 8, 'kernel_size': 3, 'stride': 1,
                'padding': 1, 'bias': False,
                'maxpool': {'type': 'identity'}},
        layer1=dict(layer), layer2=dict(layer), layer3=dict(layer),
        layer4=None, nonlins=['prelu', 'prelu'], num_blocks=[1, 1, 1],
        output_classes=10, moving_average_mode='eval_only')
    variables = model.init(jax.random.key(0),
                           np.zeros((2, 16, 16, 3), np.float32), True)
    variables = merge_imported(
        variables, import_resnet_state_dict(sd, num_blocks=[1, 1, 1]))
    exported = export_resnet_state_dict(variables, num_blocks=[1, 1, 1],
                                        momentum=0.99)
    _assert_round_trip(sd, exported)


def test_lenet_export_round_trip():
    sd = _load('lenet_ls1_ls1.npz')
    model = QLeNet5(conv1_filters=8, conv2_filters=12,
                    x_quant='ls-1', w_quant='ls-1',
                    moving_average_mode='eval_only')
    variables = model.init(jax.random.key(0),
                           np.zeros((2, 28, 28, 1), np.float32), True)
    variables = merge_imported(
        variables, import_lenet_state_dict(sd, conv2_filters=12))
    exported = export_lenet_state_dict(variables, conv2_filters=12,
                                       momentum=0.99)
    _assert_round_trip(sd, exported)


def test_export_dispatch_and_guards():
    sd = _load('lenet_ls1_ls1.npz')
    model = QLeNet5(conv1_filters=8, conv2_filters=12,
                    x_quant='ls-1', w_quant='ls-1',
                    moving_average_mode='eval_only')
    variables = model.init(jax.random.key(0),
                           np.zeros((2, 28, 28, 1), np.float32), True)
    variables = merge_imported(
        variables, import_lenet_state_dict(sd, conv2_filters=12))
    out = export_state_dict('lenet5', variables,
                            {'conv2_filters': 12})
    assert 'conv2.w_approximate.v1' in out
    with pytest.raises(ValueError, match='bottleneck'):
        export_state_dict('resnet', variables,
                          {'block': 'xnor_bottleneck',
                           'num_blocks': [1, 1, 1]})
    with pytest.raises(ValueError, match='not exportable'):
        export_state_dict('vit', variables, {})


def test_export_mode_off_synthesizes_moving_avg_buffers():
    """moving_average_mode='off' models track no EMA state, but the
    reference ActivationQuantizer registers moving_avg_module buffers
    unconditionally (activation_quantization.py:65) — a strict
    load_state_dict in the reference needs them synthesized."""
    model = QLeNet5(conv1_filters=8, conv2_filters=12,
                    x_quant='ls-2', w_quant='ls-1',
                    moving_average_mode='off')
    variables = model.init(jax.random.key(0),
                           np.zeros((2, 28, 28, 1), np.float32), True)
    out = export_state_dict('lenet5', variables,
                            {'conv2_filters': 12, 'x_quant': 'ls-2'})
    mam = 'conv2.x_approximate.moving_avg_module'
    assert out[f'{mam}.moving_average'].shape == (2,)  # k of ls-2
    assert out[f'{mam}.momentum'].shape == (2,)
    assert int(out[f'{mam}.num_batches_tracked']) == 0


def test_export_missing_required_leaf_raises():
    model = QLeNet5(conv1_filters=8, conv2_filters=12,
                    x_quant='ls-1', w_quant='ls-1')
    variables = model.init(jax.random.key(0),
                           np.zeros((2, 28, 28, 1), np.float32), True)
    broken = jax.tree.map(lambda x: x, variables)
    del broken['params']['fc2']['bias']
    with pytest.raises(KeyError, match='fc2/bias'):
        export_lenet_state_dict(broken, conv2_filters=12)


def test_export_torch_load_round_trip():
    """numpy_to_state_dict wraps tensors torch.load/save can handle and
    the torch (cpu) tensors match the arrays."""
    torch = pytest.importorskip('torch')
    from quant_tpu.utils.torch_export import numpy_to_state_dict
    sd = _load('lenet_ls1_ls1.npz')
    tsd = numpy_to_state_dict(sd)
    for k, v in tsd.items():
        assert isinstance(v, torch.Tensor)
        np.testing.assert_array_equal(v.numpy(), sd[k])
