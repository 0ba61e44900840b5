"""Generate model-level eval-parity oracles from the PyTorch reference.

Torch-only script (never import jax here — conflicting OpenMP runtimes
deadlock; see tools/gen_reference_oracle.py). Builds reference models,
warms their quantizer/BN buffers with a few train-mode forwards, runs an
eval forward on fixed inputs, and dumps {state_dict, input, logits} to an
.npz. The jax-side test (tests/nn/test_torch_import.py) imports the
state dict through quant_tpu.utils.torch_import and must reproduce the
logits — end-to-end eval parity of the FULL architecture.

Usage: python tools/gen_model_oracle.py <out_dir> [--full-resnet18]
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, '/root/reference')
import torch  # noqa: E402
import torch.nn.functional as F  # noqa: E402

from quant.models.lenet import QLeNet5  # noqa: E402
from quant.models.resnet import QResNet  # noqa: E402


def _dump(model, x_warm, x_test, out_path: Path) -> None:
    torch.manual_seed(0)
    model.train()
    with torch.no_grad():
        for i in range(3):
            model(x_warm)
    model.eval()
    with torch.no_grad():
        logits = model(x_test)
    out = {'input': x_test.numpy(), 'logits': logits.numpy()}
    for k, v in model.state_dict().items():
        out[f'sd::{k}'] = v.numpy()
    np.savez_compressed(out_path, **out)
    print(f'wrote {out_path}')


def small_resnet(out_dir: Path) -> None:
    layer = {'x_quant': 'ls-2', 'w_quant': 'ls-1',
             'clamp': {'kind': 'symmetric', 'alpha': 2.0},
             'double_shortcut': True}
    torch.manual_seed(42)
    m = QResNet(
        F.cross_entropy, 'xnor',
        layer0={'n_in_channels': 8, 'kernel_size': 3, 'stride': 1,
                'padding': 1, 'bias': False,
                'maxpool': {'type': 'identity'}},
        layer1=dict(layer), layer2=dict(layer), layer3=dict(layer),
        layer4=None,
        nonlins=['prelu', 'prelu'], num_blocks=[1, 1, 1],
        output_classes=10, moving_average_mode='eval_only')
    rng = np.random.default_rng(1)
    xw = torch.from_numpy(
        rng.standard_normal((8, 3, 16, 16)).astype(np.float32))
    xt = torch.from_numpy(
        rng.standard_normal((4, 3, 16, 16)).astype(np.float32))
    _dump(m, xw, xt, out_dir / 'resnet_small_ls2_ls1.npz')


def full_resnet18(out_dir: Path) -> None:
    """The flagship: ImageNet ResNet-18 xnor, ls-2 act x ls-1 weight
    (reference examples/imagenet/imagenet_ls1_weight_ls2_activation_kd
    .yaml architecture)."""
    layer = {'x_quant': 'ls-2', 'w_quant': 'ls-1',
             'clamp': {'kind': 'symmetric', 'alpha': 2.0},
             'double_shortcut': True}
    torch.manual_seed(42)
    m = QResNet(
        F.cross_entropy, 'xnor',
        layer0={'n_in_channels': 64, 'kernel_size': 7, 'stride': 2,
                'padding': 3, 'bias': False,
                'maxpool': {'type': 'maxpool2d', 'kernel_size': 3,
                            'stride': 2, 'padding': 1}},
        layer1=dict(layer), layer2=dict(layer), layer3=dict(layer),
        layer4=dict(layer),
        nonlins=['prelu', 'prelu'], num_blocks=[2, 2, 2, 2],
        output_classes=1000, moving_average_mode='eval_only')
    rng = np.random.default_rng(2)
    xw = torch.from_numpy(
        rng.standard_normal((4, 3, 224, 224)).astype(np.float32))
    xt = torch.from_numpy(
        rng.standard_normal((2, 3, 224, 224)).astype(np.float32))
    _dump(m, xw, xt, out_dir / 'resnet18_full_ls2_ls1.npz')


def lenet(out_dir: Path) -> None:
    torch.manual_seed(7)
    m = QLeNet5(F.nll_loss, conv1_filters=8, conv2_filters=12,
                output_classes=10, x_quant='ls-1', w_quant='ls-1',
                clamp={'kind': 'identity'},
                moving_average_mode='eval_only')
    rng = np.random.default_rng(3)
    xw = torch.from_numpy(
        rng.standard_normal((8, 1, 28, 28)).astype(np.float32))
    xt = torch.from_numpy(
        rng.standard_normal((4, 1, 28, 28)).astype(np.float32))
    _dump(m, xw, xt, out_dir / 'lenet_ls1_ls1.npz')


def main() -> None:
    out_dir = Path(sys.argv[1]) if len(sys.argv) > 1 else \
        Path(__file__).resolve().parent.parent / 'tests' / 'data_oracle'
    out_dir.mkdir(parents=True, exist_ok=True)
    small_resnet(out_dir)
    lenet(out_dir)
    if '--full-resnet18' in sys.argv:
        full_resnet18(out_dir)


if __name__ == '__main__':
    main()
