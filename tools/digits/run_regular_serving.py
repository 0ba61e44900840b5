"""Real-data evidence for the conv->BN ('regular') basic-block family.

bench.py round 4 measured this family serving 1-bit inference at 5.34x
its fp32 twin (vs 4.79x for the xnor accuracy flagship) — but the
reference's published binary recipes all use the xnor ordering, so the
regular-binary family has no published accuracy to pin. This run
provides the missing evidence chain on real images:

 1. a small regular-basic QResNet (ls-1 x ls-1) TRAINS on the sklearn
    digits data (same protocol as tools/digits/run.py);
 2. the packed serving path reproduces the dense eval accuracy exactly;
 3. the BN-FOLDED serving path (fold_bn_into_packed + bn_fold=True,
    what a deployment actually runs) matches as well.

Archives variant_regular_basic_test.csv + a SUMMARY.md section.

Usage: python tools/digits/run_regular_serving.py  (CPU-only; ~3 min)
"""

import os
import pathlib
import shutil
import subprocess
import sys

import yaml

REPO = pathlib.Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))
DATA = '/tmp/digits_mnist'
RUNS = '/tmp/digits_runs_regular'
RESULTS = REPO / 'tools' / 'digits' / 'results'
EPOCHS = 30


def regular_config() -> dict:
    qlayer = {'x_quant': 'ls-1', 'w_quant': 'ls-1',
              'clamp': {'kind': 'symmetric', 'alpha': 2}}
    return {
        'seed': 7,
        'environment': {'platform': 'local', 'nchips': 0},
        'data': {'dataset': 'mnist', 'dataset_path': DATA + '/',
                 'train_batch_size': 64, 'test_batch_size': 360},
        'model': {
            'architecture': 'resnet',
            'loss': 'cross_entropy',
            'arch_config': {
                'block': 'regular',
                'layer0': {'n_in_channels': 16, 'kernel_size': 3,
                           'stride': 1, 'padding': 1, 'bias': False,
                           'maxpool': {'type': 'identity'}},
                'layer1': dict(qlayer), 'layer2': dict(qlayer),
                'layer3': dict(qlayer), 'layer4': None,
                'nonlins': ['prelu', 'prelu'],
                'num_blocks': [1, 1, 1],
                'output_classes': 10,
                'moving_average_mode': 'eval_only',
            },
        },
        'optimization': {
            'epochs': EPOCHS,
            'optimizer': {'algorithm': 'adam', 'lr': 0.002},
            'lr_scheduler': {'scheduler': 'step_lr', 'step_size': 10,
                             'gamma': 0.5},
        },
        'log': {'level': 'WARNING', 'interval': 1000,
                'save_model_freq': EPOCHS, 'tensorboard': False,
                'root_experiments_dir': RUNS + '/'},
        'experiment_name': 'regular_basic',
    }


def _serving_accuracies(exp_dir: pathlib.Path) -> dict:
    import jax.numpy as jnp
    import numpy as np

    from quant_tpu.data.loaders import MNISTDataLoader
    from quant_tpu.nn.export import (
        export_packed_variables, fold_bn_into_packed,
    )
    from quant_tpu.train.task import build_model
    from quant_tpu.utils.checkpoints import (
        get_path_to_checkpoint, restore_checkpoint,
    )

    cfg = yaml.safe_load((exp_dir / 'config.yaml').read_text())
    model = build_model('resnet', cfg['model']['arch_config'])
    payload = restore_checkpoint(get_path_to_checkpoint(exp_dir))
    variables = {'params': payload['params'],
                 'batch_stats': payload.get('batch_stats', {}),
                 'quant_state': payload.get('quant_state', {})}
    x, y = next(iter(MNISTDataLoader(
        dataset_path=DATA + '/', train_batch_size=64,
        test_batch_size=360).get_test_loader()))
    x = jnp.asarray(x)

    def top1(logits):
        return float(np.mean(np.argmax(np.asarray(logits), -1) == y))

    dense = top1(model.apply(variables, x, False))
    packed = model.clone(inference_mode='packed')
    pvars = export_packed_variables(packed, variables, x[:1])
    packed_acc = top1(packed.apply(pvars, x, False))
    fvars = fold_bn_into_packed(packed, pvars)
    folded_acc = top1(packed.clone(bn_fold=True).apply(fvars, x, False))
    return {'dense': dense, 'packed': packed_acc, 'folded': folded_acc}


def main() -> None:
    env = dict(os.environ, PALLAS_AXON_POOL_IPS='', JAX_PLATFORMS='cpu')
    subprocess.run([sys.executable,
                    str(REPO / 'tools/digits/export_digits.py'), DATA],
                   check=True, env=env)
    RESULTS.mkdir(parents=True, exist_ok=True)
    runs = pathlib.Path(RUNS)
    runs.mkdir(parents=True, exist_ok=True)
    shutil.rmtree(runs / 'regular_basic', ignore_errors=True)
    cfg_path = runs / 'regular_basic.yaml'
    cfg_path.write_text(yaml.safe_dump(regular_config()))
    subprocess.run([sys.executable, str(REPO / 'examples/mnist/mnist.py'),
                    '--config', str(cfg_path),
                    '--experiment-name', 'regular_basic'],
                   check=True, env=env)
    test_csv = runs / 'regular_basic' / 'metrics' / 'test.csv'
    shutil.copy(test_csv, RESULTS / 'variant_regular_basic_test.csv')
    last = test_csv.read_text().strip().splitlines()[-1].split(',')

    acc = _serving_accuracies(runs / 'regular_basic')
    lines = [
        '',
        '## Regular (conv->BN) basic family + serving-path accuracy',
        '',
        'The 5.34x-throughput family (bench.py round 4) trained on the',
        f'same digits data ({EPOCHS} epochs, ls-1 x ls-1, regular basic',
        '[1,1,1]); the packed and BN-FOLDED serving paths evaluated on',
        'the same 360-image test set:',
        '',
        '| path | top-1 |',
        '|---|---|',
        f'| dense eval (train-time path) | {acc["dense"] * 100:.2f}% |',
        f'| packed serving | {acc["packed"] * 100:.2f}% |',
        f'| packed + BN-folded serving | {acc["folded"] * 100:.2f}% |',
        '',
        f'(final train-loop test row: top-1 {float(last[1]) * 100:.2f}%,'
        f' loss {float(last[0]):.4f})',
    ]
    with open(RESULTS / 'SUMMARY.md', 'a') as f:
        f.write('\n'.join(lines) + '\n')
    print('\n'.join(lines))


if __name__ == '__main__':
    main()
