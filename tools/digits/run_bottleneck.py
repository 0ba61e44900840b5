"""Real-data trainability check for the bottleneck block family.

The bottleneck blocks (nn/resnet.py Regular/XnorBottleneckBlock) are a
beyond-reference extension with no published accuracy to pin; this run
provides the evidence that the family TRAINS on real images under
quantization: a small quantized ResNet (bottleneck [1,1,1] plan, ls-2
activations x ls-1 weights — the flagship scheme pair) on the same
sklearn-digits data as tools/digits/run.py, both block orderings.

Archives variant_bottleneck_{regular,xnor}_test.csv into results/ and
appends a section to SUMMARY.md.

Usage: python tools/digits/run_bottleneck.py  (CPU-only; ~5 min)
"""

import os
import pathlib
import shutil
import subprocess
import sys

import yaml

REPO = pathlib.Path(__file__).resolve().parents[2]
DATA = '/tmp/digits_mnist'
RUNS = '/tmp/digits_runs_bneck'
RESULTS = REPO / 'tools' / 'digits' / 'results'
EPOCHS = 30


def bneck_config(block: str) -> dict:
    qlayer = {'x_quant': 'ls-2', 'w_quant': 'ls-1',
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
                'block': block,
                'layer0': {'n_in_channels': 16, 'kernel_size': 3,
                           'stride': 1, 'padding': 1, 'bias': False,
                           'maxpool': {'type': 'identity'}},
                'layer1': dict(qlayer), 'layer2': dict(qlayer),
                'layer3': dict(qlayer), 'layer4': None,
                'nonlins': ['relu', 'relu'],
                'num_blocks': [1, 1, 1],
                'output_classes': 10,
            },
        },
        'optimization': {
            'epochs': EPOCHS,
            'optimizer': {'algorithm': 'adam', 'lr': 0.001,
                          'param_groups':
                              {'quantized': {'weight_decay': 0.0}}},
            'lr_scheduler': {'scheduler': 'multi_step_lr',
                             'milestones': [15, 25], 'gamma': 0.1},
        },
        'log': {'level': 'WARNING', 'interval': 50,
                'tensorboard': False, 'save_model_freq': EPOCHS,
                'root_experiments_dir': RUNS + '/'},
    }


def main() -> None:
    env = dict(os.environ, PALLAS_AXON_POOL_IPS='', JAX_PLATFORMS='cpu')
    subprocess.run([sys.executable,
                    str(REPO / 'tools/digits/export_digits.py'), DATA],
                   check=True, env=env)
    RESULTS.mkdir(parents=True, exist_ok=True)
    rows = []
    for block in ('regular_bottleneck', 'xnor_bottleneck'):
        name = f'bottleneck_{block.split("_")[0]}'
        cfg_path = pathlib.Path(RUNS) / f'{name}.yaml'
        cfg_path.parent.mkdir(parents=True, exist_ok=True)
        run_dir = pathlib.Path(RUNS) / name
        shutil.rmtree(run_dir, ignore_errors=True)
        cfg_path.write_text(yaml.safe_dump(bneck_config(block)))
        print(f'=== {name}', flush=True)
        subprocess.run([sys.executable,
                        str(REPO / 'examples/mnist/mnist.py'),
                        '--config', str(cfg_path),
                        '--experiment-name', name], check=True, env=env)
        test_csv = run_dir / 'metrics' / 'test.csv'
        shutil.copy(test_csv, RESULTS / f'variant_{name}_test.csv')
        last = test_csv.read_text().strip().splitlines()[-1].split(',')
        rows.append((block, float(last[1]), float(last[0])))

    lines = ['', '## Bottleneck family on the same data (round 3)', '',
             'Quantized bottleneck ResNet ([1,1,1] plan, ls-2 x ls-1,',
             'no-decay-on-binary param_groups), both orderings — the',
             'beyond-reference ResNet-50-style blocks train under',
             'quantization on real images:', '',
             '| block | top-1 | test loss |', '|---|---|---|']
    for block, acc, loss in rows:
        lines.append(f'| {block} | {acc * 100:.2f}% | {loss:.4f} |')
    with open(RESULTS / 'SUMMARY.md', 'a') as f:
        f.write('\n'.join(lines) + '\n')
    print('\n'.join(lines))


if __name__ == '__main__':
    main()
