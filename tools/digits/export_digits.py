"""Export scikit-learn's bundled handwritten-digits set as MNIST idx files.

The only REAL image dataset reachable in this zero-egress environment is
the UCI Optical Recognition of Handwritten Digits test set that ships
inside scikit-learn (`sklearn.datasets.load_digits`: 1,797 genuine 8x8
grayscale scans of handwritten 0-9). This script upsamples them to the
MNIST geometry (8x8 -> x3 nearest -> 24x24, zero-pad 2 -> 28x28, levels
0..16 -> 0..255) and writes the four gzipped IDX files the MNIST loader
reads natively (DATASETS.txt), so the stock `examples/mnist` CLI and
configs run verbatim on real handwriting.

Split: seeded shuffle, 1437 train / 360 test (~80/20).

Usage: python tools/digits/export_digits.py <out_dir>
"""

import gzip
import struct
import sys
from pathlib import Path

import numpy as np


def write_idx(path: Path, arr: np.ndarray, magic: int) -> None:
    with gzip.open(path, 'wb') as f:
        f.write(struct.pack('>I', magic))
        f.write(struct.pack('>' + 'I' * arr.ndim, *arr.shape))
        f.write(arr.tobytes())


def main(out_dir: str) -> None:
    from sklearn.datasets import load_digits
    d = load_digits()
    images = np.kron(d.images, np.ones((3, 3)))          # 8x8 -> 24x24
    images = np.pad(images, ((0, 0), (2, 2), (2, 2)))    # -> 28x28
    images = np.clip(images * (255.0 / 16.0), 0, 255).astype(np.uint8)
    labels = d.target.astype(np.uint8)

    order = np.random.default_rng(0).permutation(len(labels))
    images, labels = images[order], labels[order]
    n_test = 360
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    write_idx(out / 'train-images-idx3-ubyte.gz', images[n_test:], 0x803)
    write_idx(out / 'train-labels-idx1-ubyte.gz', labels[n_test:], 0x801)
    write_idx(out / 't10k-images-idx3-ubyte.gz', images[:n_test], 0x803)
    write_idx(out / 't10k-labels-idx1-ubyte.gz', labels[:n_test], 0x801)
    print(f'wrote {len(labels) - n_test} train / {n_test} test '
          f'real digit images to {out}')


if __name__ == '__main__':
    main(sys.argv[1] if len(sys.argv) > 1 else '/tmp/digits_mnist')
