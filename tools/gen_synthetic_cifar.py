"""Generate a LEARNABLE synthetic CIFAR-100-format dataset.

The environment has no real datasets (zero egress), so the full-length
accuracy-recipe stability run (VERDICT item 6b) trains on synthetic
data written in the exact CIFAR-100 pickle format the loader reads.
Classes are separable but not trivially so: each class is a random
smooth color/texture template + per-sample global distortions + pixel
noise, so the network must actually learn filters and top-1 climbs
gradually (like a real task) instead of saturating in one epoch.

Usage: python tools/gen_synthetic_cifar.py <out_dir> [n_train] [n_test]
"""

import pickle
import sys
from pathlib import Path

import numpy as np


def make_split(rng, templates, n, noise=48.0):
    n_classes = templates.shape[0]
    labels = rng.integers(0, n_classes, n)
    base = templates[labels].astype(np.float32)
    # Per-sample distortions: brightness/contrast jitter + spatial roll.
    gain = rng.uniform(0.7, 1.3, (n, 1, 1, 1)).astype(np.float32)
    offs = rng.uniform(-20, 20, (n, 1, 1, 1)).astype(np.float32)
    imgs = base * gain + offs
    shift = rng.integers(-3, 4, (n, 2))
    for i in range(n):
        imgs[i] = np.roll(imgs[i], tuple(shift[i]), axis=(0, 1))
    imgs += rng.normal(0.0, noise, imgs.shape).astype(np.float32)
    imgs = np.clip(imgs, 0, 255).astype(np.uint8)
    data = imgs.transpose(0, 3, 1, 2).reshape(n, -1)  # CIFAR row layout
    return data, labels.tolist()


def main():
    out = Path(sys.argv[1])
    n_train = int(sys.argv[2]) if len(sys.argv) > 2 else 10000
    n_test = int(sys.argv[3]) if len(sys.argv) > 3 else 2000
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)

    # Smooth random class templates: low-frequency Fourier mixtures.
    yy, xx = np.mgrid[0:32, 0:32] / 32.0
    n_classes = 100
    templates = np.zeros((n_classes, 32, 32, 3), np.float32)
    for c in range(n_classes):
        img = np.zeros((32, 32, 3), np.float32)
        for _ in range(6):
            fy, fx = rng.uniform(0.5, 4.0, 2)
            ph = rng.uniform(0, 2 * np.pi, 3)
            amp = rng.uniform(20, 60, 3)
            for ch in range(3):
                img[..., ch] += amp[ch] * np.sin(
                    2 * np.pi * (fy * yy + fx * xx) + ph[ch])
        templates[c] = img + 128.0

    for name, n in (('train', n_train), ('test', n_test)):
        data, labels = make_split(rng, templates, n)
        with open(out / name, 'wb') as f:
            pickle.dump({b'data': data, b'fine_labels': labels}, f)
    print(f'wrote {n_train}+{n_test} synthetic CIFAR-100 images to {out}')


if __name__ == '__main__':
    main()
