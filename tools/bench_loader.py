"""Input-pipeline-only throughput: can the loader feed the chip?

VERDICT item 7's acceptance: loader-only img/s vs the measured train
step rate (4.4k img/s/chip) and the packed inference rate. Generates a
fake ImageNet class-folder tree of real JPEGs once (so PIL does real
decode work), then iterates the train loader (RandomResizedCrop + flip
+ ColorJitter + normalize, thread-pool decode + 2-deep prefetch) with
no model attached.

CPU-only — safe to run alongside TPU work.
Usage: python tools/bench_loader.py [n_images] [batch] [workers] [backend]
  backend: native (default) | pil
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, '/root/repo')

import numpy as np


def make_fake_imagenet(root: Path, n_images: int, n_classes: int = 16,
                       size: int = 320) -> None:
    from PIL import Image
    rng = np.random.default_rng(0)
    made = 0
    for c in range(n_classes):
        d = root / 'train' / f'class_{c:03d}'
        d.mkdir(parents=True, exist_ok=True)
        per = n_images // n_classes
        for i in range(per):
            p = d / f'img_{i:05d}.jpg'
            if not p.exists():
                arr = rng.integers(0, 256, (size, size, 3), np.uint8)
                Image.fromarray(arr).save(p, quality=85)
            made += 1
    print(f'{made} jpegs under {root}', flush=True)


def main():
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    workers = int(sys.argv[3]) if len(sys.argv) > 3 else 0  # 0 = default

    root = Path('/tmp/fake_imagenet')
    make_fake_imagenet(root, n_images)

    backend = sys.argv[4] if len(sys.argv) > 4 else 'native'

    from quant_tpu.data.loaders import ImageNetDataLoader
    dl = ImageNetDataLoader(dataset_path=str(root), train_batch_size=batch,
                            test_batch_size=batch, seed=0,
                            workers=workers or None,
                            native_decode=backend == 'native')
    loader = dl.get_train_loader()

    # Warm epoch (thread pool spin-up, page cache).
    n = 0
    for x, y in loader:
        n += x.shape[0]
    t0 = time.perf_counter()
    n = 0
    for x, y in loader:
        n += x.shape[0]
    dt = time.perf_counter() - t0
    print(json.dumps({
        'metric': 'imagenet_loader_images_per_sec',
        'value': round(n / dt, 1),
        'unit': 'images/sec/host',
        'batch': batch,
        'images': n,
        'workers': workers or 'default(8)',
        'backend': backend,
    }))


if __name__ == '__main__':
    main()
