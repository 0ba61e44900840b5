"""Data loader tests (synthetic + on-disk formats written by the test)."""

import gzip
import pickle
import struct

import numpy as np

from quant_tpu.data import (
    CIFAR100DataLoader, MNISTDataLoader, SyntheticDataLoader,
)
from quant_tpu.data.loaders import BatchIterable, random_crop_flip


def test_synthetic_loader_shapes_and_determinism():
    dl = SyntheticDataLoader(train_batch_size=8, test_batch_size=16,
                             train_size=32, test_size=16,
                             image_shape=(28, 28, 1))
    batches = list(dl.get_train_loader())
    assert len(batches) == 4
    x, y = batches[0]
    assert x.shape == (8, 28, 28, 1) and x.dtype == np.float32
    assert y.shape == (8,) and y.dtype == np.int32

    # Test loader is unshuffled and reproducible.
    t1 = [b[1] for b in dl.get_test_loader()]
    t2 = [b[1] for b in dl.get_test_loader()]
    for a, b in zip(t1, t2):
        np.testing.assert_array_equal(a, b)


def test_batch_iterable_reshuffles_per_epoch():
    x = np.arange(32, dtype=np.float32)[:, None]
    y = np.arange(32)
    it = BatchIterable(x, y, batch_size=32, shuffle=True)
    e1 = next(iter(it))[1]
    e2 = next(iter(it))[1]
    assert not np.array_equal(e1, e2)
    np.testing.assert_array_equal(np.sort(e1), np.sort(e2))


def test_random_crop_flip_shape_preserving(rng):
    imgs = rng.standard_normal((4, 32, 32, 3)).astype(np.float32)
    out = random_crop_flip(imgs, np.random.default_rng(0))
    assert out.shape == imgs.shape


def test_mnist_reader_idx_format(tmp_path):
    images = np.random.default_rng(0).integers(
        0, 256, (10, 28, 28), dtype=np.uint8)
    labels = np.arange(10, dtype=np.uint8)

    def write_idx(path, arr, magic):
        with gzip.open(path, 'wb') as f:
            f.write(struct.pack('>I', magic))
            f.write(struct.pack('>' + 'I' * arr.ndim, *arr.shape))
            f.write(arr.tobytes())

    write_idx(tmp_path / 'train-images-idx3-ubyte.gz', images, 0x803)
    write_idx(tmp_path / 'train-labels-idx1-ubyte.gz', labels, 0x801)
    write_idx(tmp_path / 't10k-images-idx3-ubyte.gz', images, 0x803)
    write_idx(tmp_path / 't10k-labels-idx1-ubyte.gz', labels, 0x801)

    dl = MNISTDataLoader(dataset_path=str(tmp_path), train_batch_size=4,
                         test_batch_size=10)
    x, y = next(iter(dl.get_test_loader()))
    assert x.shape == (10, 28, 28, 1)
    np.testing.assert_array_equal(y, labels)
    # Normalization applied.
    raw = images.astype(np.float32) / 255.0
    expected = (raw - 0.1307) / 0.3081
    np.testing.assert_allclose(x[..., 0], expected, rtol=1e-5)


def test_cifar100_reader_pickle_format(tmp_path):
    rng = np.random.default_rng(1)
    data = rng.integers(0, 256, (20, 3 * 32 * 32), dtype=np.uint8)
    labels = list(rng.integers(0, 100, 20))
    for name, sl in (('train', slice(0, 10)), ('test', slice(10, 20))):
        with open(tmp_path / name, 'wb') as f:
            pickle.dump({b'data': data[sl],
                         b'fine_labels': labels[sl.start:sl.stop]}, f)

    dl = CIFAR100DataLoader(dataset_path=str(tmp_path), train_batch_size=5,
                            test_batch_size=10)
    x, y = next(iter(dl.get_test_loader()))
    assert x.shape == (10, 32, 32, 3)
    np.testing.assert_array_equal(y, labels[10:])
    xt, _ = next(iter(dl.get_train_loader()))
    assert xt.shape == (5, 32, 32, 3)


def test_test_subset(tmp_path):
    dl = SyntheticDataLoader(test_batch_size=100, test_size=50,
                             test_subset=7)
    x, y = next(iter(dl.get_test_loader()))
    assert x.shape[0] == 7
