"""ImageNet pipeline tests: ColorJitter math parity, parallel decode,
prefetch, determinism. Uses a fake class-folder tree of generated JPEGs
(the real dataset is never downloaded — reference data_loaders.py:314)."""

import numpy as np
import pytest

from quant_tpu.data.loaders import (
    ImageNetDataLoader, apply_color_jitter, color_jitter,
)
from quant_tpu.data.prefetch import PrefetchIterable


# ---- ColorJitter math (reference aug: ColorJitter(0.4,0.4,0.4),
# data_loaders.py:334; torchvision blend semantics) ----

def test_brightness_scales_and_clamps():
    img = np.array([[[0.5, 0.25, 0.8]]], np.float32)
    out = apply_color_jitter(img, fb=1.4, fc=1.0, fs=1.0, order=(0,))
    np.testing.assert_allclose(out, [[[0.7, 0.35, 1.0]]], rtol=1e-6)


def test_contrast_blends_toward_mean_gray():
    img = np.array([[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]], np.float32)
    # gray = [0.299, 0.587]; mean = 0.443
    out = apply_color_jitter(img, fb=1.0, fc=0.5, fs=1.0, order=(1,))
    mean = np.float32((0.299 + 0.587) / 2)
    expected = np.clip(img * 0.5 + 0.5 * mean, 0, 1)
    np.testing.assert_allclose(out, expected, rtol=1e-5)


def test_saturation_blends_toward_pixel_gray():
    img = np.array([[[1.0, 0.0, 0.0]]], np.float32)
    out = apply_color_jitter(img, fb=1.0, fc=1.0, fs=0.0, order=(2,))
    # Fully desaturated -> pixel gray everywhere.
    np.testing.assert_allclose(out, [[[0.299, 0.299, 0.299]]], rtol=1e-5)


def test_identity_factors_noop():
    rng = np.random.default_rng(0)
    img = rng.random((4, 4, 3)).astype(np.float32)
    out = apply_color_jitter(img, 1.0, 1.0, 1.0, order=(0, 1, 2))
    np.testing.assert_allclose(out, img, rtol=1e-6)


def test_color_jitter_factor_ranges():
    img = np.full((2, 2, 3), 0.5, np.float32)
    rng = np.random.default_rng(1)
    for _ in range(20):
        out = color_jitter(img, rng, 0.4, 0.4, 0.4)
        assert out.min() >= 0.0 and out.max() <= 1.0
        # brightness in [0.6,1.4] on a gray image: value in [0.3, 0.7]
        assert 0.29 <= out.mean() <= 0.71


# ---- Prefetcher ----

def test_prefetch_preserves_order_and_len():
    inner = [(np.full((2, 1), i), np.array([i, i])) for i in range(7)]
    pf = PrefetchIterable(inner, depth=2)
    assert len(pf) == 7
    got = [int(y[0]) for _, y in pf]
    assert got == list(range(7))
    # Second iteration restarts.
    assert [int(y[0]) for _, y in pf] == list(range(7))


def test_prefetch_propagates_errors():
    def gen():
        yield (np.zeros(1), np.zeros(1))
        raise RuntimeError('decode failed')

    class Inner:
        def __iter__(self):
            return gen()

    with pytest.raises(RuntimeError, match='decode failed'):
        list(PrefetchIterable(Inner()))


# ---- End-to-end fake-JPEG ImageNet loader ----

@pytest.fixture(scope='module')
def fake_imagenet(tmp_path_factory):
    root = tmp_path_factory.mktemp('imagenet')
    from PIL import Image
    rng = np.random.default_rng(0)
    for split, per_class in (('train', 6), ('val', 3)):
        for c in ('n01', 'n02'):
            d = root / split / c
            d.mkdir(parents=True)
            for i in range(per_class):
                arr = rng.integers(0, 256, (64, 80, 3), np.uint8)
                Image.fromarray(arr).save(d / f'img_{i}.jpg')
    return root


def test_imagenet_train_loader_shapes_and_determinism(fake_imagenet):
    dl = ImageNetDataLoader(dataset_path=str(fake_imagenet),
                            train_batch_size=4, test_batch_size=4,
                            workers=4, seed=7)
    loader = dl.get_train_loader()
    assert loader.num_examples == 12
    b1 = list(loader)
    assert b1[0][0].shape == (4, 224, 224, 3)
    assert b1[0][0].dtype == np.float32
    # Epoch 2 reshuffles.
    b2 = list(loader)
    assert not np.array_equal(b1[0][1], b2[0][1]) or \
        not np.allclose(b1[0][0], b2[0][0])
    # A fresh loader with the same seed reproduces epoch 1 EXACTLY even
    # with parallel decode (per-image seeding is thread-order-free).
    dl2 = ImageNetDataLoader(dataset_path=str(fake_imagenet),
                             train_batch_size=4, test_batch_size=4,
                             workers=2, seed=7)
    c1 = list(dl2.get_train_loader())
    for (x1, y1), (x2, y2) in zip(b1, c1):
        np.testing.assert_array_equal(y1, y2)
        np.testing.assert_allclose(x1, x2, rtol=1e-6)


def test_imagenet_val_loader_center_crop(fake_imagenet):
    dl = ImageNetDataLoader(dataset_path=str(fake_imagenet),
                            train_batch_size=4, test_batch_size=6,
                            workers=2)
    batches = list(dl.get_test_loader())
    assert batches[0][0].shape == (6, 224, 224, 3)
    # Val path is deterministic (no aug).
    again = list(dl.get_test_loader())
    np.testing.assert_allclose(batches[0][0], again[0][0], rtol=1e-6)
    labels = np.concatenate([y for _, y in batches])
    assert set(labels.tolist()) == {0, 1}
