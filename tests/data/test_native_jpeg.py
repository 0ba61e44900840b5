"""Native libjpeg decode pipeline tests (native/quantjpeg.cpp).

Oracle: PIL (itself libjpeg-backed), which the reference's torchvision
transforms use (data_loaders.py:330-338). Full-resolution decode must be
bit-exact; fused crop+resize tracks PIL's two-step form within a small
rounding tolerance (different-but-equivalent separable filter order).
"""

import io

import numpy as np
import pytest

from quant_tpu.data import native_jpeg
from quant_tpu.data.loaders import ImageNetDataLoader

pytestmark = pytest.mark.skipif(
    not native_jpeg.AVAILABLE, reason='native jpeg lib not built')


def _jpeg_bytes(arr, quality=92):
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, 'JPEG', quality=quality)
    return buf.getvalue()


@pytest.fixture(scope='module')
def photo():
    from PIL import Image, ImageFilter
    rng = np.random.default_rng(0)
    arr = (rng.random((300, 400, 3)) * 255).astype(np.uint8)
    # Smooth: keeps JPEG artifacts small so tolerances test the
    # RESAMPLER, not codec noise.
    arr = np.asarray(Image.fromarray(arr).filter(ImageFilter.GaussianBlur(2)))
    return arr, _jpeg_bytes(arr)


def test_probe_dims(photo):
    _, data = photo
    assert native_jpeg.probe(data) == (400, 300)


def test_probe_rejects_garbage():
    assert native_jpeg.probe(b'not a jpeg') is None
    assert native_jpeg.decode_crop_resize(b'nope', None, (8, 8)) is None


def test_truncated_jpeg_never_crashes(photo):
    # libjpeg pads missing scanlines (a warning, not error_exit), so a
    # result OR None is acceptable — the invariant is no crash/UB on
    # the longjmp error path, hammered across truncation points.
    _, data = photo
    for frac in (0.1, 0.3, 0.6, 0.9):
        t = data[:int(len(data) * frac)]
        r = native_jpeg.decode_crop_resize(t, (0, 250, 40, 40), (32, 32))
        assert r is None or r.shape == (32, 32, 3)


def test_crop_box_out_of_bounds_rejected(photo):
    _, data = photo
    assert native_jpeg.decode_crop_resize(data, (390, 0, 20, 20),
                                          (8, 8)) is None
    assert native_jpeg.decode_crop_resize(data, (-1, 0, 20, 20),
                                          (8, 8)) is None


def test_full_decode_bit_exact_vs_pil(photo):
    from PIL import Image
    _, data = photo
    pil = np.asarray(Image.open(io.BytesIO(data)).convert('RGB'))
    nat = native_jpeg.decode_crop_resize(data, None, (400, 300))
    np.testing.assert_array_equal(nat, pil)


def test_crop_resize_tracks_pil(photo):
    from PIL import Image
    _, data = photo
    box = (37, 22, 300, 250)
    pil = np.asarray(
        Image.open(io.BytesIO(data)).convert('RGB')
        .crop((37, 22, 337, 272)).resize((224, 224), Image.BILINEAR))
    nat = native_jpeg.decode_crop_resize(data, box, (224, 224))
    diff = np.abs(pil.astype(int) - nat.astype(int))
    assert diff.max() <= 2 and diff.mean() < 0.5


def test_flip_is_exact_mirror(photo):
    _, data = photo
    box = (10, 10, 128, 128)
    plain = native_jpeg.decode_crop_resize(data, box, (64, 64))
    flip = native_jpeg.decode_crop_resize(data, box, (64, 64), flip=True)
    np.testing.assert_array_equal(flip, plain[:, ::-1])


def test_scaled_decode_small_output_close_to_pil():
    # A large source with a big crop triggers the 1/2 or 1/4 DCT-scaled
    # decode; the result must stay visually identical to PIL's full-res
    # crop+resize (tolerance covers the decode-scale resampling).
    from PIL import Image, ImageFilter
    rng = np.random.default_rng(3)
    arr = (rng.random((1024, 1280, 3)) * 255).astype(np.uint8)
    arr = np.asarray(Image.fromarray(arr).filter(ImageFilter.GaussianBlur(4)))
    data = _jpeg_bytes(arr)
    box = (64, 32, 1152, 960)
    pil = np.asarray(
        Image.open(io.BytesIO(data)).convert('RGB')
        .crop((64, 32, 64 + 1152, 32 + 960))
        .resize((224, 224), Image.BILINEAR)).astype(np.float32)
    nat = native_jpeg.decode_crop_resize(data, box, (224, 224))
    nat = nat.astype(np.float32)
    assert np.abs(pil - nat).mean() < 3.0


def test_jitter_norm_matches_numpy_path():
    from quant_tpu.data.loaders import ImageNetDataLoader, \
        apply_color_jitter
    rng = np.random.default_rng(2)
    img8 = rng.integers(0, 256, (96, 128, 3), np.uint8)
    mean, std = ImageNetDataLoader.MEAN, ImageNetDataLoader.STD
    for _ in range(4):
        fb, fc, fs = rng.uniform(0.6, 1.4, 3)
        order = rng.permutation(3)
        ref = (apply_color_jitter(img8.astype(np.float32) / 255.0,
                                  fb, fc, fs, order) - mean) / std
        got = native_jpeg.jitter_norm(img8, mean, std, (fb, fc, fs), order)
        np.testing.assert_allclose(got, ref, atol=1e-5)
    # Eval path: normalize only.
    ref = (img8.astype(np.float32) / 255.0 - mean) / std
    got = native_jpeg.jitter_norm(img8, mean, std)
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_grayscale_jpeg_decodes_to_rgb():
    from PIL import Image
    rng = np.random.default_rng(1)
    g = (rng.random((96, 96)) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(g, mode='L').save(buf, 'JPEG', quality=95)
    out = native_jpeg.decode_crop_resize(buf.getvalue(), None, (96, 96))
    assert out.shape == (96, 96, 3)
    # All three channels carry the same gray values.
    np.testing.assert_array_equal(out[..., 0], out[..., 1])


# ---- Loader backend parity ----

@pytest.fixture(scope='module')
def tiny_imagenet(tmp_path_factory):
    from PIL import Image, ImageFilter
    root = tmp_path_factory.mktemp('imagenet_nj')
    rng = np.random.default_rng(5)
    for split, n in (('train', 4), ('val', 3)):
        for c in ('n01', 'n02'):
            d = root / split / c
            d.mkdir(parents=True)
            for i in range(n):
                arr = (rng.random((280, 320, 3)) * 255).astype(np.uint8)
                img = Image.fromarray(arr).filter(
                    ImageFilter.GaussianBlur(2))
                img.save(d / f'img_{i}.jpg', quality=92)
    return root


def _all_batches(root, train, native):
    dl = ImageNetDataLoader(dataset_path=str(root), train_batch_size=4,
                            test_batch_size=4, workers=2, seed=11,
                            native_decode=native)
    loader = dl.get_train_loader() if train else dl.get_test_loader()
    return list(loader)


@pytest.mark.parametrize('train', [True, False])
def test_native_and_pil_backends_agree(tiny_imagenet, train):
    nat = _all_batches(tiny_imagenet, train, native=True)
    pil = _all_batches(tiny_imagenet, train, native=False)
    assert len(nat) == len(pil)
    for (xn, yn), (xp, yp) in zip(nat, pil):
        np.testing.assert_array_equal(yn, yp)
        # Same geometry (shared rng draws) + equivalent resamplers:
        # normalized-space tolerance ~= 2/255 / std.
        assert np.abs(xn - xp).mean() < 0.01
        assert np.abs(xn - xp).max() < 0.2


def test_non_jpeg_file_falls_back_to_pil(tiny_imagenet):
    from PIL import Image
    # Drop a PNG into a class folder; the loader must still serve it.
    extra = tiny_imagenet / 'val' / 'n01' / 'img_extra.png'
    rng = np.random.default_rng(9)
    Image.fromarray((rng.random((64, 64, 3)) * 255).astype(np.uint8)
                    ).save(extra)
    try:
        batches = _all_batches(tiny_imagenet, train=False, native=True)
        n = sum(len(y) for _, y in batches)
        assert n == 7  # 6 jpegs + 1 png
    finally:
        extra.unlink()
