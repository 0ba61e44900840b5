"""Native (C++) data-pipeline tests — run against whichever backend is
active (the numpy fallback satisfies the same contract)."""

import numpy as np

from quant_tpu.data import native


def test_shuffled_order_is_permutation():
    order = native.shuffled_order(257, seed=11)
    assert sorted(order.tolist()) == list(range(257))
    # Deterministic in the seed.
    np.testing.assert_array_equal(order, native.shuffled_order(257, 11))
    assert not np.array_equal(order, native.shuffled_order(257, 12))


def test_make_batch_gather(rng):
    src = rng.standard_normal((50, 8, 8, 3)).astype(np.float32)
    order = native.shuffled_order(50, 1)
    out = native.make_batch(src, order, 10, 16, pad=4, seed=0,
                            augment=False)
    np.testing.assert_array_equal(out, src[order[10:26]])


def test_make_batch_augment_deterministic(rng):
    src = rng.standard_normal((20, 16, 16, 3)).astype(np.float32)
    order = np.arange(20, dtype=np.int32)
    a = native.make_batch(src, order, 0, 20, pad=4, seed=5, augment=True)
    b = native.make_batch(src, order, 0, 20, pad=4, seed=5, augment=True)
    np.testing.assert_array_equal(a, b)
    c = native.make_batch(src, order, 0, 20, pad=4, seed=6, augment=True)
    assert not np.array_equal(a, c)


def test_augmented_content_is_shifted_source(rng):
    """Every augmented image must be a (possibly flipped) translation of
    its source with zero fill — check by matching against all candidates."""
    src = rng.standard_normal((4, 10, 10, 1)).astype(np.float32)
    order = np.arange(4, dtype=np.int32)
    out = native.make_batch(src, order, 0, 4, pad=2, seed=9, augment=True)
    for i in range(4):
        img = src[i]
        found = False
        for dy in range(-2, 3):
            for dx in range(-2, 3):
                for flip in (False, True):
                    cand = np.zeros_like(img)
                    ys = slice(max(0, -dy), min(10, 10 - dy))
                    xs = slice(max(0, -dx), min(10, 10 - dx))
                    cand[ys, xs] = img[max(0, dy):min(10, 10 + dy),
                                       max(0, dx):min(10, 10 + dx)]
                    if flip:
                        cand = cand[:, ::-1]
                    if np.array_equal(cand, out[i]):
                        found = True
        assert found, f'image {i} is not a crop/flip of its source'
