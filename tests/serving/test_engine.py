"""Serving engine tests: batching, padding masks, future resolution."""

import threading

import numpy as np

from quant_tpu.serving import InferenceEngine, ServingFrontend

SHAPE = (8, 8, 1)


def _toy_apply(variables, x, train):
    # Deterministic per-example function: mean over pixels + bias -> 3 logits.
    import jax.numpy as jnp
    m = jnp.mean(x, axis=(1, 2, 3), keepdims=False)
    return jnp.stack([m, 2 * m, -m], axis=1) + variables['b']


def _engine(**kw):
    return InferenceEngine(_toy_apply, {'b': np.float32(1.0)}, SHAPE,
                           max_batch=8, **kw)


def test_predict_masks_padding(rng):
    eng = _engine()
    imgs = rng.standard_normal((3,) + SHAPE).astype(np.float32)
    out = eng.predict(imgs)
    assert out.shape == (3, 3)
    m = imgs.mean(axis=(1, 2, 3))
    np.testing.assert_allclose(out[:, 0], m + 1.0, rtol=1e-5)
    np.testing.assert_allclose(out[:, 1], 2 * m + 1.0, rtol=1e-5)


def test_submit_resolves_futures_in_order(rng):
    eng = _engine(max_wait_ms=20.0).start()
    try:
        imgs = rng.standard_normal((5,) + SHAPE).astype(np.float32)
        futs = [eng.submit(img) for img in imgs]
        outs = np.stack([f.result(timeout=30) for f in futs])
        m = imgs.mean(axis=(1, 2, 3))
        np.testing.assert_allclose(outs[:, 0], m + 1.0, rtol=1e-5)
        stats = eng.stats
        assert stats['requests'] == 5
        assert stats['batches'] >= 1
    finally:
        eng.stop()


def test_bucket_selection():
    eng = _engine()
    assert eng._bucket_for(1) == 1
    assert eng._bucket_for(3) == 4
    assert eng._bucket_for(8) == 8
    assert eng._bucket_for(99) == 8


def test_shape_validation():
    eng = _engine()
    import pytest
    with pytest.raises(ValueError):
        eng.submit(np.zeros((4, 4, 1), np.float32))


def test_concurrent_predict_thread_safe(rng):
    """Two threads calling predict() concurrently: no double-compile
    crash, correct results from both."""
    eng = _engine()
    imgs = rng.standard_normal((6,) + SHAPE).astype(np.float32)
    outs = {}

    def work(tid):
        outs[tid] = eng.predict(imgs)

    ts = [threading.Thread(target=work, args=(i,)) for i in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=60)
    m = imgs.mean(axis=(1, 2, 3))
    for tid in range(2):
        np.testing.assert_allclose(outs[tid][:, 0], m + 1.0, rtol=1e-5)


def test_frontend_two_engines_balanced(rng):
    """2-engine frontend (the per-host cross-host serving story): all
    requests answered correctly, both backends exercised."""
    front = ServingFrontend([_engine(max_wait_ms=5.0),
                             _engine(max_wait_ms=5.0)]).start()
    try:
        imgs = rng.standard_normal((12,) + SHAPE).astype(np.float32)
        out = front.predict(imgs)
        m = imgs.mean(axis=(1, 2, 3))
        np.testing.assert_allclose(out[:, 0], m + 1.0, rtol=1e-5)
        s = front.stats
        assert s['requests'] == 12
        # Least-loaded + round-robin must spread the burst over both.
        assert all(e['requests'] > 0 for e in s['engines'])
    finally:
        front.stop()


def test_warmup_precompiles_buckets():
    eng = _engine()
    assert eng._compiled == {}
    eng.warmup()
    assert set(eng._compiled) == set(eng.buckets)
    # Partial warmup of a subset is allowed; unknown buckets are not.
    eng2 = _engine()
    eng2.warmup([1, 8])
    assert set(eng2._compiled) == {1, 8}
    import pytest
    with pytest.raises(ValueError, match='bucket'):
        eng2.warmup([3])


def test_latency_stats_window(rng):
    eng = _engine(max_wait_ms=5.0).start()
    try:
        imgs = rng.standard_normal((6,) + SHAPE).astype(np.float32)
        futs = [eng.submit(img) for img in imgs]
        for f in futs:
            f.result(timeout=30)
        lat = eng.stats['latency_ms']
        assert lat['window'] == 6
        assert 0 <= lat['p50'] <= lat['p99'] <= lat['max']
    finally:
        eng.stop()
