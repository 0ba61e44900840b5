"""Serving-engine latency/throughput on the chip.

Drives the continuous-batching InferenceEngine with the packed ls-1
ResNet-18 (stripped deployment variables) under three load patterns and
reports per-request latency percentiles + sustained throughput:

  single   — one request at a time (pure latency; dispatch-floor bound)
  burst    — max_batch requests at once (one full batch)
  sustained— a closed loop of `inflight` outstanding requests

Usage: python tools/bench_serving.py [n_requests] [max_batch]
Appends to tools/bench_serving_results.jsonl.
"""

import json
import sys
import time

sys.path.insert(0, '/root/repo')

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update('jax_compilation_cache_dir', '/tmp/jax_comp_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 10)
except Exception:
    pass

RESULTS = '/root/repo/tools/bench_serving_results.jsonl'


def record(**kv):
    with open(RESULTS, 'a') as f:
        f.write(json.dumps(kv) + '\n')
    print(json.dumps(kv), flush=True)


def main():
    n_req = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    max_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    from bench import _resnet18
    from quant_tpu.nn.export import (export_packed_variables,
                                     fold_xnor_thresholds,
                                     strip_for_deployment)
    from quant_tpu.serving import InferenceEngine

    key = jax.random.key(0)
    shape = (224, 224, 3)
    model = _resnet18('ls-1', 'ls-1', moving_average_mode='eval_only')
    x0 = jnp.zeros((2,) + shape, jnp.float32)
    sys.path.insert(0, '/root/repo/tools')
    from measure import fill_quant_state
    v = fill_quant_state(dict(model.init(key, x0, True)))
    # The production serving form: packed + threshold-folded + stripped
    # (serving/prepare.py produces exactly this artifact).
    packed = model.clone(inference_mode='packed', eval_dtype=jnp.bfloat16,
                         sign_compute='int8')
    v = export_packed_variables(packed, v, x0[:1])
    v = fold_xnor_thresholds(packed, v)
    v = strip_for_deployment(v)
    packed = packed.clone(bn_fold=True)

    # Buckets bounded to 3 compiled programs (compiles through this
    # tunnel cost ~10 min each when cold).
    engine = InferenceEngine(packed.apply, v, shape,
                             max_batch=max_batch,
                             batch_buckets=[1, 8, max_batch]).start()
    rng = np.random.default_rng(0)
    img = rng.standard_normal(shape).astype(np.float32)

    # Warm every bucket.
    for b in engine.buckets:
        futs = [engine.submit(img) for _ in range(b)]
        for f in futs:
            f.result(timeout=600)

    # single-request latency
    lats = []
    for _ in range(32):
        t0 = time.perf_counter()
        engine.submit(img).result(timeout=60)
        lats.append((time.perf_counter() - t0) * 1e3)
    lats.sort()
    record(mode='single', p50_ms=round(lats[len(lats) // 2], 2),
           p95_ms=round(lats[int(len(lats) * 0.95)], 2))

    # burst: one full batch
    t0 = time.perf_counter()
    futs = [engine.submit(img) for _ in range(max_batch)]
    for f in futs:
        f.result(timeout=60)
    dt = time.perf_counter() - t0
    record(mode='burst', batch=max_batch, total_ms=round(dt * 1e3, 2),
           ips=round(max_batch / dt, 1))

    # sustained closed loop
    inflight = max_batch * 4
    lat_samples = []
    done = 0
    t0 = time.perf_counter()
    pending = []
    for _ in range(min(inflight, n_req)):
        pending.append((time.perf_counter(), engine.submit(img)))
    i = len(pending)
    while pending:
        ts, f = pending.pop(0)
        f.result(timeout=120)
        lat_samples.append((time.perf_counter() - ts) * 1e3)
        done += 1
        if i < n_req:
            pending.append((time.perf_counter(), engine.submit(img)))
            i += 1
    dt = time.perf_counter() - t0
    lat_samples.sort()
    record(mode='sustained', requests=done,
           ips=round(done / dt, 1),
           p50_ms=round(lat_samples[len(lat_samples) // 2], 2),
           p95_ms=round(lat_samples[int(len(lat_samples) * 0.95)], 2),
           stats=engine.stats)
    engine.stop()


if __name__ == '__main__':
    main()
