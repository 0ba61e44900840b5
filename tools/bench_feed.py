"""Sustained loader->device FEED rate under a concurrent consumer
(VERDICT r4 #5).

tools/bench_loader.py measures the loader alone; this measures what the
input pipeline actually delivers while a consuming loop runs on the
same host — the prefetch thread decodes the next batches while the
consumer holds the current one — across decode-pool widths. Each batch
is materialized into a jax array and folded into a device-side running
sum (a data dependency per batch, so the consumer cannot be elided),
with one device_get at the end.

Run with JAX_PLATFORMS=cpu: the consumer then shares the host's cores
with the decoder pool, which is the contention the hosts-per-chip
sizing question is about. (Feeding THIS environment's TPU would time
the axon tunnel's artificial H2D bandwidth, not a deployment link —
see docs/DESIGN.md "Input pipeline vs chip rate".)

Usage: python tools/bench_feed.py [n_images] [batch] [threads_csv]
Appends JSON rows to tools/bench_feed_results.jsonl.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, '/root/repo')
sys.path.insert(0, '/root/repo/tools')

RESULTS = '/root/repo/tools/bench_feed_results.jsonl'


def record(**kv):
    with open(RESULTS, 'a') as f:
        f.write(json.dumps(kv) + '\n')
    print(json.dumps(kv), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from bench_loader import make_fake_imagenet
    from quant_tpu.data.loaders import ImageNetDataLoader

    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    threads = [int(t) for t in
               (sys.argv[3].split(',') if len(sys.argv) > 3 else
                ['1', '2', '4'])]

    root = Path('/tmp/fake_imagenet')
    make_fake_imagenet(root, n_images)

    @jax.jit
    def consume(s, x):
        # Cheap but unelidable: every element participates.
        return s + jnp.sum(x)

    for w in threads:
        dl = ImageNetDataLoader(dataset_path=str(root),
                                train_batch_size=batch,
                                test_batch_size=batch, seed=0,
                                workers=w, native_decode=True)
        loader = dl.get_train_loader()
        # Warm epoch (thread pool, page cache, consume compile).
        s = jnp.zeros((), jnp.float32)
        for x, y in loader:
            s = consume(s, jnp.asarray(x))
        _ = jax.device_get(s)

        t0 = time.perf_counter()
        n = 0
        s = jnp.zeros((), jnp.float32)
        for x, y in loader:
            s = consume(s, jnp.asarray(x))
            n += x.shape[0]
        _ = jax.device_get(s)
        dt = time.perf_counter() - t0
        record(metric='feed_with_consumer_images_per_sec',
               value=round(n / dt, 1), unit='images/sec/host',
               batch=batch, images=n, decode_threads=w,
               platform=str(jax.devices()[0].platform))


if __name__ == '__main__':
    main()
