"""DP/TP throughput-scaling harness (BASELINE north star: throughput at
1 chip -> 1 host -> >=2 hosts).

Measures packed binary ResNet-18 inference images/sec over a
('data','model') mesh built from the visible devices, for a ladder of
data-parallel widths. On a multi-host pod run one process per host with
environment.multihost semantics (jax.distributed); on this single-chip
environment it validates the sharded program end-to-end (use
JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 for
a logic run on the virtual mesh).

Prints one JSON line per mesh size.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument('--per-device-batch', type=int, default=64)
    parser.add_argument('--image-size', type=int, default=64)
    parser.add_argument('--tensor-parallel', type=int, default=1)
    parser.add_argument('--spatial', type=int, default=0,
                        help='also measure the GSPMD spatially-sharded '
                             'forward (H banded over this many devices; '
                             'the large-image / low-latency serving axis)')
    parser.add_argument('--iters', type=int, default=8)
    args = parser.parse_args()

    from bench import _resnet18
    from quant_tpu.parallel import make_mesh
    from quant_tpu.parallel.sharding import batch_sharding

    model = _resnet18('ls-1', 'ls-1',
                      moving_average_mode='eval_only')
    packed = model.clone(inference_mode='packed', eval_dtype=jnp.bfloat16)

    n_devices = len(jax.devices())
    tp = args.tensor_parallel
    widths = [w for w in (1, 2, 4, 8, 16, 32) if w * tp <= n_devices]

    x0 = jnp.zeros((2, args.image_size, args.image_size, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x0, True)
    variables = dict(variables)
    variables['quant_state'] = jax.tree.map(
        lambda v: jnp.full_like(v, 0.5), variables.get('quant_state', {}))

    def measure(v, x, batch, **row):
        # Chained-carry timing (see bench.py: no block_until_ready on
        # this platform; one scalar device_get at the end).
        @jax.jit
        def step(v, t):
            out = packed.apply(v, t, False)
            return t + 1e-12 * jnp.mean(out).astype(t.dtype)

        y = step(v, x)
        _ = jax.device_get(jnp.sum(y[0, 0, 0]))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            y = step(v, y)
        _ = jax.device_get(jnp.sum(y[0, 0, 0]))
        dt = time.perf_counter() - t0
        print(json.dumps({
            'metric': 'packed_infer_scaling', 'global_batch': batch,
            'images_per_sec': round(batch * args.iters / dt, 2), **row,
        }), flush=True)

    for dp in widths:
        mesh = make_mesh(data=dp, model=tp,
                         devices=jax.devices()[:dp * tp])
        batch = args.per_device_batch * dp
        x = jax.device_put(
            jnp.ones((batch, args.image_size, args.image_size, 3),
                     jnp.float32), batch_sharding(mesh))
        measure(variables, x, batch, data_parallel=dp, tensor_parallel=tp,
                devices=dp * tp)

    if args.spatial:
        # Spatial axis: ONE per-device batch, H banded over the mesh —
        # the scaling axis for images too large for one chip (or
        # latency-critical small batches). GSPMD inserts the halo
        # exchanges (quant_tpu/parallel/spatial.py).
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        import numpy as np
        from quant_tpu.parallel import spatial_sharding
        sp = args.spatial
        sp_mesh = Mesh(np.asarray(jax.devices()[:sp]), ('space',))
        batch = args.per_device_batch
        x = jax.device_put(
            jnp.ones((batch, args.image_size, args.image_size, 3),
                     jnp.float32), spatial_sharding(sp_mesh))
        v_rep = jax.device_put(variables, NamedSharding(sp_mesh, P()))
        measure(v_rep, x, batch, spatial=sp, devices=sp)


if __name__ == '__main__':
    main()
