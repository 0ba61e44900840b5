"""Serving demo: packed binary ResNet-18 behind the continuous-batching
inference engine.

    python examples/serve.py --checkpoint <experiments/.../checkpoint_N> \
        --config <experiments/.../config.yaml> [--requests 64]

Without a checkpoint it serves a randomly-initialized model (throughput /
integration demo). Requests are submitted as individual images; the engine
batches them into fixed compiled buckets.
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _serve_multiprocess(args) -> None:
    """N engine processes behind the socket RPC + least-loaded frontend
    (the cross-host serving topology, one process per 'host')."""
    from quant_tpu.serving import ServingFrontend, spawn_engine_workers

    shape = [args.image_size, args.image_size, 3]
    if args.artifact:
        # Prepared offline (python -m quant_tpu.serving.prepare):
        # workers load the stripped artifact with no export work; the
        # request shape comes from its serving.yaml.
        import yaml
        meta = yaml.safe_load(
            (Path(args.artifact) / 'serving.yaml').read_text())
        shape = list(meta['input_shape'])
        spec = {'model': 'artifact', 'artifact_dir': args.artifact,
                'max_batch': 64}
    elif args.experiment:
        spec = {'model': 'experiment', 'experiment_dir': args.experiment,
                'input_shape': shape, 'max_batch': 64}
    else:
        spec = {'model': 'resnet18_random', 'input_shape': shape,
                'max_batch': 64, 'seed': 0}
    secret = None
    if args.secret_file:
        # Verbatim bytes — same contract as the worker's --secret-file.
        secret = Path(args.secret_file).read_bytes()
    print(f'spawning {args.workers} engine processes...')
    procs, clients = spawn_engine_workers(args.workers, spec,
                                          secret=secret)
    frontend = ServingFrontend(clients).start()
    try:
        rng = np.random.default_rng(0)
        t0 = time.perf_counter()
        futs = [frontend.submit(
            rng.standard_normal(shape).astype(np.float32))
            for _ in range(args.requests)]
        outs = [f.result(timeout=600) for f in futs]
        dt = time.perf_counter() - t0
        stats = frontend.stats
        per = [s['requests'] for s in stats['engines']]
        print(f'{len(outs)} requests over {args.workers} processes in '
              f'{dt:.2f}s ({len(outs) / dt:.1f} req/s), per-engine '
              f'requests={per}, batches={stats["batches"]}')
        lat = stats.get('latency_ms')
        if lat:
            print(f'aggregated latency p50/p99 = {lat["p50"]:.1f}/'
                  f'{lat["p99"]:.1f} ms')
    finally:
        for c in clients:
            c.shutdown_server()
            c.stop()
        for p in procs:
            p.wait(timeout=60)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument('--config', type=str, default=None,
                        help='experiment config.yaml defining the model')
    parser.add_argument('--checkpoint', type=str, default=None)
    parser.add_argument('--requests', type=int, default=64)
    parser.add_argument('--image-size', type=int, default=224)
    parser.add_argument('--workers', type=int, default=0,
                        help='>0: serve across N REAL engine processes '
                             'behind the socket RPC (serving/rpc.py) '
                             'with least-loaded dispatch. Each worker '
                             'owns its own device claim — use on hosts '
                             'with enough devices, or CPU.')
    parser.add_argument('--experiment', type=str, default=None,
                        help='with --workers: experiment dir every '
                             'worker loads (defaults to a random '
                             'packed ResNet-18)')
    parser.add_argument('--artifact', type=str, default=None,
                        help='with --workers: serve a PREPARED artifact '
                             'dir (quant_tpu.serving.prepare) — no '
                             'per-worker export work')
    parser.add_argument('--secret-file', type=str, default=None,
                        help='with --workers: shared RPC secret file — '
                             'enables the HMAC handshake on every '
                             'engine connection (required if workers '
                             'ever bind non-loopback)')
    args = parser.parse_args()

    if args.workers > 0:
        _serve_multiprocess(args)
        return

    import jax
    import jax.numpy as jnp
    import yaml

    from quant_tpu.serving import InferenceEngine
    from quant_tpu.train.task import build_model, init_model_variables, \
        _restore_into
    from quant_tpu.utils.checkpoints import restore_checkpoint

    if args.config:
        with open(args.config) as f:
            model_cfg = yaml.safe_load(f)['model']
        model = build_model(model_cfg['architecture'],
                            model_cfg.get('arch_config', {}))
    else:
        from bench import _resnet18
        model = _resnet18('ls-1', 'ls-1', moving_average_mode='eval_only')

    shape = (args.image_size, args.image_size, 3)
    sample = jnp.zeros((2,) + shape)
    variables = init_model_variables(model, sample, seed=0)
    if args.checkpoint:
        payload = restore_checkpoint(Path(args.checkpoint))
        variables = _restore_into(variables, payload)
    else:
        variables = dict(variables)
        variables['quant_state'] = jax.tree.map(
            lambda v: (jnp.ones_like(v)
                       if jnp.issubdtype(v.dtype, jnp.integer)
                       else jnp.full_like(v, 0.5)),
            variables.get('quant_state', {}))

    # Pack all quantized weights once, fold BN where the family allows
    # (conv->BN epilogue fold OR BN->conv threshold fold), and strip the
    # fp32 masters: the engine serves from the minimal artifact
    # (1 bit/weight, no BN modules executed where folded).
    from quant_tpu.nn.export import (export_packed_variables,
                                     fold_for_serving,
                                     strip_for_deployment)
    # sign_compute defaults to 'auto': bit-exact s8 sign-plane convs for
    # single-plane schemes, fused bf16 bake otherwise (docs/DESIGN.md).
    packed = model.clone(inference_mode='packed',
                         eval_dtype=jnp.bfloat16)
    variables = export_packed_variables(
        packed, variables, jnp.zeros((1,) + shape))
    packed, variables, _ = fold_for_serving(packed, variables)
    variables = strip_for_deployment(variables)
    engine = InferenceEngine(packed.apply, variables, shape,
                             max_batch=64)
    # Compile every bucket before accepting traffic: no request pays
    # XLA compile latency, and the req/s below measures steady state.
    engine.warmup()
    engine.start()
    try:
        rng = np.random.default_rng(0)
        t0 = time.perf_counter()
        futs = [engine.submit(
            rng.standard_normal(shape).astype(np.float32))
            for _ in range(args.requests)]
        outs = [f.result(timeout=600) for f in futs]
        dt = time.perf_counter() - t0
        stats = engine.stats
        print(f'{len(outs)} requests in {dt:.2f}s '
              f'({len(outs) / dt:.1f} req/s), '
              f'batches={stats["batches"]}, '
              f'padded={stats["padded"]}')
        # Latencies are recorded by the scheduler thread after the
        # futures resolve; with few requests the window may still be
        # empty when the main thread reads stats.
        lat = stats.get('latency_ms')
        if lat:
            print(f'latency p50/p99 = {lat["p50"]:.1f}/'
                  f'{lat["p99"]:.1f} ms')
        print('first logits:', np.asarray(outs[0])[:5])
    finally:
        engine.stop()


if __name__ == '__main__':
    main()
