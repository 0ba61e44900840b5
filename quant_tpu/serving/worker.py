"""Serving worker process: one InferenceEngine behind the socket RPC.

Launched once per host/process (`python -m quant_tpu.serving.worker
--spec spec.json --port-file P`); builds the model from the spec, wraps
it in an EngineServer and serves until a shutdown op arrives. The bound
port is written to --port-file so the parent/frontend can connect
without racing the bind (ephemeral ports by default).

Spec (JSON):
  model: 'experiment'        — serve a trained experiment directory
                               (config.yaml + latest checkpoint), packed
                               + BN-folded where the family allows;
         'artifact'          — serve a PREPARED artifact
                               (serving/prepare.py): stripped packed
                               variables load directly, no per-worker
                               export/fold work;
         'lenet_random'      — deterministic random LeNet (tests/demos);
         'resnet18_random'   — deterministic random packed ResNet-18.
  experiment_dir: for model='experiment'.
  artifact_dir: for model='artifact' (input_shape comes from its
        serving.yaml unless overridden).
  seed: init seed for the *_random models (same seed => identical
        variables in every worker, the interchangeable-backend
        contract).
  input_shape, max_batch, batch_buckets, max_wait_ms: engine knobs.

`spawn_engine_workers` is the parent-side helper: starts N workers,
waits for their ports, returns (procs, clients).
"""

import argparse
import json
import logging
import os
import pathlib
import subprocess
import sys
import tempfile
import time
from typing import Optional

logger = logging.getLogger(__name__)


def build_engine_from_spec(spec: dict) -> 'object':
    """Construct the InferenceEngine a worker serves."""
    import jax
    import jax.numpy as jnp

    from quant_tpu.serving.engine import InferenceEngine

    kind = spec.get('model', 'lenet_random')
    max_batch = int(spec.get('max_batch', 32))
    buckets = spec.get('batch_buckets')
    max_wait = float(spec.get('max_wait_ms', 2.0))
    seed = int(spec.get('seed', 0))

    if kind == 'experiment':
        import yaml

        from quant_tpu.train.task import build_model
        from quant_tpu.utils.checkpoints import (
            get_path_to_checkpoint, restore_checkpoint,
        )
        exp = pathlib.Path(spec['experiment_dir'])
        cfg = yaml.safe_load((exp / 'config.yaml').read_text())
        model = build_model(cfg['model']['architecture'],
                            cfg['model'].get('arch_config', {}))
        payload = restore_checkpoint(get_path_to_checkpoint(exp))
        variables = {'params': payload['params'],
                     'batch_stats': payload.get('batch_stats', {}),
                     'quant_state': payload.get('quant_state', {})}
        input_shape = tuple(spec['input_shape'])
        sample = jnp.zeros((1,) + input_shape, jnp.float32)
        serve_model = model
        if getattr(model, 'inference_mode', 'dense') != 'packed' \
                and hasattr(model, 'clone'):
            try:
                from quant_tpu.nn.export import (
                    export_packed_variables, fold_for_serving,
                )
                packed = model.clone(inference_mode='packed')
                variables = export_packed_variables(packed, variables,
                                                    sample)
                serve_model, variables, _ = fold_for_serving(packed,
                                                             variables)
            except Exception as e:  # noqa: BLE001 — fall back, loudly
                logger.warning(
                    'packed export failed (%s: %s) — serving the DENSE '
                    'path. For a quantized model this is a large perf '
                    'regression; investigate rather than ignore.',
                    type(e).__name__, e)
                serve_model = model
        return InferenceEngine(serve_model.apply, variables, input_shape,
                               max_batch=max_batch, batch_buckets=buckets,
                               max_wait_ms=max_wait)

    if kind == 'artifact':
        from quant_tpu.serving.prepare import load_serving_artifact
        serve_model, variables, art_shape = load_serving_artifact(
            spec['artifact_dir'])
        input_shape = tuple(spec.get('input_shape', art_shape))
        return InferenceEngine(serve_model.apply, variables, input_shape,
                               max_batch=max_batch, batch_buckets=buckets,
                               max_wait_ms=max_wait)

    if kind == 'lenet_random':
        from quant_tpu.nn import QLeNet5
        input_shape = tuple(spec.get('input_shape', (28, 28, 1)))
        model = QLeNet5(conv1_filters=int(spec.get('conv1_filters', 4)),
                        conv2_filters=int(spec.get('conv2_filters', 4)),
                        x_quant='ls-1', w_quant='ls-1')
        x = jnp.zeros((2,) + input_shape, jnp.float32)
        variables = model.init(jax.random.key(seed), x, True)
        return InferenceEngine(model.apply, variables, input_shape,
                               max_batch=max_batch, batch_buckets=buckets,
                               max_wait_ms=max_wait)

    if kind == 'resnet18_random':
        from quant_tpu.nn import QResNet
        input_shape = tuple(spec.get('input_shape', (224, 224, 3)))
        layer = {'x_quant': 'ls-1', 'w_quant': 'ls-1',
                 'clamp': {'kind': 'symmetric', 'alpha': 2.0},
                 'double_shortcut': True}
        model = QResNet(
            block='xnor',
            layer0={'n_in_channels': 64, 'kernel_size': 7, 'stride': 2,
                    'padding': 3, 'bias': False,
                    'maxpool': {'type': 'maxpool2d', 'kernel_size': 3,
                                'stride': 2, 'padding': 1}},
            layer1=dict(layer), layer2=dict(layer), layer3=dict(layer),
            layer4=dict(layer), nonlins=['prelu', 'prelu'],
            num_blocks=[2, 2, 2, 2], output_classes=1000,
            moving_average_mode='eval_only')
        x = jnp.zeros((2,) + input_shape, jnp.float32)
        v = dict(model.init(jax.random.key(seed), x, True))
        v['quant_state'] = jax.tree.map(lambda t: jnp.full_like(t, 0.5),
                                        v.get('quant_state', {}))
        packed = model.clone(inference_mode='packed',
                             eval_dtype=jnp.bfloat16, sign_compute='int8')
        return InferenceEngine(packed.apply, v, input_shape,
                               max_batch=max_batch, batch_buckets=buckets,
                               max_wait_ms=max_wait)

    raise ValueError(f'unknown model spec {kind!r}')


def main(argv: Optional[list] = None) -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument('--spec', required=True,
                        help='JSON spec file (see module docstring)')
    parser.add_argument('--host', default='127.0.0.1')
    parser.add_argument('--port', type=int, default=0)
    parser.add_argument('--port-file', default=None,
                        help='write the bound port here once listening')
    parser.add_argument('--secret-file', default=None,
                        help='file holding the shared RPC secret '
                             '(REQUIRED for a non-loopback --host)')
    args = parser.parse_args(argv)

    from quant_tpu.serving.rpc import EngineServer

    # The file's bytes ARE the secret, verbatim (no stripping: the
    # spawner writes raw bytes — e.g. os.urandom output — and both
    # sides must derive the same HMAC key).
    secret = (pathlib.Path(args.secret_file).read_bytes()
              if args.secret_file else None)
    spec = json.loads(pathlib.Path(args.spec).read_text())
    engine = build_engine_from_spec(spec)
    if spec.get('warmup', True):
        engine.warmup()
    server = EngineServer(engine, host=args.host, port=args.port,
                          secret=secret)
    server.start()
    if args.port_file:
        tmp = args.port_file + '.tmp'
        pathlib.Path(tmp).write_text(str(server.address[1]))
        os.replace(tmp, args.port_file)  # atomic: no partial reads
    server.wait_for_shutdown()
    server.stop()


def spawn_engine_workers(n: int, spec: dict,
                         env: Optional[dict] = None,
                         timeout: float = 180.0,
                         secret: Optional[bytes] = None) -> tuple:
    """Start n worker processes; returns (procs, clients) once every
    worker is listening. Caller owns shutdown (client.shutdown_server()
    then proc.wait()). On a worker failing to come up, every
    already-started worker is killed before the error propagates — no
    leaked processes holding device claims."""
    from quant_tpu.serving.rpc import RemoteEngineClient

    tmp = tempfile.mkdtemp(prefix='qtpu_serve_')
    spec_path = pathlib.Path(tmp) / 'spec.json'
    spec_path.write_text(json.dumps(spec))
    secret_args: list[str] = []
    if secret is not None:
        sf = pathlib.Path(tmp) / 'secret'
        sf.write_bytes(secret)
        sf.chmod(0o600)
        secret_args = ['--secret-file', str(sf)]
    procs: list = []
    clients: list = []
    port_files = []
    full_env = dict(os.environ)
    if env:
        full_env.update(env)
    try:
        for i in range(n):
            pf = str(pathlib.Path(tmp) / f'port{i}')
            port_files.append(pf)
            # -c (not -m): the runpy re-import of an already-imported
            # submodule would warn when the parent itself imported worker.
            procs.append(subprocess.Popen(
                [sys.executable, '-c',
                 'from quant_tpu.serving.worker import main; main()',
                 '--spec', str(spec_path), '--port-file', pf,
                 *secret_args],
                env=full_env,
                cwd=str(pathlib.Path(__file__).resolve().parents[2])))
        deadline = time.monotonic() + timeout
        ports = []
        for pf, proc in zip(port_files, procs):
            while not os.path.exists(pf):
                if proc.poll() is not None:
                    raise RuntimeError(
                        f'serving worker exited rc={proc.returncode} '
                        f'before listening')
                if time.monotonic() > deadline:
                    raise TimeoutError('serving worker did not start')
                time.sleep(0.1)
            ports.append(int(pathlib.Path(pf).read_text()))
        for p in ports:
            clients.append(RemoteEngineClient('127.0.0.1', p,
                                              secret=secret))
    except BaseException:
        for c in clients:
            try:
                c.stop()
            except Exception:  # noqa: BLE001 — best-effort cleanup
                pass
        for p in procs:
            try:
                p.kill()
                p.wait(timeout=10)  # reap: no zombies in the parent
            except (OSError, subprocess.TimeoutExpired):
                pass
        raise
    return procs, clients


if __name__ == '__main__':
    main()
