"""Edge-branch coverage for paths the feature tests skirt around
(branch-coverage gate targets: serving engine/rpc/prepare, profiling,
losses). Every test pins REAL behavior — no coverage-only no-ops."""

import time
from concurrent.futures import Future

import numpy as np
import pytest


# --- serving.InferenceEngine ------------------------------------------


def _tiny_engine(**kw):
    import jax
    import jax.numpy as jnp

    from quant_tpu.nn import QLeNet5
    from quant_tpu.serving import InferenceEngine
    model = QLeNet5(conv1_filters=2, conv2_filters=2,
                    x_quant='ls-1', w_quant='ls-1')
    x = jnp.zeros((2, 28, 28, 1), jnp.float32)
    variables = model.init(jax.random.key(0), x, True)
    return InferenceEngine(model.apply, variables, (28, 28, 1), **kw)


def test_engine_warmup_rejects_unknown_bucket():
    eng = _tiny_engine(max_batch=4)
    with pytest.raises(ValueError, match='not a configured bucket'):
        eng.warmup(buckets=[3])


def test_engine_predict_empty_and_chunked():
    eng = _tiny_engine(max_batch=2)
    assert eng.predict(np.empty((0, 28, 28, 1), np.float32)).size == 0
    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((5, 28, 28, 1)).astype(np.float32)
    out = eng.predict(imgs)  # 3 chunks through the 2-bucket
    assert out.shape == (5, 10)
    # Chunking equals one-shot on the same rows.
    np.testing.assert_allclose(out[:2], eng.predict(imgs[:2]),
                               rtol=1e-6, atol=1e-6)


def test_engine_submit_rejects_bad_shape_and_ping_lifecycle():
    eng = _tiny_engine(max_batch=2)
    with pytest.raises(ValueError, match='expected shape'):
        eng.submit(np.zeros((3, 3, 1), np.float32))
    assert not eng.ping()  # not started yet
    eng.start()
    assert eng.ping()
    eng.stop()
    assert not eng.ping()


# --- serving.ServingFrontend health edges -----------------------------


class _Backend:
    load = 0

    def __init__(self, alive=True):
        self._alive = alive

    def start(self):
        return self

    def stop(self):
        pass

    def ping(self):
        return self._alive

    def submit(self, image):
        f = Future()
        if self._alive:
            f.set_result(np.ones(1))
        else:
            f.set_exception(ConnectionError('down'))
        return f

    def latency_window(self):
        return np.asarray([])

    stats = {'requests': 0, 'batches': 0}


def test_frontend_all_dead_raises_after_reprobe():
    from quant_tpu.serving import ServingFrontend
    backends = [_Backend(alive=False), _Backend(alive=False)]
    front = ServingFrontend(backends, max_failures=1)
    # Drive both to eviction via their failing futures.
    for _ in range(4):
        try:
            front.submit(np.zeros(1))
        except RuntimeError:
            break
    with pytest.raises(RuntimeError, match='no live backends'):
        for _ in range(20):  # remaining submits must fail fast
            front.submit(np.zeros(1))
        raise AssertionError('both dead backends kept accepting work')


def test_frontend_recovers_backend_through_ping():
    from quant_tpu.serving import ServingFrontend
    flaky, steady = _Backend(alive=False), _Backend(alive=True)
    front = ServingFrontend([flaky, steady], max_failures=1,
                            reprobe_interval=0.05)
    front.start()
    try:
        # Evict the dead one.
        deadline = time.monotonic() + 10
        while front.alive != [False, True]:
            assert time.monotonic() < deadline
            front.submit(np.zeros(1)).exception(timeout=10)
            time.sleep(0.02)
        # Revive it; the health thread must re-admit within a few ticks.
        flaky._alive = True
        deadline = time.monotonic() + 10
        while front.alive != [True, True]:
            assert time.monotonic() < deadline
            time.sleep(0.05)
        assert 'alive' in front.stats and front.stats['alive'] == [True,
                                                                   True]
    finally:
        front.stop()


# --- serving.rpc protocol edges ---------------------------------------


def test_rpc_unknown_op_and_latency_fallback():
    from quant_tpu.serving import EngineServer, RemoteEngineClient

    class NoWindow:
        """Engine without latency_window: server falls back to the raw
        _latencies attribute."""
        _latencies = [0.25]

        def start(self):
            return self

        def stop(self):
            pass

        @property
        def stats(self):
            return {'requests': 0, 'batches': 0}

    server = EngineServer(NoWindow()).start()
    try:
        client = RemoteEngineClient('127.0.0.1', server.address[1])
        np.testing.assert_allclose(client.latency_window(), [0.25])
        with pytest.raises(RuntimeError, match='unknown op'):
            client._call({'op': 'frobnicate'})
    finally:
        server.stop()


def test_rpc_oversized_handshake_frame_rejected():
    import socket
    import struct

    from quant_tpu.serving import EngineServer
    server = EngineServer(_Backend(), secret=b'k').start()
    try:
        sock = socket.create_connection(('127.0.0.1', server.address[1]),
                                        timeout=10)
        sock.settimeout(10)
        sock.recv(8 + 32)  # header + nonce
        # Claim a gigantic answer: server must drop, not allocate.
        sock.sendall(struct.pack('>Q', 1 << 40))
        assert sock.recv(1) == b''
        sock.close()
    finally:
        server.stop()


# --- serving.prepare CLI (in-process, covers the calib branch) --------


def test_prepare_cli_calibrate_synthetic(tmp_path):
    import jax.numpy as jnp
    import yaml

    from quant_tpu.experiment import Experiment
    from quant_tpu.serving import prepare as prep
    from quant_tpu.train.task import classification_task

    cfg = {
        'seed': 3,
        'environment': {'nchips': 1},
        'data': {'dataset': 'synthetic', 'train_batch_size': 8,
                 'test_batch_size': 8, 'train_size': 16, 'test_size': 8},
        'model': {'architecture': 'lenet5', 'loss': 'nll_loss',
                  'arch_config': {'conv1_filters': 2, 'conv2_filters': 2,
                                  'x_quant': 'ls-1', 'w_quant': 'ls-1'}},
        'optimization': {'epochs': 1,
                         'optimizer': {'algorithm': 'sgd', 'lr': 0.05},
                         'lr_scheduler': {'scheduler': 'step_lr',
                                          'step_size': 1, 'gamma': 1.0}},
        'log': {'level': 'WARNING', 'interval': 100, 'save_model_freq': 1,
                'tensorboard': False,
                'root_experiments_dir': str(tmp_path / 'experiments')},
        'experiment_name': 'cliprep',
    }
    Experiment(classification_task, cfg).run()
    exp_dir = tmp_path / 'experiments' / 'cliprep'
    out = tmp_path / 'art'
    prep.main(['--experiment', str(exp_dir), '--out', str(out),
               '--input-shape', '28,28,1', '--calibrate-synthetic', '2'])
    meta = yaml.safe_load((out / 'serving.yaml').read_text())
    # Calibration switched the artifact to EMA mode and (lenet) folded.
    assert meta['model']['arch_config']['moving_average_mode'] == \
        'eval_only'
    assert meta['bn_fold'] is True
    model, variables, shape = prep.load_serving_artifact(out)
    assert shape == (28, 28, 1)
    logits = model.apply(variables, jnp.zeros((1,) + shape), False)
    assert np.isfinite(np.asarray(logits)).all()


def test_prepare_empty_calibration_refuses(tmp_path):
    from quant_tpu.nn.export import calibrate_ema_scales
    from quant_tpu.nn import QLeNet5
    import jax
    import jax.numpy as jnp

    model = QLeNet5(conv1_filters=2, conv2_filters=2,
                    x_quant='ls-1', w_quant='ls-1')
    v = model.init(jax.random.key(0), jnp.zeros((1, 28, 28, 1)), True)
    with pytest.raises(ValueError, match='empty'):
        calibrate_ema_scales(model, v, [])


# --- utils.profiling.StepTimer ----------------------------------------


def test_step_timer_logs_with_and_without_sync(caplog):
    import logging

    from quant_tpu.utils.profiling import StepTimer

    synced = []
    timer = StepTimer(batch_size=4, log_every=2,
                      sync_fn=lambda: synced.append(1))
    with caplog.at_level(logging.INFO, 'quant_tpu.utils.profiling'):
        timer(epoch=1, global_step=0)   # primes t0, no log
        timer(epoch=1, global_step=1)   # below log_every
        timer(epoch=1, global_step=2)   # logs + syncs
    assert synced == [1]
    assert any('steps/s' in r.message and 'images/s' in r.message
               for r in caplog.records)

    plain = StepTimer(log_every=1)  # no batch_size, no sync_fn
    with caplog.at_level(logging.INFO, 'quant_tpu.utils.profiling'):
        plain(epoch=0, global_step=0)
        plain(epoch=0, global_step=1)
    assert any('steps/s' in r.message and 'images/s' not in r.message
               for r in caplog.records[-1:])


# --- train.losses registry --------------------------------------------


def test_get_loss_fn_rejects_unknown():
    from quant_tpu.train import get_loss_fn
    with pytest.raises(ValueError, match='not supported'):
        get_loss_fn('focal')
