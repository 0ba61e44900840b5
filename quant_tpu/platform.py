"""Compute platforms (reference quant/common/compute_platform.py).

`ComputePlatform` is the run-environment abstraction; `LocalComputePlatform`
reproduces the reference's behavior: optionally spawn a TensorBoard server
subprocess (port from the TENSORBOARD_PORT env var) for the duration of the
experiment (compute_platform.py:61-115). The multi-host pod path does not
need a platform subclass — `environment.multihost: true` in the config
drives `jax.distributed` initialization inside the task itself
(quant_tpu/parallel/multihost.py), which is the TPU-native shape of the
reference's never-implemented remote platform.
"""

import logging
import os
import shutil
import subprocess
from abc import ABC, abstractmethod
from pathlib import Path
from typing import Optional

from quant_tpu.experiment import Experiment

logger = logging.getLogger(__name__)


class ComputePlatform(ABC):
    """Abstract platform an experiment runs on."""

    @abstractmethod
    def run(self, experiment: Experiment) -> tuple[list, list]:
        """Run the experiment, returning (train, test) epoch metrics."""


class LocalComputePlatform(ComputePlatform):
    def __init__(self, root_experiments_dir: Optional[Path] = None,
                 start_tensorboard: bool = True):
        self.root = root_experiments_dir
        self.start_tensorboard = start_tensorboard

    def run(self, experiment: Experiment) -> tuple[list, list]:
        tb_proc = None
        config = experiment.config
        wants_tb = (self.start_tensorboard
                    and config.get('log', {}).get('tensorboard'))
        if wants_tb and shutil.which('tensorboard'):
            port = os.environ.get('TENSORBOARD_PORT', '6006')
            logdir = experiment.experiment_dir / 'tensorboard'
            logdir.mkdir(parents=True, exist_ok=True)
            tb_proc = subprocess.Popen(
                ['tensorboard', '--logdir', str(logdir), '--port', port],
                stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
            logger.info('TensorBoard serving %s on port %s', logdir, port)
        elif wants_tb:
            logger.info('tensorboard binary not found; metrics are still '
                        'written as event files and CSVs')
        try:
            return experiment.run()
        finally:
            if tb_proc is not None:
                tb_proc.terminate()


class PodComputePlatform(ComputePlatform):
    """Run the experiment as N cooperating processes on this machine —
    a simulated pod (the subclass point the reference reserved for its
    never-implemented remote platform, compute_platform.py:38-58).

    Each worker (quant_tpu/pod_worker.py) joins a local
    `jax.distributed` coordinator; `classification_task` then switches
    to per-host disjoint dataset shards + global-batch assembly
    automatically. Checkpoints and artifacts are written by process 0
    only. Use `env` to shape the workers (the canonical CPU-pod
    simulation: JAX_PLATFORMS=cpu plus
    XLA_FLAGS=--xla_force_host_platform_device_count=K for K devices
    per process).

    On a real TPU pod, do NOT use this class — run the example CLI once
    per host; jax.distributed discovers the TPU coordinator itself.
    """

    def __init__(self, n_processes: int, port: Optional[int] = None,
                 env: Optional[dict] = None, timeout: float = 600.0):
        self.n_processes = n_processes
        self.port = port  # None -> pick a free ephemeral port per run
        self.env = env or {}
        self.timeout = timeout
        # Observability hook: called with the list of Popen handles
        # right after spawn (tests use it to preempt single workers).
        self.on_spawn: Optional[object] = None

    def run(self, experiment: Experiment) -> tuple[list, list]:
        import json
        import socket
        import sys
        import tempfile
        import time

        # The workers run `classification_task` resolved from the
        # serialized config; a custom task_fn/loader/hooks object cannot
        # cross the process boundary — fail loudly instead of silently
        # running defaults.
        from quant_tpu.train.task import classification_task
        if (experiment.task_fn is not classification_task
                or experiment.data_loader_cls is not None
                or experiment.get_hooks is not None):
            raise ValueError(
                'PodComputePlatform runs classification_task resolved '
                'from the config; custom task_fn / data_loader_cls / '
                'get_hooks are not forwarded to the workers.')

        port = self.port
        if port is None:
            with socket.socket() as s:
                s.bind(('127.0.0.1', 0))
                port = s.getsockname()[1]

        exp_dir = experiment.experiment_dir
        exp_dir.mkdir(parents=True, exist_ok=True)
        with tempfile.TemporaryDirectory() as td:
            cfg_path = Path(td) / 'config.json'
            out_path = Path(td) / 'metrics.json'
            cfg = dict(experiment.config)
            cfg['log'] = dict(cfg.get('log', {}))
            cfg['log']['root_experiments_dir'] = str(
                experiment.root_experiments_dir)
            with open(cfg_path, 'w') as f:
                json.dump(cfg, f)
            env = dict(os.environ, **{k: str(v)
                                      for k, v in self.env.items()})
            procs = [
                subprocess.Popen(
                    [sys.executable, '-m', 'quant_tpu.pod_worker',
                     str(cfg_path), str(pid), str(self.n_processes),
                     str(port), str(out_path)],
                    env=env, cwd=str(Path(__file__).resolve().parents[1]))
                for pid in range(self.n_processes)
            ]
            if callable(self.on_spawn):
                self.on_spawn(procs)
            try:
                # Poll the gang under one shared deadline. A worker that
                # died strands its peers inside collectives, so the
                # FIRST failure (not the first in list order) aborts and
                # kills everyone.
                deadline = time.monotonic() + self.timeout
                while True:
                    rcs = [p.poll() for p in procs]
                    failed = [(i, rc) for i, rc in enumerate(rcs)
                              if rc not in (None, 0)]
                    if failed:
                        raise RuntimeError(
                            f'pod worker(s) failed: {failed} '
                            f'(all exit codes: {rcs})')
                    if all(rc == 0 for rc in rcs):
                        break
                    if time.monotonic() > deadline:
                        raise RuntimeError(
                            f'pod workers did not finish within '
                            f'{self.timeout}s (exit codes: {rcs})')
                    time.sleep(0.2)
            finally:
                for p in procs:
                    if p.poll() is None:
                        p.kill()
                for p in procs:
                    p.wait()
            with open(out_path) as f:
                payload = json.load(f)
        return payload['train'], payload['test']
