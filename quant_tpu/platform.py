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
