"""Experiment: config snapshot, task run, per-epoch metric CSVs.

Reference parity (quant/common/experiment.py): writes the resolved
config.yaml into the experiment directory (:101-104), runs the task, and
dumps per-epoch train/test metrics to metrics/{train,test}.csv (:32-57).
Experiment dir layout: checkpoints/ config.yaml metrics/ tensorboard/.
"""

import logging
from pathlib import Path
from typing import Callable, Optional, Type

import yaml

from quant_tpu.data import QuantDataLoader
from quant_tpu.train.task import classification_task

logger = logging.getLogger(__name__)


def log_metrics_to_experiments_dir(train_metrics: list[dict],
                                   test_metrics: list[dict],
                                   experiment_dir: Path) -> None:
    import pandas as pd
    metrics_dir = Path(experiment_dir) / 'metrics'
    metrics_dir.mkdir(parents=True, exist_ok=True)
    if train_metrics:
        pd.DataFrame(train_metrics).to_csv(metrics_dir / 'train.csv',
                                           index=False)
    if test_metrics:
        pd.DataFrame(test_metrics).to_csv(metrics_dir / 'test.csv',
                                          index=False)


class Experiment:
    """One configured run of a task function."""

    def __init__(self, task_fn: Callable, config: dict,
                 data_loader_cls: Optional[Type[QuantDataLoader]] = None,
                 get_hooks: Optional[Callable] = None,
                 root_experiments_dir: Optional[Path] = None):
        self.task_fn = task_fn
        self.config = config
        self.data_loader_cls = data_loader_cls
        self.get_hooks = get_hooks
        self.root_experiments_dir = Path(
            root_experiments_dir
            if root_experiments_dir is not None
            else config['log'].get('root_experiments_dir', 'experiments/'))

    @property
    def experiment_dir(self) -> Path:
        return self.root_experiments_dir / self.config['experiment_name']

    def run(self) -> tuple[list[dict], list[dict]]:
        exp_dir = self.experiment_dir
        exp_dir.mkdir(parents=True, exist_ok=True)
        # Snapshot the config minus transient CLI flags: persisting
        # skip_training/restore paths would poison later resumes that
        # reload this file (e.g. an eval-only visit would freeze the
        # experiment in skip_training mode forever).
        snapshot = {k: v for k, v in self.config.items()
                    if k not in ('skip_training', 'restore_experiment',
                                 'init_from_checkpoint')}
        with open(exp_dir / 'config.yaml', 'w') as f:
            yaml.safe_dump(snapshot, f)

        restore = self.config.get('restore_experiment')
        train_metrics, test_metrics = self.task_fn(
            self.config,
            self.root_experiments_dir,
            self.data_loader_cls,
            self.get_hooks,
            Path(restore) if restore else None,
        )
        log_metrics_to_experiments_dir(train_metrics, test_metrics, exp_dir)
        return train_metrics, test_metrics


def run_classification_experiment(
        config: dict,
        data_loader_cls: Optional[Type[QuantDataLoader]] = None,
        get_hooks: Optional[Callable] = None) -> tuple[list, list]:
    """Convenience wrapper used by the example drivers."""
    return Experiment(classification_task, config, data_loader_cls,
                      get_hooks).run()
