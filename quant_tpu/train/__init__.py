"""Training engine: jitted steps, metrics, optimizers, KD, task driver."""

from quant_tpu.train.losses import get_loss_fn
from quant_tpu.train.kd import kd_criterion
from quant_tpu.train.metrics import MetricAccumulator
from quant_tpu.train.optim import make_lr_schedule, make_optimizer
from quant_tpu.train.state import TrainState
from quant_tpu.train.engine import (
    make_train_step, make_eval_step, train_epoch, evaluate,
)

__all__ = [
    'get_loss_fn', 'kd_criterion', 'MetricAccumulator',
    'make_lr_schedule', 'make_optimizer', 'TrainState',
    'make_train_step', 'make_eval_step', 'train_epoch', 'evaluate',
]
