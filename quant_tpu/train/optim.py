"""Optimizers and per-step LR schedules (optax).

Reference parity (quant/common/initialization.py:134-216):
  * optimizers: sgd / adam / adadelta with torch default hyperparameters
    (Adam betas (0.9, 0.999) eps 1e-8; Adadelta rho 0.9 eps 1e-6; L2-style
    weight_decay folded into the gradient BEFORE the moment updates, which
    is torch's semantics — hence `add_decayed_weights` ahead of the
    transform, not decoupled AdamW-style decay).
  * schedules are stepped PER BATCH, not per epoch (training.py:119), so
    epoch-denominated config params are rescaled by steps_per_epoch
    (step_lr step_size, multi_step_lr milestones) exactly as the reference
    does, and linear_lr reproduces quant/utils/linear_lr_scheduler.py:42-54.
  * lambda_lr evaluates a Python expression from the config into a
    step->multiplier function (the reference quirk, initialization.py:209)
    — gated here behind lr_scheduler.allow_eval: true since it executes
    config-supplied code.
"""

import copy
import logging
from typing import Any, Callable, Optional

import optax

logger = logging.getLogger(__name__)


def make_lr_schedule(config: dict, epochs: int,
                     steps_per_epoch: int) -> Callable[[int], float]:
    """Build a step-indexed LR schedule from a reference-schema config."""
    config = copy.deepcopy(config)
    kind = config.pop('scheduler')
    lr0 = float(config.pop('lr'))

    if kind == 'linear_lr':
        min_lr = float(config['min_lr'])
        total_steps = max((epochs - 1) * steps_per_epoch, 1)

        def schedule(step):
            lr = lr0 - step / total_steps * (lr0 + min_lr)
            if hasattr(step, 'dtype'):  # traced: stay in jnp
                import jax.numpy as jnp
                return jnp.maximum(lr, min_lr)
            return max(lr, min_lr)  # host hook path: no device op
        return schedule

    if kind == 'step_lr':
        step_size = int(config['step_size']) * steps_per_epoch
        gamma = float(config['gamma'])
        return lambda step: lr0 * gamma ** (step // step_size)

    if kind == 'multi_step_lr':
        gamma = float(config['gamma'])
        milestones = sorted(int(m) * steps_per_epoch
                            for m in config['milestones'])

        def schedule(step):
            import jax.numpy as jnp
            n = sum((step >= m).astype('int32') if hasattr(step, 'dtype')
                    else (step >= m) for m in milestones)
            return lr0 * gamma ** n
        return schedule

    if kind == 'lambda_lr':
        # The reference evals lr_lambda strings from the YAML config
        # (initialization.py:209) — i.e. configs can execute arbitrary
        # code. Kept for config compatibility, but gated: set
        # allow_eval: true in the lr_scheduler section to opt in.
        if not config.get('allow_eval', False):
            raise ValueError(
                "lambda_lr evaluates the 'lr_lambda' string as Python "
                'code; set lr_scheduler.allow_eval: true to accept that '
                'for configs you trust.')
        logger.warning('lambda_lr: eval()ing lr_lambda from the config.')
        fn = eval(config['lr_lambda'])  # noqa: S307 (reference behavior)
        return lambda step: lr0 * fn(step)

    raise ValueError(f'LR scheduler {kind} is not supported.')


def make_optimizer(
    config: dict, epochs: int, steps_per_epoch: int,
    param_labels: Optional[Any] = None,
) -> tuple[optax.GradientTransformation, Callable[[int], float]]:
    """Build (optax transform, lr schedule) from reference-schema configs.

    `config` is the merged {optimizer: {...}, lr_scheduler: {...}} section;
    the optimizer's base lr seeds the schedule.

    Per-group treatment (makes the reference's `quantized_parameters`
    scaffolding real, binary_conv.py:93-96): an optional
    ``optimizer.param_groups`` section applies per-label overrides over
    the 'quantized'/'fp' labels from train/groups.py, e.g.::

        optimizer:
          algorithm: adam
          lr: 0.001
          weight_decay: 1.0e-4
          param_groups:
            quantized: {lr_scale: 2.0, weight_decay: 0.0}

    `lr_scale` multiplies the shared schedule; `weight_decay` overrides
    the global value for that group. `param_labels` (the pytree from
    quantized_param_labels) is required when param_groups is set.
    """
    opt_cfg = copy.deepcopy(config['optimizer'])
    algorithm = opt_cfg.pop('algorithm')
    lr0 = float(opt_cfg.pop('lr', 1.0))
    weight_decay = float(opt_cfg.pop('weight_decay', 0.0))
    groups_cfg = opt_cfg.pop('param_groups', None)

    sched_cfg = dict(copy.deepcopy(config.get(
        'lr_scheduler', {'scheduler': 'step_lr', 'step_size': 10 ** 9,
                         'gamma': 1.0})))
    sched_cfg['lr'] = lr0
    schedule = make_lr_schedule(sched_cfg, epochs, steps_per_epoch)

    def build_core(lr_scale: float = 1.0) -> optax.GradientTransformation:
        lr = schedule if lr_scale == 1.0 else (
            lambda step: schedule(step) * lr_scale)
        if algorithm == 'sgd':
            momentum = float(opt_cfg.get('momentum', 0.0))
            nesterov = bool(opt_cfg.get('nesterov', False))
            return optax.sgd(learning_rate=lr,
                             momentum=momentum if momentum else None,
                             nesterov=nesterov)
        if algorithm == 'adam':
            betas = opt_cfg.get('betas', (0.9, 0.999))
            eps = float(opt_cfg.get('eps', 1e-8))
            return optax.adam(learning_rate=lr, b1=float(betas[0]),
                              b2=float(betas[1]), eps=eps)
        if algorithm == 'adadelta':
            rho = float(opt_cfg.get('rho', 0.9))
            eps = float(opt_cfg.get('eps', 1e-6))
            return optax.adadelta(learning_rate=lr, rho=rho, eps=eps)
        raise ValueError(f'Optimizer {algorithm} is not supported.')

    if groups_cfg:
        if param_labels is None:
            raise ValueError(
                'optimizer.param_groups requires param labels — build them '
                'with quant_tpu.train.groups.quantized_param_labels.')
        transforms = {}
        for label in ('fp', 'quantized'):
            g = dict(groups_cfg.get(label, {}))
            scale = float(g.pop('lr_scale', 1.0))
            wd = float(g.pop('weight_decay', weight_decay))
            if g:
                raise ValueError(
                    f'Unknown param_groups.{label} keys: {sorted(g)} '
                    "(supported: lr_scale, weight_decay)")
            core_g = build_core(scale)
            transforms[label] = (
                optax.chain(optax.add_decayed_weights(wd), core_g)
                if wd else core_g)
        return optax.multi_transform(transforms, param_labels), schedule

    core = build_core()
    if weight_decay:
        tx = optax.chain(optax.add_decayed_weights(weight_decay), core)
    else:
        tx = core
    return tx, schedule
