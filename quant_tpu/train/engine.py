"""Jitted train/eval steps and epoch drivers.

The reference's per-batch loop (quant/common/training.py:66-204) does:
to(device) -> zero_grad -> forward -> (teacher forward) -> loss ->
backward -> optimizer.step -> scheduler.step (per batch) -> metric updates
-> hooks. Here the whole batch program — forward (with quantizer-state and
BN-state updates), loss, gradient, optimizer update, metric update, and
for KD the teacher forward — is ONE jitted XLA computation; the host loop
only feeds batches and fires hooks.

Sharding: `make_train_step(..., mesh=...)` installs batch-axis input
shardings so the same step runs single-chip or data-parallel over a
`jax.sharding.Mesh`; gradient/metric psums are inserted by GSPMD (the
TPU-native replacement for the reference's nn.DataParallel,
initialization.py:125-127).
"""

import inspect
import logging
from typing import Any, Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import optax

from quant_tpu.train.metrics import (
    MetricAccumulator, update_metric_state,
)
from quant_tpu.train.state import TrainState

logger = logging.getLogger(__name__)

Hook = Callable[..., None]


def _accepts_metrics(hook: Hook) -> bool:
    """Old-protocol hooks (epoch, global_step, values_dict,
    log_interval) keep working: the live-metrics kwarg is only passed
    to hooks that declare it (or **kwargs)."""
    try:
        params = inspect.signature(hook).parameters.values()
    except (TypeError, ValueError):  # builtins/mocks: assume permissive
        return True
    return any(p.kind == p.VAR_KEYWORD or p.name == 'metrics'
               for p in params)


def _mutable_collections(state: TrainState) -> list[str]:
    cols = []
    if state.batch_stats is not None:
        cols.append('batch_stats')
    if state.quant_state is not None:
        cols.append('quant_state')
    return cols


def make_train_step(loss_fn: Callable,
                    teacher_apply: Optional[Callable] = None,
                    mesh: Optional[jax.sharding.Mesh] = None,
                    donate: bool = True) -> Callable:
    """Build the jitted train step.

    Args:
        loss_fn: (output, target) -> scalar, or with a teacher
            (output, teacher_output, target) -> scalar.
        teacher_apply: optional frozen-teacher forward: (data) -> logits
            (already closed over teacher variables; runs inside the same
            XLA program as the student step, SURVEY.md hard-part 5).
        mesh: optional mesh for data-parallel input sharding.
        donate: donate the input state buffers (halves HBM traffic).
    """

    def step(state: TrainState, data: jax.Array, target: jax.Array,
             metric_state: dict) -> tuple[TrainState, dict, jax.Array]:
        def loss_for(params):
            variables = {'params': params,
                         'batch_stats': state.batch_stats,
                         'quant_state': state.quant_state}
            output, mut = state.apply_fn(
                variables, data, True,
                mutable=['batch_stats', 'quant_state'])
            if teacher_apply is None:
                loss = loss_fn(output, target)
                t_out = None
            else:
                t_out = teacher_apply(data)
                loss = loss_fn(output, t_out, target)
            return loss, (output, mut)

        (loss, (output, mut)), grads = jax.value_and_grad(
            loss_for, has_aux=True)(state.params)
        updates, new_opt_state = state.tx.update(grads, state.opt_state,
                                                 state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=mut.get('batch_stats', state.batch_stats),
            quant_state=mut.get('quant_state', state.quant_state),
            opt_state=new_opt_state,
        )
        new_metrics = update_metric_state(metric_state, loss, output, target)
        return new_state, new_metrics, loss

    kwargs: dict[str, Any] = {}
    if donate:
        kwargs['donate_argnums'] = (0, 3)
    if mesh is not None:
        # Constrain only the batch inputs; the state keeps whatever
        # shardings it was placed with (replicated for pure DP,
        # out-channel-sharded for TP) and GSPMD propagates from there.
        from quant_tpu.parallel.sharding import batch_sharding
        kwargs['in_shardings'] = (None, batch_sharding(mesh),
                                  batch_sharding(mesh), None)
    return jax.jit(step, **kwargs)


def make_eval_step(loss_fn: Callable,
                   mesh: Optional[jax.sharding.Mesh] = None) -> Callable:
    """Build the jitted eval step (no state mutation, cached quant scales).

    When loss_fn carries a `.per_sample` form (the built-in losses do),
    the metric update masks out sentinel rows (target < 0) — the padding
    multi-process eval adds so every host steps over identical shapes
    while the metrics still cover exactly the real test set."""
    per_sample = getattr(loss_fn, 'per_sample', None)

    def step(state: TrainState, data: jax.Array, target: jax.Array,
             metric_state: dict) -> tuple[dict, jax.Array]:
        output = state.apply_fn(state.model_variables, data, False)
        if per_sample is not None:
            from quant_tpu.train.metrics import update_metric_state_masked
            safe_t = jnp.maximum(target, 0)
            return update_metric_state_masked(
                metric_state, per_sample(output, safe_t), output,
                target), output
        loss = loss_fn(output, target)
        return update_metric_state(metric_state, loss, output, target), output

    kwargs: dict[str, Any] = {}
    if mesh is not None:
        from quant_tpu.parallel.sharding import batch_sharding
        kwargs['in_shardings'] = (None, batch_sharding(mesh),
                                  batch_sharding(mesh), None)
    return jax.jit(step, **kwargs)


def train_epoch(train_step: Callable, state: TrainState,
                loader: Iterable, epoch: int, log_interval: int = 10,
                hooks: Optional[list[Hook]] = None,
                lr_schedule: Optional[Callable] = None,
                steps_per_epoch: Optional[int] = None,
                assemble: Callable = jnp.asarray,
                stop: Optional[Callable[[], bool]] = None,
                ) -> tuple[TrainState, dict[str, float]]:
    """Run one training epoch; returns (new state, computed metrics).

    assemble: host batch -> device array. Default jnp.asarray; multi-host
    runs pass `parallel.multihost.global_batch` so each host's local rows
    form one logical DP-sharded global batch.
    stop: polled before each batch (a `PreemptionGuard`); when it turns
    true the epoch ends early with the metrics accumulated so far.
    """
    hooks = hooks or []
    hook_metrics_ok = [_accepts_metrics(h) for h in hooks]
    metrics = MetricAccumulator()
    metric_state = metrics.state
    seen = 0
    n_total = getattr(loader, 'num_examples', None)
    # Host-side step mirror: one sync at epoch start instead of a
    # device_get per batch in the hook path.
    host_step = int(jax.device_get(state.step))
    for batch_idx, (data, target) in enumerate(loader):
        if stop is not None and stop():
            logger.warning('Stop requested: ending epoch %d after %d '
                           'batches.', epoch, batch_idx)
            break
        data = assemble(data)
        target = assemble(target)
        state, metric_state, loss = train_step(state, data, target,
                                               metric_state)
        host_step += 1
        seen += data.shape[0]
        global_step = 1 + (epoch - 1) * (steps_per_epoch or 0) + batch_idx
        if hooks:
            # Live accumulators ride along so the TB hook logs the real
            # train metrics every log_interval (reference
            # visualization.py:45-62); the hook computes them only when
            # its interval gate passes. Old-signature hooks (no
            # metrics/**kwargs) are called without the new kwarg.
            metrics.state = metric_state
            lr = (float(lr_schedule(host_step - 1))
                  if lr_schedule else None)
            for hook, with_metrics in zip(hooks, hook_metrics_ok):
                kw = ({'metrics': {'train': metrics}}
                      if with_metrics else {})
                hook(epoch=epoch, global_step=global_step,
                     values_dict={'lr': lr}, log_interval=log_interval,
                     **kw)
        if batch_idx % log_interval == 0:
            logger.info('Train Epoch: %d [%d/%s]\tBatch Loss: %.6f',
                        epoch, seen, n_total or '?', float(loss))
    metrics.state = metric_state
    computed = metrics.compute()
    logger.info('Training set evaluation metrics: %s', computed)
    return state, computed


def evaluate(eval_step: Callable, state: TrainState, loader: Iterable,
             epoch: int = 1,
             hooks: Optional[list[Hook]] = None,
             assemble: Callable = jnp.asarray,
             stop: Optional[Callable[[], bool]] = None,
             pad_rows_to: Optional[int] = None) -> dict[str, float]:
    """Evaluate on a held-out set; returns computed metrics.

    stop: polled before each batch (see train_epoch) — a preemption
    during a long eval should not delay the interrupt checkpoint.
    pad_rows_to: pad each (host-local) batch's rows up to a multiple of
    this with sentinel target -1 rows (mesh divisibility for the batch
    sharding). Only valid when the eval step masks sentinels (built-in
    losses); the padded rows do not enter the metrics, so eval still
    covers exactly the real examples.
    """
    import numpy as np
    hooks = hooks or []
    metrics = MetricAccumulator()
    metric_state = metrics.state
    batch_idx = 0
    for batch_idx, (data, target) in enumerate(loader):
        if stop is not None and stop():
            logger.warning('Stop requested: ending eval at epoch %d '
                           'after %d batches.', epoch, batch_idx)
            break
        if pad_rows_to and data.shape[0] % pad_rows_to:
            extra = pad_rows_to - data.shape[0] % pad_rows_to
            data = np.concatenate(
                [data, np.zeros((extra,) + data.shape[1:], data.dtype)])
            target = np.concatenate(
                [np.asarray(target, np.int64),
                 np.full((extra,), -1, np.int64)])
        data = assemble(data)
        target = assemble(target)
        metric_state, _ = eval_step(state, data, target, metric_state)
    metrics.state = metric_state
    computed = metrics.compute()
    for hook in hooks:
        # Post-loop hooks receive the epoch's computed test metrics
        # (reference visualization.py:64-77 logs them once per epoch).
        kw = ({'metrics': {'test': metrics}}
              if _accepts_metrics(hook) else {})
        hook(epoch=epoch, global_step=batch_idx + 1, **kw)
    logger.info('Test set evaluation metrics: %s', computed)
    return computed
