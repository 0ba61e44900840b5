"""Functional classification metrics.

The reference uses stateful Metric objects with update/compute/reset
(quant/common/metrics.py:50-218). Here a metric state is a small pytree of
device scalars updated inside the jitted step — no host synchronization
per batch — and `compute()` is a single host readback at epoch end.

Tracked quantities: mean loss (sample-weighted), top-1 and top-k accuracy,
all with the reference's accumulate-over-epoch semantics.
"""

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp


def init_metric_state() -> dict[str, jax.Array]:
    # Distinct buffers per entry: the train step donates this pytree, and
    # aliased leaves would be donated twice (XLA INVALID_ARGUMENT).
    return {name: jnp.zeros((), jnp.float32)
            for name in ('loss_sum', 'top1', 'topk', 'count')}


def update_metric_state(state: dict[str, jax.Array], loss: jax.Array,
                        output: jax.Array, target: jax.Array,
                        k: int = 5) -> dict[str, jax.Array]:
    """Pure update, usable inside jit. `loss` is the batch-mean loss."""
    n = output.shape[0]
    pred1 = jnp.argmax(output, axis=-1)
    top1 = jnp.sum(pred1 == target)
    kk = min(k, output.shape[-1])
    _, topk_idx = jax.lax.top_k(output, kk)
    topk = jnp.sum(jnp.any(topk_idx == target[:, None], axis=-1))
    return {
        'loss_sum': state['loss_sum'] + loss * n,
        'top1': state['top1'] + top1,
        'topk': state['topk'] + topk,
        'count': state['count'] + n,
    }


def update_metric_state_masked(state: dict[str, jax.Array],
                               per_sample_loss: jax.Array,
                               output: jax.Array, target: jax.Array,
                               k: int = 5) -> dict[str, jax.Array]:
    """Metric update that EXCLUDES padded rows (target < 0).

    Multi-process eval pads every host's final shard to a common shape
    (parallel/multihost.py) with sentinel target -1; the count-weighted
    accumulators ignore those rows, so pod eval equals single-host eval
    on every example (reference evaluate(), training.py:155-204, covers
    the whole test set).
    """
    valid = target >= 0
    vf = valid.astype(jnp.float32)
    safe_t = jnp.where(valid, target, 0)
    pred1 = jnp.argmax(output, axis=-1)
    top1 = jnp.sum((pred1 == safe_t) & valid)
    kk = min(k, output.shape[-1])
    _, topk_idx = jax.lax.top_k(output, kk)
    topk = jnp.sum(jnp.any(topk_idx == safe_t[:, None], axis=-1) & valid)
    return {
        'loss_sum': state['loss_sum'] + jnp.sum(per_sample_loss * vf),
        'top1': state['top1'] + top1,
        'topk': state['topk'] + topk,
        'count': state['count'] + jnp.sum(vf),
    }


@dataclass
class MetricAccumulator:
    """Host-side wrapper with the reference's metric-dict naming."""

    k: int = 5
    state: dict = field(default_factory=init_metric_state)

    def reset(self) -> None:
        self.state = init_metric_state()

    def compute(self) -> dict[str, float]:
        s = jax.device_get(self.state)
        n = max(float(s['count']), 1.0)
        return {
            'Loss': float(s['loss_sum']) / n,
            'Top-1 Accuracy': float(s['top1']) / n,
            f'Top-{self.k} Accuracy': float(s['topk']) / n,
        }
