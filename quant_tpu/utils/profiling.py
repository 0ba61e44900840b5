"""Profiling and step timing.

The reference has no tracing or timing at all (SURVEY.md §5). Here:

* `trace(log_dir)` — context manager around `jax.profiler.trace`, emitting
  a TensorBoard-viewable xplane trace. Gated: some transport-tunneled TPU
  environments cannot profile; the failure degrades to a warning.
* `StepTimer` — lightweight wall-clock step timer usable as a train-loop
  hook; periodically synchronizes (device_get on a scalar) so dispatch
  queues do not hide device time, and reports steps/sec and images/sec.
"""

import contextlib
import logging
import time
from typing import Callable, Optional

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(log_dir: str) -> object:
    import jax
    try:
        jax.profiler.start_trace(str(log_dir))
        started = True
    except Exception as e:  # pragma: no cover - platform dependent
        logger.warning('jax.profiler.start_trace failed (%s); profiling '
                       'disabled for this run', e)
        started = False
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception as e:  # pragma: no cover
                logger.warning('jax.profiler.stop_trace failed: %s', e)


class StepTimer:
    """Accumulates step wall times; call as a hook(epoch, global_step, ...)."""

    def __init__(self, batch_size: Optional[int] = None,
                 log_every: int = 50,
                 sync_fn: Optional[Callable] = None) -> None:
        self.batch_size = batch_size
        self.log_every = log_every
        self.sync_fn = sync_fn  # e.g. lambda: jax.device_get(loss)
        self._t0 = None
        self._last_step = 0

    def __call__(self, epoch: int, global_step: int, **_: object) -> None:
        now = time.perf_counter()
        if self._t0 is None:
            self._t0 = now
            self._last_step = global_step
            return
        if (global_step - self._last_step) >= self.log_every:
            if self.sync_fn is not None:
                self.sync_fn()
                now = time.perf_counter()
            steps = global_step - self._last_step
            dt = now - self._t0
            sps = steps / dt
            msg = f'{sps:.2f} steps/s'
            if self.batch_size:
                msg += f' ({sps * self.batch_size:.1f} images/s)'
            logger.info('StepTimer: %s (epoch %d, step %d)',
                        msg, epoch, global_step)
            self._t0 = now
            self._last_step = global_step
