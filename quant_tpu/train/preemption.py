"""Preemption-aware training shutdown.

TPU pods are routinely preempted; the reference's only recovery is a
manual `--restore-experiment` pointing at the last periodic checkpoint
(reference tasks.py:144-167, checkpoints.py:107-136), losing up to
`save_model_freq` epochs of work. quant_tpu narrows that window: a
`PreemptionGuard` turns the preemption notice into a cooperative stop
flag; the train loop polls it at batch boundaries and
`classification_task` writes an interrupt checkpoint before exiting, so
the standard restore path resumes with at most one partial epoch re-run.

Two regimes:

* **Multi-process** (`jax.distributed` active): jax's own C++
  preemption notifier owns SIGTERM (it supersedes any Python handler —
  do not install one), and `reached_preemption_sync_point(step)` is the
  cluster-wide consensus: after any host is notified, it returns True
  on EVERY host at the SAME call index, so all hosts leave the batch
  loop together and the collective interrupt save cannot deadlock. The
  guard keeps the required monotonically-increasing step ids internally;
  every process must poll at the same loop points. If the preemption
  service is disabled, the guard falls back to a Python handler whose
  flag is agreed via `parallel.multihost.collective_any`.
* **Single process**: a plain Python SIGTERM handler.

The interrupt checkpoint's PAYLOAD carries `epoch = interrupted - 1`
(restore re-runs the interrupted epoch — its params are partially
advanced, which QAT tolerates) while the DIRECTORY tag uses the
interrupted epoch number, so repeated preemptions in the same epoch
overwrite one slot (saves use force=True) and `get_path_to_checkpoint`'s
max-epoch pick still finds it.
"""

import itertools
import logging
import signal
import threading
from types import FrameType
from typing import Iterable, Optional

import jax

logger = logging.getLogger(__name__)


class PreemptionGuard:
    """Cooperative shutdown flag driven by preemption notices.

    Usable as a zero-argument callable (the `stop` hook of
    `train_epoch`); the first True latches. In multi-process runs every
    process must call it at the same loop points — the return value is
    a cluster consensus. `restore()` reinstates previous signal
    handlers (no-op when jax's notifier owns the signal). Off the main
    thread (where CPython forbids signal.signal) the guard degrades to
    an inert flag — tests and embedding hosts can still `trigger()` it.
    """

    def __init__(self, signals: Iterable[int] = (signal.SIGTERM,)):
        self._event = threading.Event()
        self._previous: dict[int, object] = {}
        self._steps = itertools.count()
        self._latched = False  # consensus outcome (distributed modes)
        self._sync = None
        if jax.process_count() > 1:
            from jax._src import distributed
            if distributed.global_state.preemption_sync_manager is not None:
                from jax.experimental import multihost_utils
                self._sync = multihost_utils.reached_preemption_sync_point
                logger.info('PreemptionGuard: using the jax.distributed '
                            'preemption sync service')
        if self._sync is None:
            for sig in signals:
                try:
                    self._previous[sig] = signal.signal(sig, self._handle)
                except ValueError:  # not the main thread
                    logger.info('PreemptionGuard inert: not on main thread')
                    break

    def _handle(self, signum: int, frame: Optional[FrameType]) -> None:
        logger.warning('Received signal %d: finishing current batch, '
                       'then checkpointing and stopping.', signum)
        self._event.set()

    def trigger(self) -> None:
        """Set the flag programmatically (tests, embedding hosts)."""
        self._event.set()

    @property
    def requested(self) -> bool:
        """Latched stop decision — consensus-safe to branch on AFTER the
        loop (in distributed runs it only turns true via a synchronized
        `__call__`, at the same call index on every host)."""
        if self._sync is not None or jax.process_count() > 1:
            return self._latched
        return self._event.is_set()

    def __call__(self) -> bool:
        if self._sync is not None:
            # Once latched, EVERY host latched at the same call index,
            # so skipping further sync calls stays aligned.
            if not self._latched and self._sync(next(self._steps)):
                self._latched = True
            return self._latched
        if jax.process_count() > 1:
            # Signal-handler fallback in a distributed run: one host's
            # local flag must not diverge control flow — every host
            # calls the consensus until it latches (a host whose local
            # flag is set must NOT skip the collective its peers join).
            from quant_tpu.parallel.multihost import collective_any
            if not self._latched and collective_any(self._event.is_set()):
                self._latched = True
            return self._latched
        return self._event.is_set()

    def restore(self) -> None:
        """Reinstate the signal handlers that were active before."""
        for sig, prev in self._previous.items():
            signal.signal(sig, prev)
        self._previous.clear()

    def __enter__(self) -> 'PreemptionGuard':
        return self

    def __exit__(self, *exc: object) -> None:
        self.restore()
