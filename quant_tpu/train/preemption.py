"""Preemption-aware training shutdown.

TPU pods are routinely preempted; the reference's only recovery is a
manual `--restore-experiment` pointing at the last periodic checkpoint
(reference tasks.py:144-167, checkpoints.py:107-136), losing up to
`save_model_freq` epochs of work. quant_tpu narrows that window: a
`PreemptionGuard` turns SIGTERM (the preemption notice) into a
cooperative stop flag; the train loop polls it at batch boundaries and
`classification_task` writes an interrupt checkpoint before exiting, so
the standard restore path resumes with at most one partial epoch re-run.

The interrupt checkpoint's PAYLOAD carries `epoch = interrupted - 1`
(restore re-runs the interrupted epoch — its params are partially
advanced, which QAT tolerates) while the DIRECTORY tag uses the
interrupted epoch number, so repeated preemptions in the same epoch
overwrite one slot (saves use force=True) and `get_path_to_checkpoint`'s
max-epoch pick still finds it.
"""

import logging
import signal
import threading
from types import FrameType
from typing import Iterable, Optional

logger = logging.getLogger(__name__)


class PreemptionGuard:
    """Cooperative shutdown flag driven by termination signals.

    Usable as a zero-argument callable (the `stop` hook of
    `train_epoch`). Installs handlers on construction; `restore()`
    reinstates the previous handlers. Off the main thread (where CPython
    forbids signal.signal) the guard degrades to an inert flag — tests
    and embedded uses can still `trigger()` it manually.
    """

    def __init__(self, signals: Iterable[int] = (signal.SIGTERM,)):
        self._event = threading.Event()
        self._previous: dict[int, object] = {}
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
        return self._event.is_set()

    def __call__(self) -> bool:
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
