"""Profiling utilities: trace context robustness + StepTimer cadence."""

import logging

from quant_tpu.utils.profiling import StepTimer, trace


def test_trace_context_is_robust(tmp_path):
    # On the CPU test platform the profiler may or may not start; either
    # way the context must not raise and must stop cleanly.
    with trace(tmp_path / 'prof'):
        x = sum(range(10))
    assert x == 45


def test_step_timer_logs_on_cadence(caplog):
    synced = []
    t = StepTimer(batch_size=32, log_every=2,
                  sync_fn=lambda: synced.append(1))
    with caplog.at_level(logging.INFO,
                         logger='quant_tpu.utils.profiling'):
        t(epoch=0, global_step=0)   # arms the timer
        t(epoch=0, global_step=1)   # below cadence
        assert not caplog.records
        t(epoch=0, global_step=2)   # hits cadence
    assert len(caplog.records) == 1
    msg = caplog.records[0].getMessage()
    assert 'steps/s' in msg and 'images/s' in msg
    assert synced == [1]


def test_step_timer_without_batch_size(caplog):
    t = StepTimer(log_every=1)
    with caplog.at_level(logging.INFO,
                         logger='quant_tpu.utils.profiling'):
        t(epoch=0, global_step=0)
        t(epoch=0, global_step=1)
    assert len(caplog.records) == 1
    assert 'images/s' not in caplog.records[0].getMessage()
