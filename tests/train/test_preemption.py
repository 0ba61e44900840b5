"""Preemption-safe checkpointing tests (train/preemption.py).

The reference has no failure handling beyond manual restore (reference
tasks.py:144-167); quant_tpu converts SIGTERM into a cooperative stop +
interrupt checkpoint. Tests cover the guard, the engine's stop hook, and
the full task path: interrupt mid-run -> checkpoint on disk -> restore
resumes at the interrupted epoch.
"""

import os
import signal

import numpy as np

from quant_tpu.experiment import Experiment
from quant_tpu.train.preemption import PreemptionGuard
from quant_tpu.train.task import classification_task
from quant_tpu.utils.checkpoints import restore_checkpoint


def _config(tmp_path, name, epochs=3):
    return {
        'seed': 7,
        'environment': {'nchips': 1},
        'data': {'dataset': 'synthetic', 'train_batch_size': 16,
                 'test_batch_size': 32, 'train_size': 64, 'test_size': 32},
        'model': {
            'architecture': 'lenet5',
            'loss': 'nll_loss',
            'arch_config': {'conv1_filters': 2, 'conv2_filters': 3,
                            'x_quant': 'ls-1', 'w_quant': 'ls-1'},
        },
        'optimization': {
            'epochs': epochs,
            'optimizer': {'algorithm': 'adadelta', 'lr': 1.0},
            'lr_scheduler': {'scheduler': 'step_lr', 'step_size': 1,
                             'gamma': 0.7},
        },
        'log': {'level': 'WARNING', 'interval': 10,
                'save_model_freq': 10, 'tensorboard': False,
                'root_experiments_dir': str(tmp_path / 'experiments')},
        'experiment_name': name,
    }


def test_guard_flag_and_restore():
    before = signal.getsignal(signal.SIGTERM)
    with PreemptionGuard() as guard:
        assert not guard.requested and not guard()
        assert signal.getsignal(signal.SIGTERM) is not before
        guard.trigger()
        assert guard.requested and guard()
    assert signal.getsignal(signal.SIGTERM) is before


def test_guard_catches_sigterm():
    with PreemptionGuard() as guard:
        os.kill(os.getpid(), signal.SIGTERM)
        # CPython delivers the signal at the next bytecode boundary.
        for _ in range(1000):
            if guard.requested:
                break
        assert guard.requested
    # Handler restored: flag object now inert but process alive.


def test_sigterm_interrupts_and_checkpoints(tmp_path):
    # Fire SIGTERM from a train hook during epoch 2 of 3. The loop must
    # stop, write checkpoint_2 whose payload says epoch 1 (re-run epoch
    # 2 on resume), and report only epoch 1 metrics.
    fired = []

    def bomb_hook(epoch, global_step, values_dict, log_interval, **_):
        if epoch == 2 and not fired:
            fired.append(global_step)
            os.kill(os.getpid(), signal.SIGTERM)

    cfg = _config(tmp_path, 'preempted')
    train_m, test_m = Experiment(
        classification_task, cfg,
        get_hooks=lambda c, d: ([bomb_hook], []),
    ).run()
    assert fired, 'hook never fired'
    assert len(train_m) == 1 and len(test_m) == 1  # epoch 1 only

    exp_dir = tmp_path / 'experiments' / 'preempted'
    ckpt = exp_dir / 'checkpoints' / 'checkpoint_2'
    assert ckpt.exists()
    payload = restore_checkpoint(ckpt)
    assert int(np.asarray(payload['epoch'])) == 1

    # SIGTERM handler back to default after the task.
    assert signal.getsignal(signal.SIGTERM) in (
        signal.SIG_DFL, signal.default_int_handler)

    # Resume: trains `epochs` more epochs from the interrupt state,
    # starting at the interrupted epoch (payload epoch + 1 = 2).
    cfg2 = dict(cfg)
    cfg2['restore_experiment'] = str(exp_dir)
    cfg2['optimization'] = dict(cfg['optimization'], epochs=1)
    train2, test2 = Experiment(classification_task, cfg2).run()
    assert len(train2) == 1
    assert (exp_dir / 'checkpoints' / 'checkpoint_2').exists()
