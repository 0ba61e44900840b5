"""End-to-end task tests: the reference's incremental chain
(tests/common/test_tasks.py:16-110) — train teacher -> init-from-checkpoint
-> skip-training eval -> restore-resume -> KD student — on tiny synthetic
data."""

import copy

import numpy as np
import pytest

from quant_tpu.experiment import Experiment
from quant_tpu.train.task import classification_task


def _config(tmp_path, name, **overrides):
    cfg = {
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
            'epochs': 1,
            'optimizer': {'algorithm': 'adadelta', 'lr': 1.0},
            'lr_scheduler': {'scheduler': 'step_lr', 'step_size': 1,
                             'gamma': 0.7},
        },
        'log': {'level': 'WARNING', 'interval': 10, 'save_model_freq': 1,
                'tensorboard': False,
                'root_experiments_dir': str(tmp_path / 'experiments')},
        'experiment_name': name,
    }
    for k, v in overrides.items():
        cfg[k] = v
    return cfg


@pytest.fixture(scope='module')
def exp_root(tmp_path_factory):
    return tmp_path_factory.mktemp('e2e')


def test_full_chain(exp_root):
    # 1. Train a 1-epoch "teacher".
    cfg = _config(exp_root, 'teacher')
    train_m, test_m = Experiment(classification_task, cfg).run()
    assert len(train_m) == 1 and len(test_m) == 1
    assert np.isfinite(train_m[0]['Loss'])

    exp_dir = exp_root / 'experiments' / 'teacher'
    assert (exp_dir / 'config.yaml').exists()
    assert (exp_dir / 'metrics' / 'train.csv').exists()
    ckpt = exp_dir / 'checkpoints' / 'checkpoint_1'
    assert ckpt.exists()

    # 2. Warm start from the teacher checkpoint.
    cfg2 = _config(exp_root, 'warmstart')
    cfg2['init_from_checkpoint'] = str(ckpt)
    train_m2, _ = Experiment(classification_task, cfg2).run()
    assert np.isfinite(train_m2[0]['Loss'])

    # 3. skip-training evaluation of the restored experiment.
    cfg3 = _config(exp_root, 'teacher')
    cfg3['skip_training'] = True
    cfg3['restore_experiment'] = str(exp_dir)
    train_m3, test_m3 = Experiment(classification_task, cfg3).run()
    assert train_m3 == []
    # Deterministic eval on cached quantizer scales matches run 1's eval.
    np.testing.assert_allclose(test_m3[0]['Top-1 Accuracy'],
                               test_m[0]['Top-1 Accuracy'], atol=1e-6)

    # 4. Full resume: trains one MORE epoch starting at epoch 2.
    cfg4 = _config(exp_root, 'teacher')
    cfg4['restore_experiment'] = str(exp_dir)
    train_m4, _ = Experiment(classification_task, cfg4).run()
    assert len(train_m4) == 1
    assert (exp_dir / 'checkpoints' / 'checkpoint_2').exists()

    # 5. KD student distilling from the teacher.
    cfg5 = _config(exp_root, 'student')
    cfg5['model'] = copy.deepcopy(cfg5['model'])
    cfg5['model']['kd_config'] = {
        'teacher_config_path': str(exp_dir / 'config.yaml'),
        'teacher_checkpoint_path': str(ckpt),
        'freeze_teacher': True,
        'train_mode': True,
        'criterion_config': {'temperature': 5.0,
                             'teacher_correction': True},
    }
    train_m5, test_m5 = Experiment(classification_task, cfg5).run()
    assert np.isfinite(train_m5[0]['Loss'])
    assert np.isfinite(test_m5[0]['Loss'])

    # 6. Same KD student with a bf16 teacher forward
    # (kd_config.teacher_dtype): must train to a finite loss in the
    # same ballpark as the f32-teacher run.
    cfg6 = copy.deepcopy(cfg5)
    cfg6['experiment_name'] = 'student_bf16_teacher'
    cfg6['model']['kd_config']['teacher_dtype'] = 'bfloat16'
    train_m6, test_m6 = Experiment(classification_task, cfg6).run()
    assert np.isfinite(train_m6[0]['Loss'])
    assert abs(train_m6[0]['Loss'] - train_m5[0]['Loss']) < 0.5 * max(
        1.0, abs(train_m5[0]['Loss']))
