"""PodComputePlatform: a 2-process simulated pod on the CPU backend.

Complements tests/parallel/test_multihost_2proc.py (which pins loss
equality of the sharded path); here the USER-FACING platform launches
the workers, process 0 writes the artifacts, and the run returns
metrics. Marked slow-ish: two fresh interpreters + distributed init.
"""

import numpy as np

from quant_tpu.experiment import Experiment
from quant_tpu.platform import PodComputePlatform
from quant_tpu.train.task import classification_task


def test_pod_platform_two_processes(tmp_path):
    cfg = {
        'seed': 0,
        'experiment_name': 'podrun',
        'environment': {'platform': 'pod', 'nchips': 0},
        'data': {'dataset': 'synthetic', 'train_batch_size': 16,
                 'test_batch_size': 16, 'train_size': 64, 'test_size': 32,
                 'image_shape': [28, 28, 1], 'seed': 3},
        'model': {'architecture': 'lenet5', 'loss': 'nll_loss',
                  'arch_config': {'conv1_filters': 4, 'conv2_filters': 4,
                                  'x_quant': 'ls-1', 'w_quant': 'ls-1',
                                  'clamp': {'kind': 'identity'},
                                  'output_classes': 10}},
        'optimization': {'epochs': 1,
                         'optimizer': {'algorithm': 'sgd', 'lr': 0.1},
                         'lr_scheduler': {'scheduler': 'step_lr',
                                          'step_size': 1, 'gamma': 1.0}},
        'log': {'level': 'WARNING', 'interval': 100,
                'save_model_freq': 1, 'tensorboard': False,
                'root_experiments_dir': str(tmp_path / 'experiments')},
    }
    platform = PodComputePlatform(
        n_processes=2, port=12411,
        env={'JAX_PLATFORMS': 'cpu', 'PALLAS_AXON_POOL_IPS': '',
             'XLA_FLAGS': '--xla_force_host_platform_device_count=2'})
    exp = Experiment(classification_task, cfg)
    train_m, test_m = platform.run(exp)

    assert len(train_m) == 1 and len(test_m) == 1
    assert np.isfinite(train_m[0]['Loss'])
    exp_dir = tmp_path / 'experiments' / 'podrun'
    assert (exp_dir / 'config.yaml').exists()
    assert (exp_dir / 'metrics' / 'train.csv').exists()
    # Process-0-only checkpoint write happened exactly once.
    assert (exp_dir / 'checkpoints' / 'checkpoint_1').exists()
