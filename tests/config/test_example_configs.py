"""Every shipped example YAML must parse and build its model.

The reference ships 19 recipe configs whose arch_configs ARE the
published hyperparameters; this pins that each committed YAML stays
loadable through the real parser and that its arch_config constructs the
model it names (catching schema drift when model fields change).
"""

import pathlib

import pytest
import yaml

from quant_tpu.train.task import build_model

REPO = pathlib.Path(__file__).resolve().parents[2]
CONFIGS = sorted((REPO / 'examples').rglob('*.yaml'))


def test_examples_present():
    # 19 reference recipes + TPU-native extras.
    assert len(CONFIGS) >= 19


@pytest.mark.parametrize('path', CONFIGS, ids=lambda p: p.stem)
def test_config_parses_and_builds_model(path):
    cfg = yaml.safe_load(path.read_text())
    for section in ('environment', 'data', 'model', 'optimization', 'log'):
        assert section in cfg, f'{path.name} missing {section}'
    model = build_model(cfg['model']['architecture'],
                        cfg['model']['arch_config'])
    assert model is not None
    # KD configs must carry the full teacher contract.
    kd = cfg['model'].get('kd_config')
    if kd:
        for key in ('teacher_config_path', 'teacher_checkpoint_path',
                    'freeze_teacher', 'train_mode', 'criterion_config'):
            assert key in kd, f'{path.name} kd_config missing {key}'
