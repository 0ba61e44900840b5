"""Config/CLI parsing tests (oracle: reference tests/common/test_parser.py)."""

import pytest
import yaml

from quant_tpu.config import (
    get_base_argument_parser, parse_common_fields, parse_config,
)

MINI = {
    'environment': {'ngpus': 1},
    'data': {'dataset': 'synthetic'},
    'model': {'architecture': 'lenet5', 'loss': 'nll_loss',
              'arch_config': {}},
    'optimization': {'epochs': 1,
                     'optimizer': {'algorithm': 'sgd', 'lr': 0.1}},
    'log': {'level': 'INFO', 'interval': 10, 'save_model_freq': 1,
            'root_experiments_dir': 'experiments/'},
}


def _write(tmp_path, cfg):
    p = tmp_path / 'config.yaml'
    p.write_text(yaml.safe_dump(cfg))
    return p


def test_config_required_unless_restoring():
    parser = get_base_argument_parser()
    args = parser.parse_args([])
    with pytest.raises(ValueError):
        parse_common_fields(args)


def test_restore_and_init_mutually_exclusive(tmp_path):
    parser = get_base_argument_parser()
    args = parser.parse_args(['--restore-experiment', 'x',
                              '--init-from-checkpoint', 'y'])
    with pytest.raises(ValueError):
        parse_common_fields(args)


def test_cli_overrides_and_defaults(tmp_path):
    p = _write(tmp_path, MINI)
    parser = get_base_argument_parser()
    args = parser.parse_args(['--config', str(p),
                              '--experiment-name', 'exp1',
                              '--nchips', '4', '--skip-training'])
    config = parse_config(args)
    assert config['experiment_name'] == 'exp1'
    assert config['environment']['nchips'] == 4
    assert config['skip_training'] is True


def test_default_experiment_name_uses_config_stem(tmp_path):
    p = _write(tmp_path, MINI)
    parser = get_base_argument_parser()
    config = parse_config(parser.parse_args(['--config', str(p)]))
    assert config['experiment_name'].endswith('-config')


def test_ngpus_key_maps_to_nchips(tmp_path):
    p = _write(tmp_path, MINI)
    parser = get_base_argument_parser()
    config = parse_config(parser.parse_args(['--config', str(p)]))
    assert config['environment']['nchips'] == 1


def test_restore_reloads_experiment_config(tmp_path):
    exp = tmp_path / 'myexp'
    exp.mkdir()
    (exp / 'config.yaml').write_text(yaml.safe_dump(MINI))
    parser = get_base_argument_parser()
    config = parse_config(parser.parse_args(
        ['--restore-experiment', str(exp)]))
    assert config['restore_experiment'] == str(exp)
    assert config['experiment_name'] == 'myexp'
