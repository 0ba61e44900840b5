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


# ---- --auto-resume: same command line before and after a preemption ----

def _auto_args(cfg_path, name='run'):
    parser = get_base_argument_parser()
    return parser.parse_args(['--config', str(cfg_path),
                              '--experiment-name', name, '--auto-resume'])


def test_auto_resume_fresh_run_starts_clean(tmp_path):
    cfg = dict(MINI)
    cfg['log'] = dict(MINI['log'],
                      root_experiments_dir=str(tmp_path / 'exps'))
    config = parse_config(_auto_args(_write(tmp_path, cfg)))
    assert 'restore_experiment' not in config
    assert config['experiment_name'] == 'run'


def test_auto_resume_picks_up_existing_checkpoints(tmp_path):
    cfg = dict(MINI)
    cfg['log'] = dict(MINI['log'],
                      root_experiments_dir=str(tmp_path / 'exps'))
    cfg_path = _write(tmp_path, cfg)
    exp_dir = tmp_path / 'exps' / 'run'
    (exp_dir / 'checkpoints' / 'checkpoint_3').mkdir(parents=True)
    # Restore reloads the experiment's own config snapshot.
    (exp_dir / 'config.yaml').write_text(yaml.safe_dump(cfg))
    config = parse_config(_auto_args(cfg_path))
    assert config['restore_experiment'] == str(exp_dir)
    assert config['experiment_name'] == 'run'


def test_auto_resume_needs_name_and_excludes_restore(tmp_path):
    parser = get_base_argument_parser()
    cfg_path = _write(tmp_path, MINI)
    with pytest.raises(ValueError, match='experiment-name'):
        parse_common_fields(parser.parse_args(
            ['--config', str(cfg_path), '--auto-resume']))
    with pytest.raises(ValueError, match='mutually exclusive'):
        parse_common_fields(parser.parse_args(
            ['--config', str(cfg_path), '--experiment-name', 'r',
             '--auto-resume', '--restore-experiment', 'x']))


def test_auto_resume_ignores_orbax_tmp_dirs(tmp_path):
    # A save interrupted mid-write leaves only a tmp dir; auto-resume
    # must start fresh, not point restore at an unrestorable experiment.
    cfg = dict(MINI)
    cfg['log'] = dict(MINI['log'],
                      root_experiments_dir=str(tmp_path / 'exps'))
    cfg_path = _write(tmp_path, cfg)
    exp_dir = tmp_path / 'exps' / 'run'
    (exp_dir / 'checkpoints'
     / 'checkpoint_2.orbax-checkpoint-tmp-123').mkdir(parents=True)
    config = parse_config(_auto_args(cfg_path))
    assert 'restore_experiment' not in config
