"""YAML config schema + CLI parsing (reference quant/common/parser.py).

The YAML schema is reference-compatible (parser.py:6-141): sections
seed / environment / data / model / optimization / log, with
model.arch_config holding the per-layer quantization schemes and
model.kd_config the distillation setup. Extensions for the TPU build:

  environment:
      nchips: 0          # devices to use, 0 = all visible (supersedes the
                         # reference's `ngpus`, which is still accepted)
      tensor_parallel: 1 # size of the 'model' mesh axis
      multihost: false   # call jax.distributed.initialize() first
  model:
      arch_config:
          solver_mode: exact | reference   # opt_v1 candidate policy

CLI args mirror the reference (parser.py:227-261): --config,
--experiment-name, --ngpus/--nchips, --skip-training,
--restore-experiment, --init-from-checkpoint; plus --auto-resume
(resume the named experiment when it already has checkpoints — the same
command line works before and after a preemption; pairs with
train/preemption.py's SIGTERM interrupt checkpoints).
"""

import argparse
import datetime
import logging
from pathlib import Path

import yaml

logger = logging.getLogger(__name__)


def get_base_argument_parser(description: str = '') -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=description)
    parser.add_argument('--config', type=str,
                        help='Path to YAML experiment config')
    parser.add_argument('--experiment-name', type=str,
                        help='Name of the experiment directory')
    parser.add_argument('--nchips', '--ngpus', dest='nchips', type=int,
                        default=None,
                        help='Number of devices to use (0 = all visible)')
    parser.add_argument('--skip-training', action='store_true',
                        help='Evaluate only')
    parser.add_argument('--restore-experiment', type=str, default=None,
                        help='Path to an experiment dir to fully resume')
    parser.add_argument('--init-from-checkpoint', type=str, default=None,
                        help='Checkpoint to warm-start weights from')
    parser.add_argument('--auto-resume', action='store_true',
                        help='Resume the named experiment if it already '
                             'has checkpoints, else start fresh — the '
                             'same command line works before and after '
                             'a preemption')
    return parser


def parse_common_fields(args: argparse.Namespace) -> None:
    """Validate CLI combinations (reference parser.py:151-162)."""
    if args.config is None and args.restore_experiment is None:
        raise ValueError('--config is required unless restoring '
                         'an experiment.')
    if args.restore_experiment and args.init_from_checkpoint:
        raise ValueError('--restore-experiment and --init-from-checkpoint '
                         'are mutually exclusive.')
    if getattr(args, 'auto_resume', False):
        if args.restore_experiment or args.init_from_checkpoint:
            raise ValueError('--auto-resume is mutually exclusive with '
                             '--restore-experiment / '
                             '--init-from-checkpoint.')
        if not args.config or not args.experiment_name:
            raise ValueError('--auto-resume needs --config and '
                             '--experiment-name (the stable identity the '
                             'relaunched command resumes).')


def _default_experiment_name(config_path: str) -> str:
    stamp = datetime.datetime.now().strftime('%Y%m%d-%H%M%S')
    return f'{stamp}-{Path(config_path).stem}'


def parse_config(args: argparse.Namespace) -> dict:
    """Merge YAML config with CLI overrides (reference parser.py:196-224).

    Restoring an experiment reloads the config.yaml the experiment wrote.
    """
    parse_common_fields(args)

    if getattr(args, 'auto_resume', False):
        # Resume iff the named experiment already has a checkpoint; the
        # restore path then reloads ITS config.yaml (edits to the
        # original YAML are ignored on resume, same as an explicit
        # --restore-experiment).
        with open(args.config) as f:
            raw = yaml.safe_load(f)
        root = Path(raw.get('log', {}).get('root_experiments_dir',
                                           'experiments/'))
        exp_dir = root / args.experiment_name
        # Finalized checkpoints only: an interrupted orbax save leaves
        # tmp dirs that must not trigger (an unrestorable) resume.
        from quant_tpu.utils.checkpoints import has_finalized_checkpoint
        if has_finalized_checkpoint(exp_dir):
            args.restore_experiment = str(exp_dir)

    if args.restore_experiment is not None:
        config_path = Path(args.restore_experiment) / 'config.yaml'
    else:
        config_path = Path(args.config)

    with open(config_path) as f:
        config = yaml.safe_load(f)

    if args.experiment_name:
        config['experiment_name'] = args.experiment_name
    elif args.restore_experiment is not None:
        config.setdefault('experiment_name',
                          Path(args.restore_experiment).name)
    else:
        config.setdefault('experiment_name',
                          _default_experiment_name(str(config_path)))

    env = config.setdefault('environment', {})
    if args.nchips is not None:
        env['nchips'] = args.nchips
    elif 'nchips' not in env and 'ngpus' in env:
        env['nchips'] = env['ngpus']

    if args.skip_training:
        config['skip_training'] = True
    if args.init_from_checkpoint:
        config['init_from_checkpoint'] = args.init_from_checkpoint
    if args.restore_experiment:
        config['restore_experiment'] = args.restore_experiment
    return config
