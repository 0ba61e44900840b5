"""Offline serving-artifact preparation.

`serving/worker.py`'s 'experiment' spec re-does the packed export +
BN fold in EVERY worker process at startup. This module does that work
ONCE, offline, and writes a self-contained serving artifact:

    <out_dir>/
      serving.yaml   — model section (architecture + arch_config),
                       input_shape, bn_fold flag, source checkpoint
      artifact/      — orbax checkpoint of the STRIPPED variables
                       (packed sign words + scales + thresholds;
                       fp32 kernels of packed layers dropped)

Workers then load it via the 'artifact' spec kind with zero export
work (and the shipped checkpoint is ~1 bit/weight for the quantized
convs). Optionally runs post-training EMA calibration first (for
checkpoints trained with moving_average_mode='off').

CLI:
    python -m quant_tpu.serving.prepare --experiment DIR [--out DIR]
        [--input-shape H,W,C]
        [--calibrate-dataset PATH [--calibrate-batches N]]
        [--calibrate-synthetic N]
"""

import argparse
import logging
import pathlib
from typing import Any, Optional, Sequence

logger = logging.getLogger(__name__)


def prepare_serving_artifact(
        experiment_dir: 'pathlib.Path | str',
        out_dir: Optional['pathlib.Path | str'] = None,
        input_shape: Sequence[int] = (224, 224, 3),
        calib_batches: Optional[Any] = None) -> pathlib.Path:
    """Build the stripped (+folded) serving artifact for an experiment.

    Args:
        experiment_dir: trained experiment (config.yaml + checkpoints).
        out_dir: where to write (default <experiment>/serving).
        input_shape: per-example input shape the deployment serves.
        calib_batches: optional iterable of batches for post-training
            EMA calibration (nn/export.calibrate_ema_scales) — needed
            for folded serving of 'off'-mode checkpoints.

    Returns the artifact directory (out_dir).
    """
    import jax.numpy as jnp
    import yaml

    from quant_tpu.nn.export import (
        calibrate_ema_scales, export_packed_variables, fold_for_serving,
        strip_for_deployment,
    )
    from quant_tpu.train.task import build_model
    from quant_tpu.utils.checkpoints import (
        get_path_to_checkpoint, restore_checkpoint, save_checkpoint,
    )

    experiment_dir = pathlib.Path(experiment_dir)
    out = pathlib.Path(out_dir) if out_dir else experiment_dir / 'serving'
    cfg = yaml.safe_load((experiment_dir / 'config.yaml').read_text())
    model_cfg = dict(cfg['model'])
    arch_config = dict(model_cfg.get('arch_config', {}))
    model = build_model(model_cfg['architecture'], arch_config)
    ckpt = get_path_to_checkpoint(experiment_dir)
    payload = restore_checkpoint(ckpt)
    variables = {'params': payload['params'],
                 'batch_stats': payload.get('batch_stats', {}),
                 'quant_state': payload.get('quant_state', {})}

    if calib_batches is not None:
        variables = calibrate_ema_scales(model, variables, calib_batches)
        # The calibrated scales are only read by EMA-mode serving.
        arch_config['moving_average_mode'] = 'eval_only'
        model = build_model(model_cfg['architecture'], arch_config)

    packed = model.clone(inference_mode='packed')
    sample = jnp.zeros((1,) + tuple(input_shape), jnp.float32)
    variables = export_packed_variables(packed, variables, sample)

    _, variables, bn_fold = fold_for_serving(packed, variables)

    artifact = strip_for_deployment(variables)
    out.mkdir(parents=True, exist_ok=True)
    save_checkpoint(out, artifact, epoch=0)
    meta = {
        'model': {'architecture': model_cfg['architecture'],
                  'arch_config': arch_config},
        'input_shape': list(input_shape),
        'bn_fold': bn_fold,
        'source_checkpoint': str(ckpt),
    }
    (out / 'serving.yaml').write_text(yaml.safe_dump(meta))
    logger.info('serving artifact written to %s (bn_fold=%s)', out,
                bn_fold)
    return out


def load_serving_artifact(artifact_dir: 'pathlib.Path | str'
                          ) -> tuple[Any, dict, tuple]:
    """-> (packed serve-ready model, variables, input_shape)."""
    import yaml

    from quant_tpu.train.task import build_model
    from quant_tpu.utils.checkpoints import restore_checkpoint

    artifact_dir = pathlib.Path(artifact_dir)
    meta = yaml.safe_load((artifact_dir / 'serving.yaml').read_text())
    model = build_model(meta['model']['architecture'],
                        meta['model'].get('arch_config', {}))
    serve_model = model.clone(inference_mode='packed',
                              bn_fold=bool(meta.get('bn_fold', False)))
    variables = restore_checkpoint(artifact_dir / 'checkpoint_0')
    return serve_model, variables, tuple(meta['input_shape'])


def main(argv: Optional[list] = None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument('--experiment', required=True)
    parser.add_argument('--out', default=None)
    parser.add_argument('--input-shape', default='224,224,3',
                        help='H,W,C the deployment serves')
    parser.add_argument('--calibrate-dataset', default=None,
                        help='dataset path for REAL-data EMA '
                             'calibration: the experiment config\'s own '
                             'data section is rebuilt against this path '
                             'and its train batches drive the observer '
                             'pass (preferred for off-mode checkpoints)')
    parser.add_argument('--calibrate-batches', type=int, default=10,
                        help='how many train batches to observe with '
                             '--calibrate-dataset')
    parser.add_argument('--calibrate-synthetic', type=int, default=0,
                        help='>0: run EMA calibration on N synthetic '
                             'batches (last resort when no calibration '
                             'data is at hand; prefer '
                             '--calibrate-dataset)')
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    shape = tuple(int(v) for v in args.input_shape.split(','))
    calib = None
    if args.calibrate_dataset:
        import itertools

        import yaml

        from quant_tpu.data import DATASET_REGISTRY

        cfg = yaml.safe_load(
            (pathlib.Path(args.experiment) / 'config.yaml').read_text())
        data_cfg = dict(cfg.get('data', {}))
        loader_cls = DATASET_REGISTRY[data_cfg.pop('dataset')]
        data_cfg['dataset_path'] = args.calibrate_dataset
        loader = loader_cls(**data_cfg)
        calib = [x for x, _ in itertools.islice(
            iter(loader.get_train_loader()), args.calibrate_batches)]
        loader.cleanup()
    elif args.calibrate_synthetic > 0:
        import jax

        calib = [jax.random.normal(jax.random.key(i), (16,) + shape)
                 for i in range(args.calibrate_synthetic)]
    out = prepare_serving_artifact(args.experiment, args.out,
                                   input_shape=shape,
                                   calib_batches=calib)
    print(out)


if __name__ == '__main__':
    main()
