"""Real-data evidence for post-training EMA calibration.

Takes a digits experiment trained with the STOCK recipes'
moving_average_mode='off' (per-batch eval scales — cannot serve
threshold-folded, multi-bit eval re-solves scales per batch), runs
`nn/export.calibrate_ema_scales` on training batches, and compares
test accuracy across serving forms:

  dense_off      — as trained: dense eval, per-batch scales.
  packed_off     — packed eval, per-batch scales (no calibration).
  packed_ema     — packed eval on the CALIBRATED EMA scales.
  folded_ema     — threshold-folded packed serving (the production
                   artifact) on the calibrated scales.

Usage: python tools/digits/run_calibration_demo.py [experiment_dir]
(defaults to the KD study's ls-2-activation student, seed 0; trains
one if absent). Appends a section to tools/digits/results/SUMMARY.md.
"""

import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parents[2]
sys.path.insert(0, str(REPO))

import numpy as np
import yaml

RESULTS = REPO / 'tools' / 'digits' / 'results'
DATA = pathlib.Path('/tmp/digits_mnist')
DEFAULT_EXP = pathlib.Path(
    '/tmp/digits_kd_runs/kd_mnist_ls1_weight_ls2_activation_s0')


def main() -> None:
    import jax.numpy as jnp

    from quant_tpu.data.loaders import MNISTDataLoader
    from quant_tpu.nn.export import (
        calibrate_ema_scales, export_packed_variables,
        fold_xnor_thresholds,
    )
    from quant_tpu.train.task import build_model
    from quant_tpu.utils.checkpoints import (
        get_path_to_checkpoint, restore_checkpoint,
    )

    exp = pathlib.Path(sys.argv[1]) if len(sys.argv) > 1 else DEFAULT_EXP
    if not exp.exists():
        raise SystemExit(f'{exp} missing — run the KD study first or '
                         'pass an experiment dir.')
    cfg = yaml.safe_load((exp / 'config.yaml').read_text())
    model = build_model(cfg['model']['architecture'],
                        cfg['model'].get('arch_config', {}))
    assert getattr(model, 'moving_average_mode', 'off') == 'off', \
        'demo targets off-mode checkpoints'
    payload = restore_checkpoint(get_path_to_checkpoint(exp))
    variables = {'params': payload['params'],
                 'batch_stats': payload.get('batch_stats', {}),
                 'quant_state': payload.get('quant_state', {})}

    dl = MNISTDataLoader(dataset_path=str(DATA) + '/',
                         train_batch_size=64, test_batch_size=360)
    test_x, test_y = next(iter(dl.get_test_loader()))
    test_x = jnp.asarray(test_x)

    def top1(model_, vars_):
        logits = np.asarray(model_.apply(vars_, test_x, False))
        return float((logits.argmax(-1) == np.asarray(test_y)).mean())

    rows = {}
    rows['dense_off'] = top1(model, variables)
    packed_off = model.clone(inference_mode='packed')
    pv_off = export_packed_variables(packed_off, variables, test_x[:1])
    rows['packed_off'] = top1(packed_off, pv_off)

    calib_batches = [jnp.asarray(xb) for xb, _ in
                     list(dl.get_train_loader())[:10]]
    calibrated = calibrate_ema_scales(model, variables, calib_batches)
    ema_model = model.clone(moving_average_mode='eval_only')
    packed = ema_model.clone(inference_mode='packed')
    pv = export_packed_variables(packed, calibrated, test_x[:1])
    rows['packed_ema'] = top1(packed, pv)
    fv = fold_xnor_thresholds(packed, pv)
    rows['folded_ema'] = top1(packed.clone(bn_fold=True), fv)

    lines = [
        '',
        '## Post-training EMA calibration on real digits '
        '(run_calibration_demo.py)',
        '',
        f'Checkpoint: {exp.name} (trained with '
        "moving_average_mode='off'); calibration = 10 train batches "
        'through nn/export.calibrate_ema_scales.',
        '',
        '| serving form | top-1 |',
        '|---|---|',
    ]
    for k, v in rows.items():
        lines.append(f'| {k} | {v * 100:.2f}% |')
    lines.append('')
    with open(RESULTS / 'SUMMARY.md', 'a') as f:
        f.write('\n'.join(lines) + '\n')
    print('\n'.join(lines))


if __name__ == '__main__':
    main()
