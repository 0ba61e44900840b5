"""Export a quant_tpu experiment checkpoint to a reference torch .pt.

    python tools/export_torch.py --experiment <experiments/run-dir> \
        [--checkpoint <path>] [--out model.pt]

Loads the experiment's config.yaml + latest (or given) checkpoint,
converts to a reference-keyed state dict (utils/torch_export.py) and
writes a torch.save payload keyed like the reference's own checkpoints
({'model_state_dict', 'optimizer_state_dict', 'scheduler_state_dict',
'epoch'} — quant/utils/checkpoints.py:43-51), so apple/ml-quant's
restore_from_checkpoint (checkpoints.py:84-88) loads it directly.
The optimizer/scheduler entries are empty placeholders: restore the
exported file with optimizer=None, scheduler=None (the reference's
--skip-training / teacher-load paths do exactly that).
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument('--experiment', required=True,
                        help='experiment dir (with config.yaml)')
    parser.add_argument('--checkpoint', default=None,
                        help='checkpoint path (default: latest)')
    parser.add_argument('--out', default=None,
                        help='output .pt (default: <exp>/export.pt)')
    args = parser.parse_args()

    import torch
    import yaml

    from quant_tpu.utils.checkpoints import (get_path_to_checkpoint,
                                             restore_checkpoint)
    from quant_tpu.utils.torch_export import (export_state_dict,
                                              numpy_to_state_dict)

    exp = pathlib.Path(args.experiment)
    cfg = yaml.safe_load((exp / 'config.yaml').read_text())
    ckpt = (pathlib.Path(args.checkpoint) if args.checkpoint
            else get_path_to_checkpoint(exp))
    payload = restore_checkpoint(ckpt)
    variables = {'params': payload['params'],
                 'batch_stats': payload.get('batch_stats', {}),
                 'quant_state': payload.get('quant_state', {})}
    sd = export_state_dict(cfg['model']['architecture'], variables,
                           cfg['model'].get('arch_config', {}))
    out = pathlib.Path(args.out) if args.out else exp / 'export.pt'
    torch.save({'model_state_dict': numpy_to_state_dict(sd),
                'optimizer_state_dict': {},
                'scheduler_state_dict': {},
                'epoch': int(payload.get('epoch', 0))}, out)
    print(f'wrote {out} ({len(sd)} tensors, epoch '
          f'{int(payload.get("epoch", 0))})')


if __name__ == '__main__':
    main()
