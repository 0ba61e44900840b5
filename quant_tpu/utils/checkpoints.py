"""Checkpoint save/restore (reference quant/utils/checkpoints.py).

Saved payload: {params, batch_stats, quant_state, opt_state, epoch} — the
quantizer scale caches ride along exactly like the reference's
register_buffers do through state_dict (weight_quantization.py:25).

Three restore modes (reference tasks.py:144-167):
  * full resume       — params + BN + quant scales + optimizer state + epoch
  * weights-only init — params/BN/quant only (init_from_checkpoint)
  * teacher load      — weights-only into a teacher model

Backend: orbax StandardCheckpointer (multi-host/sharded-array capable),
with directories named checkpoint_{epoch} mirroring the reference's
checkpoint_{epoch}.pt convention (checkpoints.py:17-51, 107-136).
"""

import logging
import re
from pathlib import Path
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

logger = logging.getLogger(__name__)

_CKPT_RE = re.compile(r'checkpoint_(\d+)$')


def save_checkpoint(checkpoints_dir: Path, state_dict: dict[str, Any],
                    epoch: int) -> Path:
    """Save a checkpoint_{epoch} directory; returns its path.

    Multi-process runs: both the device fetch (gathering arrays on a
    global mesh) and orbax's save (an internal global barrier) are
    COLLECTIVES — every process must call this function; orbax then
    writes from the primary host only, so there is no shared-filesystem
    race.
    """
    checkpoints_dir = Path(checkpoints_dir).absolute()
    path = checkpoints_dir / f'checkpoint_{epoch}'
    host_state = jax.device_get(state_dict)  # collective: all processes
    checkpoints_dir.mkdir(parents=True, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, host_state, force=True)
    ckptr.wait_until_finished()
    logger.info('Saved checkpoint to %s', path)
    return path


def restore_checkpoint(path: Path,
                       abstract_target: Optional[dict] = None) -> dict:
    """Restore a checkpoint directory into (optionally) a target structure."""
    ckptr = ocp.StandardCheckpointer()
    if abstract_target is not None:
        return ckptr.restore(Path(path).absolute(), abstract_target)
    return ckptr.restore(Path(path).absolute())


def has_finalized_checkpoint(experiment_path: Path) -> bool:
    """True when the experiment has a completed checkpoint_{N}.

    Matches with the same `checkpoint_(\\d+)$` rule as
    `get_path_to_checkpoint`: orbax leaves `*.orbax-checkpoint-tmp-*`
    directories behind when a save is interrupted, and those must not
    count (an --auto-resume that saw one would crash on restore instead
    of starting fresh).
    """
    ckpt_dir = Path(experiment_path) / 'checkpoints'
    if not ckpt_dir.is_dir():
        return False
    return any(_CKPT_RE.search(p.name) for p in ckpt_dir.iterdir())


def get_path_to_checkpoint(experiment_path: Path,
                           epoch: Optional[int] = None) -> Path:
    """Pick the checkpoint with the given (or max) epoch
    (reference checkpoints.py:107-136)."""
    ckpt_dir = Path(experiment_path) / 'checkpoints'
    found = {}
    if ckpt_dir.is_dir():
        for p in ckpt_dir.iterdir():
            m = _CKPT_RE.search(p.name)
            if m:
                found[int(m.group(1))] = p
    if not found:
        raise FileNotFoundError(f'No checkpoints under {ckpt_dir}')
    if epoch is not None:
        if epoch not in found:
            raise FileNotFoundError(f'No checkpoint_{epoch} under {ckpt_dir}')
        return found[epoch]
    return found[max(found)]
