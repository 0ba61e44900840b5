"""Checkpoint utility tests (oracle: reference tests around
checkpoints.py:107-136 max-epoch selection + save/restore roundtrip)."""

import jax.numpy as jnp
import numpy as np
import pytest

from quant_tpu.utils.checkpoints import (
    get_path_to_checkpoint, restore_checkpoint, save_checkpoint,
)


def test_save_restore_roundtrip(tmp_path):
    payload = {
        'params': {'w': jnp.arange(6.0).reshape(2, 3)},
        'quant_state': {'vs': jnp.ones((1, 4))},
        'epoch': jnp.asarray(3),
    }
    save_checkpoint(tmp_path / 'checkpoints', payload, epoch=3)
    restored = restore_checkpoint(tmp_path / 'checkpoints' / 'checkpoint_3')
    np.testing.assert_array_equal(np.asarray(restored['params']['w']),
                                  np.arange(6.0).reshape(2, 3))
    np.testing.assert_array_equal(np.asarray(restored['quant_state']['vs']),
                                  np.ones((1, 4)))
    assert int(restored['epoch']) == 3


def test_get_path_picks_max_epoch(tmp_path):
    ckpts = tmp_path / 'checkpoints'
    for e in (1, 2, 10):
        save_checkpoint(ckpts, {'epoch': jnp.asarray(e)}, epoch=e)
    # Lexicographic order would pick 2; numeric parse must pick 10.
    assert get_path_to_checkpoint(tmp_path).name == 'checkpoint_10'
    assert get_path_to_checkpoint(tmp_path, epoch=2).name == 'checkpoint_2'


def test_get_path_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        get_path_to_checkpoint(tmp_path)
    save_checkpoint(tmp_path / 'checkpoints', {'epoch': jnp.asarray(1)}, 1)
    with pytest.raises(FileNotFoundError):
        get_path_to_checkpoint(tmp_path, epoch=9)
