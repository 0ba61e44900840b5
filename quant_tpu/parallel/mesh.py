"""Mesh construction helpers."""

from typing import Optional, Sequence

import jax
import numpy as np


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None
              ) -> jax.sharding.Mesh:
    """Create a ('data', 'model') mesh over the available devices.

    Args:
        data: size of the data axis; defaults to n_devices // model.
        model: size of the model (tensor-parallel) axis.
        devices: explicit device list (defaults to jax.devices()).
    """
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // model
    if data * model > len(devices):
        raise ValueError(
            f'mesh {data}x{model} needs {data * model} devices, '
            f'have {len(devices)}')
    grid = np.asarray(devices[:data * model]).reshape(data, model)
    return jax.sharding.Mesh(grid, ('data', 'model'))
