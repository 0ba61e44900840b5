"""Device meshes and sharding rules (DP/TP over ICI).

The TPU-native replacement for the reference's single-process
nn.DataParallel (quant/common/initialization.py:125-127): a named
`jax.sharding.Mesh` with axes ('data', 'model'); batch-axis sharding gives
data parallelism (GSPMD inserts the gradient psum over ICI), out-channel
sharding of conv kernels and their per-channel scale vectors gives tensor
parallelism.
"""

from quant_tpu.parallel.mesh import make_mesh
from quant_tpu.parallel.sharding import (
    batch_sharding, replicated, shard_model_variables,
)
from quant_tpu.parallel.pipeline import (
    pipeline_apply, stack_stage_params, stage_sharding,
)
from quant_tpu.parallel.spatial import (
    halo_exchange_conv2d, halo_exchange_max_pool2d, spatial_sharding,
)

__all__ = ['make_mesh', 'batch_sharding', 'replicated',
           'shard_model_variables', 'halo_exchange_conv2d',
           'halo_exchange_max_pool2d', 'spatial_sharding',
           'pipeline_apply', 'stack_stage_params', 'stage_sharding']
