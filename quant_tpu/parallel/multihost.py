"""Multi-host execution helpers.

The reference tops out at single-process DataParallel; its ComputePlatform
ABC was the intended (never implemented) extension point for non-local
execution (quant/common/compute_platform.py:38-58). This module is that
extension, TPU-native:

* `initialize()` — `jax.distributed.initialize` guard (idempotent, no-op
  single-host).
* `host_shard(n)` — this host's contiguous [start, stop) of a global
  dataset of n examples, for per-host input pipelines.
* `global_batch(local, mesh)` — assemble a global device array from each
  host's local batch shard (jax.make_array_from_process_local_data), so
  the jitted DP step sees one logical batch sharded over 'data'.

Tested with mocked process_index/process_count (SURVEY.md §4: the
reference has no distributed tests; multi-host logic tests here run
single-process with mocks, and the sharding math is exercised on the
virtual CPU mesh).
"""

import logging
from typing import Optional

import jax
import numpy as np

logger = logging.getLogger(__name__)

_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Initialize the multi-host runtime once; harmless on one host.

    Must run BEFORE any backend-touching jax call (jax.devices(),
    jax.process_count(), ...): querying the backend first initializes it
    locally and makes distributed initialization impossible. Hence no
    pre-checks here — just an idempotence flag and the attempt itself.
    """
    global _initialized
    if _initialized:
        return
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    try:
        jax.distributed.initialize(**kwargs)
        _initialized = True
    except Exception as e:
        # Already-initialized backends or single-host auto-detection both
        # land here; record so we do not retry every call.
        _initialized = True
        logger.warning('jax.distributed.initialize failed or not needed '
                       '(%s); continuing single-host', e)


def host_shard(num_examples: int,
               process_index: Optional[int] = None,
               process_count: Optional[int] = None) -> tuple[int, int]:
    """Contiguous [start, stop) slice of the dataset owned by this host."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    per = num_examples // pc
    start = pi * per
    stop = num_examples if pi == pc - 1 else start + per
    return start, stop


def global_batch(local: np.ndarray, mesh: jax.sharding.Mesh) -> jax.Array:
    """Build the global DP-sharded array from this host's batch shard.

    `local` is this host's rows; the result is the logical
    (process_count * local_rows, ...) array sharded over mesh axis 'data'.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    sharding = NamedSharding(mesh, P('data'))
    if jax.process_count() == 1:
        return jax.device_put(local, sharding)
    return jax.make_array_from_process_local_data(sharding, local)
