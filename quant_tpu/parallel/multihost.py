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
        if coordinator_address is not None:
            # The pod config EXPLICITLY asked for multi-host; silently
            # degrading would train N independent replicas. Fail hard.
            raise RuntimeError(
                f'jax.distributed.initialize(coordinator_address='
                f'{coordinator_address!r}) failed: {e}') from e
        # Auto-detection on a plain single host lands here; record so we
        # do not retry every call.
        _initialized = True
        logger.warning('jax.distributed.initialize failed or not needed '
                       '(%s); continuing single-host', e)


def collective_any(flag: bool) -> bool:
    """True when ANY process raised `flag` — a consensus point.

    Per-process decisions that change control flow (e.g. the preemption
    stop in the train loop) must be agreed collectively: one process
    breaking out of the batch loop while a peer enters the next step's
    collectives is a distributed deadlock. Every process must call this
    at the same loop points. Single-process: just the local flag, no
    collective dispatched.
    """
    if jax.process_count() == 1:
        return bool(flag)
    from jax.experimental import multihost_utils
    return bool(multihost_utils.process_allgather(
        np.asarray(bool(flag))).any())


def host_shard(num_examples: int,
               process_index: Optional[int] = None,
               process_count: Optional[int] = None,
               equal: bool = False) -> tuple[int, int]:
    """Contiguous [start, stop) slice of the dataset owned by this host.

    equal=True drops the remainder so every host owns exactly
    num_examples // process_count rows — required by the train path,
    where every host must dispatch the same number of identically-shaped
    steps (a ragged tail would deadlock the collectives).
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    per = num_examples // pc
    start = pi * per
    stop = start + per if (equal or pi != pc - 1) else num_examples
    return start, stop


def _require_int_targets(t: object) -> np.ndarray:
    """Padded eval shards mark pad rows with the integer sentinel -1;
    that convention is only defined for SIGNED integer classification
    labels (-1 in an unsigned dtype wraps to the dtype max and the
    masked metrics' `target >= 0` test would count pad rows as real
    examples). Fail loudly on float or unsigned targets instead of
    silently corrupting, and keep the loader's own dtype so padding and
    non-padding hosts agree."""
    arr = np.asarray(t)
    if not np.issubdtype(arr.dtype, np.signedinteger):
        raise TypeError(
            'padded per-host eval shards require SIGNED integer '
            f'classification targets (sentinel -1 marks pad rows); got '
            f'dtype {arr.dtype}. Cast the loader\'s labels to a signed '
            'dtype, or use pad=False (trim).')
    return arr


class _ShardedBatches:
    """Per-host view of a batched loader: yields rows [pi::pc] of every
    batch, so hosts read disjoint rows and step in lockstep. Fallback for
    loaders without in-memory arrays (e.g. the lazy ImageNet loader);
    each host still *indexes* the full file list but decodes only its
    slice when the underlying loader decodes lazily per batch.

    Ragged final batches (rows not divisible by pc) would give hosts
    row counts differing by 1 — a shape mismatch inside
    make_array_from_process_local_data. pad=False trims every host to
    the common count (train semantics: a <pc-row tail is dropped);
    pad=True pads every host to the ceil count with sentinel target -1
    rows that the masked eval metrics exclude, covering every example.
    """

    def __init__(self, inner: object, pi: int, pc: int,
                 pad: bool = False) -> None:
        self._inner, self._pi, self._pc = inner, pi, pc
        self._pad = pad
        n = getattr(inner, 'num_examples', 0)
        self.num_examples = -(-n // pc) if pad else n // pc

    def __len__(self) -> int:
        return len(self._inner)

    def __iter__(self) -> object:
        for data, target in self._inner:
            d = data[self._pi::self._pc]
            t = target[self._pi::self._pc]
            n = data.shape[0]
            if self._pad:
                want = -(-n // self._pc)
                if d.shape[0] < want:
                    extra = want - d.shape[0]
                    d = np.concatenate(
                        [d, np.zeros((extra,) + d.shape[1:], d.dtype)])
                    t = np.concatenate(
                        [_require_int_targets(t),
                         np.full((extra,), -1, np.asarray(t).dtype)])
            else:
                common = n // self._pc
                d, t = d[:common], t[:common]
            yield d, t


def _padded_host_slice(images: np.ndarray, labels: np.ndarray,
                       pi: int, pc: int
                       ) -> tuple[np.ndarray, np.ndarray]:
    """Split n rows into pc equal shards of ceil(n/pc), padding the tail
    with sentinel target -1 rows (masked out of the eval metrics)."""
    n = len(labels)
    per = -(-n // pc)
    pad = per * pc - n
    if pad:
        images = np.concatenate(
            [images, np.zeros((pad,) + images.shape[1:], images.dtype)])
        labels = np.concatenate(
            [_require_int_targets(labels),
             np.full((pad,), -1, np.asarray(labels).dtype)])
    return images[pi * per:(pi + 1) * per], labels[pi * per:(pi + 1) * per]


def shard_loader_for_host(loader: object,
                          process_index: Optional[int] = None,
                          process_count: Optional[int] = None,
                          pad: bool = False) -> object:
    """Give this host its disjoint 1/process_count of a batched loader.

    The config batch size is GLOBAL (reference semantics: one logical
    batch scattered over devices, initialization.py:125-127); each host
    loads batch_size/process_count rows and `global_batch` assembles the
    logical array. BatchIterable loaders are resliced at the array level
    (each host holds only its examples); other loaders get a row-striding
    wrapper.

    pad=False (train): the remainder rows are DROPPED so every host
    dispatches identically-shaped steps. pad=True (eval): every host is
    padded to ceil coverage with sentinel target -1 rows, so the masked
    eval metrics cover the FULL set exactly (reference evaluate()
    sees every example, training.py:155-204).
    """
    from quant_tpu.data.loaders import BatchIterable
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    if pc == 1:
        return loader
    if isinstance(loader, BatchIterable):
        local_bs = max(1, loader.batch_size // pc)
        if pad:
            imgs, labels = _padded_host_slice(
                loader.images, loader.labels, pi, pc)
            return BatchIterable(
                imgs, labels, local_bs, shuffle=loader.shuffle,
                seed=loader._seed + 7919 * pi, augment=loader.augment,
                drop_last=False, pad_value=loader.pad_value)
        start, stop = host_shard(loader.num_examples, pi, pc, equal=True)
        return BatchIterable(
            loader.images[start:stop], loader.labels[start:stop],
            local_bs, shuffle=loader.shuffle,
            seed=loader._seed + 7919 * pi, augment=loader.augment,
            drop_last=True, pad_value=loader.pad_value)
    return _ShardedBatches(loader, pi, pc, pad=pad)


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
