"""Multi-host helper tests: mocked process topology + virtual mesh."""

from unittest import mock

import jax
import numpy as np
import pytest

from quant_tpu.parallel import make_mesh
from quant_tpu.parallel.multihost import global_batch, host_shard


def test_host_shard_partitions_dataset():
    n = 103
    pc = 4
    slices = [host_shard(n, pi, pc) for pi in range(pc)]
    assert slices[0][0] == 0
    assert slices[-1][1] == n
    covered = []
    for (a, b), (c, _) in zip(slices, slices[1:] + [(n, n)]):
        assert b == c
        covered.extend(range(a, b))
    assert covered == list(range(n))


def test_host_shard_uses_jax_process_info():
    with mock.patch.object(jax, 'process_index', return_value=2), \
         mock.patch.object(jax, 'process_count', return_value=8):
        start, stop = host_shard(80)
        assert (start, stop) == (20, 30)


def test_global_batch_single_process_shards_over_data():
    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices')
    mesh = make_mesh()
    local = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    arr = global_batch(local, mesh)
    assert arr.shape == (16, 3)
    np.testing.assert_array_equal(np.asarray(arr), local)
    # Sharded over the data axis.
    assert len(arr.sharding.device_set) == mesh.shape['data'] * \
        mesh.shape['model'] or len(arr.sharding.device_set) == \
        mesh.shape['data']
