"""Test configuration: force an 8-virtual-device CPU platform.

All tests run on CPU with XLA host-platform device virtualization so that
multi-chip sharding logic (DP/TP over a `jax.sharding.Mesh`) is exercised
without TPU hardware (SURVEY.md §4: the reference has no distributed tests;
we add them via `--xla_force_host_platform_device_count=8`).

Must run before jax initializes a backend, hence environment mutation at
import time of this conftest.
"""

import os

# FORCE (not setdefault): the ambient environment may pin JAX_PLATFORMS to
# a hardware backend (e.g. the axon TPU tunnel); tests must run on the
# virtual CPU mesh regardless, or every test would remote-compile on the
# real chip. The env mutation alone is not enough when a sitecustomize
# already imported jax at interpreter start (the config latches the env
# value at import), so the jax config is updated directly as well.
os.environ['JAX_PLATFORMS'] = 'cpu'
xla_flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in xla_flags:
    os.environ['XLA_FLAGS'] = (
        xla_flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
