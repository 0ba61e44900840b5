"""16-virtual-device pod envelope (VERDICT r4 #9): the full multichip
dry run — dp=4 x tp=4 train step, packed TP serving, spatial and
pipeline paths — compiles and executes on a 4x4 CPU mesh.

Runs in a SUBPROCESS: the suite's own jax process is pinned to an
8-device CPU platform by conftest, and device count is a process-wide
XLA flag."""

import os
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parents[2]


def test_dryrun_multichip_16_devices():
    env = dict(os.environ)
    env.update({
        'JAX_PLATFORMS': 'cpu',
        'PALLAS_AXON_POOL_IPS': '',
        'XLA_FLAGS': '--xla_force_host_platform_device_count=16',
    })
    out = subprocess.run(
        [sys.executable, '-c',
         'import __graft_entry__ as g; g.dryrun_multichip(16)'],
        cwd=str(REPO), env=env, capture_output=True, text=True,
        timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "mesh=OrderedDict({'data': 4, 'model': 4})" in out.stdout, \
        out.stdout
    assert 'ok' in out.stdout
