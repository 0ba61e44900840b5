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


# ---------------------------------------------------------------------
# Quality gates on the DEFAULT test invocation (the reference runs
# mypy + flake8 + coverage on every pytest run, pytest.ini:12-17; this
# image ships none of them, so the stdlib analogs run here).
# QUANT_TPU_NO_GATES=1 opts out (e.g. for quick debugging loops).
# ---------------------------------------------------------------------

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_COV_TOOL = 2  # sys.monitoring id, shared with scripts/coverage.py


def _load_script(name):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(_REPO, 'scripts', f'{name}.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def pytest_collection(session):
    """Lint + typing gate before tests run — ANY finding fails loudly."""
    if os.environ.get('QUANT_TPU_NO_GATES'):
        return
    lint = _load_script('lint')
    findings = []
    cwd = os.getcwd()
    try:
        os.chdir(_REPO)
        for f in lint.iter_py(lint.DEFAULT_PATHS):
            findings.extend(lint.lint_file(f))
    finally:
        os.chdir(cwd)
    if findings:
        raise pytest.UsageError(
            'lint/typing gate failed (scripts/lint.py):\n  '
            + '\n  '.join(findings))


def _full_suite_run(config) -> bool:
    args = [a for a in config.args if not a.startswith('-')]
    tests_root = os.path.join(_REPO, 'tests')
    return len(args) == 1 and os.path.abspath(args[0]) == tests_root


def pytest_sessionstart(session):
    """Start the quant_tpu line tracer for full-suite runs (coverage
    gate; per-code-object DISABLE after first hit keeps it cheap)."""
    import sys as _sys
    if os.environ.get('QUANT_TPU_NO_GATES') \
            or not _full_suite_run(session.config) \
            or not hasattr(_sys, 'monitoring') \
            or _sys.monitoring.get_tool(_COV_TOOL) is not None:
        return  # partial run, or scripts/coverage.py already tracing
    cov = _load_script('coverage')
    _sys.monitoring.use_tool_id(_COV_TOOL, 'quant_tpu-coverage')
    _sys.monitoring.register_callback(
        _COV_TOOL, _sys.monitoring.events.LINE, cov._on_line)
    _sys.monitoring.register_callback(
        _COV_TOOL, _sys.monitoring.events.BRANCH, cov._on_branch)
    _sys.monitoring.set_events(
        _COV_TOOL,
        _sys.monitoring.events.LINE | _sys.monitoring.events.BRANCH)
    session.config._qtpu_cov = cov


def pytest_sessionfinish(session, exitstatus):
    cov = getattr(session.config, '_qtpu_cov', None)
    if cov is None:
        return
    import sys as _sys
    from pathlib import Path
    _sys.monitoring.set_events(_COV_TOOL, 0)
    _sys.monitoring.free_tool_id(_COV_TOOL)
    tot_exec = tot_hit = 0
    tot_br = tot_br_hit = 0
    for f in sorted(Path(cov.PKG).rglob('*.py')):
        ex = cov.executable_lines(f)
        hit = cov.hits.get(str(f), set()) & ex
        bh, bt = cov.branch_outcomes(f, cov.branch_hits.get(str(f), {}))
        tot_exec += len(ex)
        tot_hit += len(hit)
        tot_br += bt
        tot_br_hit += bh
    total = 100.0 * tot_hit / max(tot_exec, 1)
    btotal = 100.0 * tot_br_hit / max(tot_br, 1)
    print(f'\nquant_tpu coverage: lines {total:.1f}% '
          f'({tot_hit}/{tot_exec}, fail-under {cov.FAIL_UNDER}%), '
          f'branches {btotal:.1f}% ({tot_br_hit}/{tot_br}, '
          f'fail-under {cov.BRANCH_FAIL_UNDER}%)')
    if exitstatus == 0 and (total < cov.FAIL_UNDER
                            or btotal < cov.BRANCH_FAIL_UNDER):
        print(f'COVERAGE GATE FAILED: lines {total:.1f}% '
              f'(need {cov.FAIL_UNDER}%), branches {btotal:.1f}% '
              f'(need {cov.BRANCH_FAIL_UNDER}%)')
        session.exitstatus = 1
