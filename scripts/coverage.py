#!/usr/bin/env python
"""Line coverage for quant_tpu/ without coverage.py (not in this image).

Uses sys.monitoring (PEP 669, Python 3.12): registers a LINE callback
filtered to files under quant_tpu/, runs pytest in-process, then reports
hit / executable lines per file. Executable lines come from compiling
each source and walking code objects' co_lines().

Usage: python scripts/coverage.py [pytest args...]
       (defaults to `tests/ -q`; run via scripts/check.sh for the
       CPU-mesh environment variables)

Mirrors the reference's `--cov quant` gate (reference pytest.ini:14-17,
coverage.ini). Exits 1 if total coverage < FAIL_UNDER.
"""

import sys
from collections import defaultdict
from pathlib import Path

FAIL_UNDER = 80.0
REPO = Path(__file__).resolve().parents[1]
PKG = str(REPO / 'quant_tpu')

hits: dict[str, set[int]] = defaultdict(set)

TOOL = 2  # sys.monitoring tool id (coverage tools use 2 by convention)


def _on_line(code, lineno):
    fn = code.co_filename
    if fn.startswith(PKG):
        hits[fn].add(lineno)
    else:
        return sys.monitoring.DISABLE
    return None


def executable_lines(path: Path) -> set[int]:
    try:
        code = compile(path.read_text(), str(path), 'exec')
    except SyntaxError:
        return set()
    lines: set[int] = set()
    stack = [code]
    while stack:
        co = stack.pop()
        for _, _, ln in co.co_lines():
            if ln is not None:
                lines.add(ln)
        for const in co.co_consts:
            if hasattr(const, 'co_lines'):
                stack.append(const)
    # Exclude docstring-only/module header noise: keep all; good enough.
    return lines


def main() -> int:
    import pytest

    sys.monitoring.use_tool_id(TOOL, 'quant_tpu-coverage')
    sys.monitoring.register_callback(
        TOOL, sys.monitoring.events.LINE, _on_line)
    sys.monitoring.set_events(TOOL, sys.monitoring.events.LINE)
    args = sys.argv[1:] or ['tests/', '-q']
    rc = pytest.main(args)
    sys.monitoring.set_events(TOOL, 0)

    rows = []
    tot_exec = tot_hit = 0
    for f in sorted(Path(PKG).rglob('*.py')):
        ex = executable_lines(f)
        if not ex:
            continue
        hit = hits.get(str(f), set()) & ex
        tot_exec += len(ex)
        tot_hit += len(hit)
        rows.append((str(f.relative_to(REPO)), len(hit), len(ex)))

    print()
    print(f'{"file":<44} {"cover":>6}')
    for name, h, e in rows:
        print(f'{name:<44} {100.0 * h / e:5.1f}%  ({h}/{e})')
    total = 100.0 * tot_hit / max(tot_exec, 1)
    print(f'{"TOTAL":<44} {total:5.1f}%  ({tot_hit}/{tot_exec})')
    if rc != 0:
        return int(rc)
    if total < FAIL_UNDER:
        print(f'coverage {total:.1f}% < fail-under {FAIL_UNDER}%')
        return 1
    return 0


if __name__ == '__main__':
    sys.exit(main())
