#!/usr/bin/env python
"""Line + branch coverage for quant_tpu/ without coverage.py.

Uses sys.monitoring (PEP 669, Python 3.12): LINE and BRANCH callbacks
filtered to files under quant_tpu/, runs pytest in-process, then
reports hit / executable lines and taken/not-taken branch outcomes per
file. Executable lines come from compiling each source and walking code
objects' co_lines(); the branch universe from each code object's
conditional-jump instructions (each contributes 2 outcomes, classified
at report time by whether the observed destination is the fallthrough).

Usage: python scripts/coverage.py [pytest args...]
       (defaults to `tests/ -q`; run via scripts/check.sh for the
       CPU-mesh environment variables)

Mirrors the reference's `--cov quant` gate with branch coverage
(reference pytest.ini:14-17, coverage.ini:6-14 `branch = True`).
Exits 1 if line coverage < FAIL_UNDER or branch coverage <
BRANCH_FAIL_UNDER.
"""

import dis
import sys
from collections import defaultdict
from pathlib import Path

FAIL_UNDER = 80.0
BRANCH_FAIL_UNDER = 70.0
REPO = Path(__file__).resolve().parents[1]
PKG = str(REPO / 'quant_tpu')

hits: dict[str, set[int]] = defaultdict(set)
# fn -> {(qualname, firstlineno, branch_offset): {observed dests}}
branch_hits: dict[str, dict] = defaultdict(lambda: defaultdict(set))

TOOL = 2  # sys.monitoring tool id (coverage tools use 2 by convention)

# Conditional two-way branches (3.12 opcodes). Unconditional jumps are
# not branches; FOR_ITER's two outcomes are loop-body vs exhaustion.
_BRANCH_OPS = frozenset({
    'POP_JUMP_IF_FALSE', 'POP_JUMP_IF_TRUE',
    'POP_JUMP_IF_NONE', 'POP_JUMP_IF_NOT_NONE', 'FOR_ITER',
})


def _on_line(code, lineno):
    fn = code.co_filename
    if fn.startswith(PKG):
        hits[fn].add(lineno)
    else:
        return sys.monitoring.DISABLE
    return None


def _on_branch(code, off, dest):
    fn = code.co_filename
    if not fn.startswith(PKG):
        return sys.monitoring.DISABLE
    dests = branch_hits[fn][(code.co_qualname, code.co_firstlineno, off)]
    dests.add(dest)
    if len(dests) >= 2:
        # Both outcomes observed: nothing more to learn at this site.
        return sys.monitoring.DISABLE
    return None


def code_branches(path: Path) -> dict:
    """-> {(qualname, firstlineno, offset): fallthrough_offset} for
    every conditional branch in the file."""
    try:
        code = compile(path.read_text(), str(path), 'exec')
    except SyntaxError:
        return {}
    out = {}
    stack = [code]
    while stack:
        co = stack.pop()
        instrs = list(dis.get_instructions(co))
        for i, ins in enumerate(instrs):
            if ins.opname in _BRANCH_OPS and i + 1 < len(instrs):
                out[(co.co_qualname, co.co_firstlineno, ins.offset)] = \
                    instrs[i + 1].offset
        for const in co.co_consts:
            if hasattr(const, 'co_code'):
                stack.append(const)
    return out


def branch_outcomes(path: Path, observed: dict) -> tuple[int, int]:
    """-> (outcomes_hit, outcomes_total) for the file. An observed
    destination equal to the branch's fallthrough is the not-taken
    outcome; anything else is taken (exact jump targets can differ
    from dis argval by cleanup instructions, so classify, don't
    match)."""
    universe = code_branches(path)
    total = 2 * len(universe)
    hit = 0
    for key, fall in universe.items():
        dests = observed.get(key, set())
        if any(d == fall for d in dests):
            hit += 1
        if any(d != fall for d in dests):
            hit += 1
    return hit, total


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
    sys.monitoring.register_callback(
        TOOL, sys.monitoring.events.BRANCH, _on_branch)
    sys.monitoring.set_events(
        TOOL, sys.monitoring.events.LINE | sys.monitoring.events.BRANCH)
    args = sys.argv[1:] or ['tests/', '-q']
    rc = pytest.main(args)
    sys.monitoring.set_events(TOOL, 0)

    rows = []
    tot_exec = tot_hit = 0
    tot_br = tot_br_hit = 0
    for f in sorted(Path(PKG).rglob('*.py')):
        ex = executable_lines(f)
        if not ex:
            continue
        hit = hits.get(str(f), set()) & ex
        bh, bt = branch_outcomes(f, branch_hits.get(str(f), {}))
        tot_exec += len(ex)
        tot_hit += len(hit)
        tot_br += bt
        tot_br_hit += bh
        rows.append((str(f.relative_to(REPO)), len(hit), len(ex),
                     bh, bt))

    print()
    print(f'{"file":<44} {"lines":>6} {"branch":>7}')
    for name, h, e, bh, bt in rows:
        br = f'{100.0 * bh / bt:5.1f}%' if bt else '   n/a'
        print(f'{name:<44} {100.0 * h / e:5.1f}%  {br}  '
              f'({h}/{e}, {bh}/{bt})')
    total = 100.0 * tot_hit / max(tot_exec, 1)
    btotal = 100.0 * tot_br_hit / max(tot_br, 1)
    print(f'{"TOTAL":<44} {total:5.1f}%  {btotal:5.1f}%  '
          f'({tot_hit}/{tot_exec}, {tot_br_hit}/{tot_br})')
    if rc != 0:
        return int(rc)
    if total < FAIL_UNDER:
        print(f'coverage {total:.1f}% < fail-under {FAIL_UNDER}%')
        return 1
    if btotal < BRANCH_FAIL_UNDER:
        print(f'branch coverage {btotal:.1f}% < fail-under '
              f'{BRANCH_FAIL_UNDER}%')
        return 1
    return 0


if __name__ == '__main__':
    sys.exit(main())
