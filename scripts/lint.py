#!/usr/bin/env python
"""In-repo lint + type-annotation gate.

The reference runs flake8 + strict mypy on every pytest invocation
(reference pytest.ini:11-17, mypy.ini `disallow_untyped_defs`). This
image ships neither tool and installs are forbidden, so this script
enforces the same contract with stdlib ast:

flake8-subset checks (style/correctness):
  E501 line too long (>88)          W291/W293 trailing whitespace
  W191 tabs in indentation          F401 unused import
  F811 duplicate import             E722 bare except
  B006 mutable default argument     F632 `is` with a literal

strict-typing subset (mypy disallow_untyped_defs analog):
  T001 any module- or class-level function/method in quant_tpu/ —
       public AND private — lacking parameter or return annotations
       (self/cls exempt; __init__ return exempt; nested closures
       exempt, like mypy inside annotated parents; tests exempt).

Usage: python scripts/lint.py [paths...]   (default: quant_tpu tools
       scripts bench.py __graft_entry__.py)
Exit 1 on any finding.
"""

import ast
import sys
from pathlib import Path

MAX_LEN = 88
DEFAULT_PATHS = ['quant_tpu', 'tools', 'scripts', 'bench.py',
                 '__graft_entry__.py', 'examples', 'tests']
# Annotation strictness applies to the library only.
TYPED_ROOTS = ('quant_tpu',)


def iter_py(paths):
    for p in paths:
        p = Path(p)
        if p.is_dir():
            yield from sorted(p.rglob('*.py'))
        elif p.suffix == '.py':
            yield p


class ImportTracker(ast.NodeVisitor):
    """Module-scope import tracking (flake8 F401/F811 semantics: local
    re-imports inside functions are neither unused nor duplicates)."""

    def __init__(self):
        self.imports: dict[str, int] = {}   # name -> lineno
        self.used: set[str] = set()
        self.dupes: list[tuple[int, str]] = []
        self._depth = 0

    def _add(self, node, name):
        if self._depth:
            return
        if name in self.imports:
            self.dupes.append((node.lineno, name))
        self.imports[name] = node.lineno

    def visit_Import(self, node):
        for a in node.names:
            self._add(node, (a.asname or a.name).split('.')[0])

    def visit_ImportFrom(self, node):
        for a in node.names:
            if a.name != '*':
                self._add(node, a.asname or a.name)

    def visit_FunctionDef(self, node):
        self._depth += 1
        self.generic_visit(node)
        self._depth -= 1

    visit_AsyncFunctionDef = visit_FunctionDef
    visit_Lambda = visit_FunctionDef

    def visit_Name(self, node):
        self.used.add(node.id)

    def visit_Attribute(self, node):
        self.generic_visit(node)


def _annotation_findings(tree, path):
    out = []
    if not str(path).startswith(TYPED_ROOTS):
        return out

    def check(node):
        missing = [a.arg for a in (node.args.args + node.args.kwonlyargs)
                   if a.annotation is None and a.arg not in ('self', 'cls')]
        if missing or (node.returns is None and node.name != '__init__'):
            what = f'params {missing}' if missing else 'return type'
            out.append((node.lineno,
                        f'T001 def {node.name} missing '
                        f'annotations ({what})'))

    # Module- and class-level defs only (nested closures are local
    # implementation detail, like mypy with check_untyped_defs off
    # inside annotated parents).
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            check(node)
        elif isinstance(node, ast.ClassDef):
            for sub in node.body:
                if isinstance(sub, (ast.FunctionDef,
                                    ast.AsyncFunctionDef)):
                    check(sub)
    return out


def lint_file(path: Path) -> list[str]:
    src = path.read_text()
    findings: list[tuple[int, str]] = []
    for i, line in enumerate(src.splitlines(), 1):
        stripped = line.rstrip('\n')
        if len(stripped) > MAX_LEN and 'noqa' not in stripped:
            findings.append((i, f'E501 line too long ({len(stripped)})'))
        if stripped != stripped.rstrip():
            findings.append((i, 'W291 trailing whitespace'))
        if stripped[:1] == '\t' or stripped.lstrip(' ')[:1] == '\t':
            findings.append((i, 'W191 tab in indentation'))
    try:
        tree = ast.parse(src)
    except SyntaxError as e:
        return [f'{path}:{e.lineno}: E999 syntax error: {e.msg}']

    tracker = ImportTracker()
    tracker.visit(tree)
    # Names used anywhere (incl. strings in __all__).
    for node in ast.walk(tree):
        if isinstance(node, ast.Constant) and isinstance(node.value, str):
            tracker.used.add(node.value)
    is_init = path.name == '__init__.py'
    for name, lineno in tracker.imports.items():
        if name not in tracker.used and not is_init:
            findings.append((lineno, f'F401 unused import {name!r}'))
    for lineno, name in tracker.dupes:
        findings.append((lineno, f'F811 duplicate import {name!r}'))

    for node in ast.walk(tree):
        if isinstance(node, ast.ExceptHandler) and node.type is None:
            findings.append((node.lineno, 'E722 bare except'))
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
            for d in node.args.defaults + node.args.kw_defaults:
                if isinstance(d, (ast.List, ast.Dict, ast.Set)):
                    findings.append(
                        (d.lineno, 'B006 mutable default argument'))
        if isinstance(node, ast.Compare):
            for op, cmp_ in zip(node.ops, node.comparators):
                if isinstance(op, (ast.Is, ast.IsNot)) and isinstance(
                        cmp_, ast.Constant) and cmp_.value is not None \
                        and not isinstance(cmp_.value, bool):
                    findings.append(
                        (node.lineno, 'F632 `is` with a literal'))

    findings.extend(_annotation_findings(tree, path))
    return [f'{path}:{ln}: {msg}' for ln, msg in sorted(findings)]


def main() -> int:
    paths = sys.argv[1:] or DEFAULT_PATHS
    all_findings = []
    n_files = 0
    for f in iter_py(paths):
        n_files += 1
        all_findings.extend(lint_file(f))
    for line in all_findings:
        print(line)
    print(f'lint: {n_files} files, {len(all_findings)} findings')
    return 1 if all_findings else 0


if __name__ == '__main__':
    sys.exit(main())
