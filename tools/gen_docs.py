"""Render the quant_tpu API docs with the stdlib (no sphinx needed).

The reference ships a Sphinx tree (apple/ml-quant doc/: conf.py + rst
files with automodule directives, built by `make html`). This
environment has no sphinx, so this script provides the same rendered-
docs capability: it reads the SAME doc/*.rst sources, extracts the
`.. automodule::` directives and section headers, renders each module's
docstrings with `pydoc.HTMLDoc`, and writes a linked HTML tree.

Usage: python tools/gen_docs.py [--out doc/_build/html]
"""

import argparse
import importlib
import pydoc
import re
import sys
from html import escape
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

_AUTOMODULE = re.compile(r'^\.\. automodule:: ([\w.]+)', re.M)
_SECTION = re.compile(r'^(.+)\n[-~^]+\n', re.M)

_STYLE = """
body { font-family: sans-serif; margin: 2em auto; max-width: 60em; }
h1 { border-bottom: 2px solid #444; }
li { margin: 0.25em 0; }
code { background: #f2f2f2; padding: 0 0.2em; }
"""


def parse_rst_tree(doc_dir: Path):
    """(page_title, intro_text, [module, ...]) triples from the
    per-package pages listed in doc/index.rst (reference doc/ layout:
    one narrative page per package)."""
    order = []
    for line in (doc_dir / 'index.rst').read_text().splitlines():
        name = line.strip()
        if re.fullmatch(r'[a-z_]+', name) and name != 'release_notes' \
                and (doc_dir / f'{name}.rst').exists():
            order.append(name)
    pages = []
    for name in order:
        text = (doc_dir / f'{name}.rst').read_text()
        mods = _AUTOMODULE.findall(text)
        if not mods:
            continue
        m = re.search(r'^(.+)\n=+\n', text, re.M)
        title = m.group(1).strip() if m else name
        # Narrative intro: prose between the page title and the first
        # directive/section underline.
        body = text[m.end():] if m else text
        intro_lines = []
        body_lines = body.splitlines()
        for i, ln in enumerate(body_lines):
            nxt = body_lines[i + 1] if i + 1 < len(body_lines) else ''
            if ln.startswith('..') \
                    or re.fullmatch(r'[-~^]+', ln.strip()) \
                    or (ln.strip()
                        and re.fullmatch(r'[-~^]{2,}', nxt.strip() or 'x')):
                break
            intro_lines.append(ln)
        intro = ' '.join(x.strip() for x in intro_lines).strip()
        pages.append((title, intro, mods))
    return pages


def render(out_dir: Path) -> int:
    out_dir.mkdir(parents=True, exist_ok=True)
    sections = parse_rst_tree(REPO / 'doc')
    html_doc = pydoc.HTMLDoc()
    n = 0
    index_items = []
    for title, intro, mods in sections:
        links = []
        for name in mods:
            mod = importlib.import_module(name)
            page = html_doc.page(pydoc.describe(mod), html_doc.docmodule(mod))
            (out_dir / f'{name}.html').write_text(page)
            links.append(f'<li><a href="{name}.html"><code>{name}</code>'
                         f'</a> — {escape(_first_line(mod))}</li>')
            n += 1
        index_items.append(
            f'<h2>{escape(title)}</h2>\n<p>{escape(intro)}</p>\n<ul>\n'
            + '\n'.join(links) + '\n</ul>')

    version = importlib.import_module('quant_tpu').__version__
    index = (f'<!doctype html><html><head><meta charset="utf-8">'
             f'<title>quant_tpu {version} API</title>'
             f'<style>{_STYLE}</style></head><body>'
             f'<h1>quant_tpu {version} — API reference</h1>'
             f'<p>Rendered from module docstrings by tools/gen_docs.py '
             f'(stdlib fallback for the sphinx tree in doc/).</p>'
             + '\n'.join(index_items) + '</body></html>')
    (out_dir / 'index.html').write_text(index)
    return n


def _first_line(mod) -> str:
    doc = (mod.__doc__ or '').strip()
    return doc.splitlines()[0] if doc else ''


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--out', default=str(REPO / 'doc/_build/html'))
    args = ap.parse_args()
    n = render(Path(args.out))
    print(f'rendered {n} module pages + index -> {args.out}')


if __name__ == '__main__':
    main()
