"""Rendered-docs capability tests (reference: doc/ sphinx tree).

The reference builds API HTML from docstrings via sphinx automodule
directives (apple/ml-quant doc/conf.py, doc/*.rst). quant_tpu ships the
same rst tree plus a stdlib renderer for sphinx-less environments;
these tests prove the rst sources stay in sync with the package and the
renderer produces a usable tree.
"""

import importlib
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / 'tools'))

import gen_docs  # noqa: E402


def test_rst_covers_every_package_module():
    listed = {m for _, _, mods in gen_docs.parse_rst_tree(REPO / 'doc')
              for m in mods}
    on_disk = {
        str(p.relative_to(REPO)).replace('/', '.').removesuffix('.py')
        for p in (REPO / 'quant_tpu').rglob('*.py')
        # Private modules (leading underscore) are not public API.
        if p.name != '__init__.py' and not p.name.startswith('_')
    }
    missing = on_disk - listed
    assert not missing, f'modules absent from the doc/ pages: {missing}'


def test_rst_modules_all_import():
    for _, _, mods in gen_docs.parse_rst_tree(REPO / 'doc'):
        for name in mods:
            importlib.import_module(name)


def test_render_produces_linked_tree(tmp_path):
    n = gen_docs.render(tmp_path)
    assert n >= 30
    index = (tmp_path / 'index.html').read_text()
    assert 'quant_tpu.ops.quantize.html' in index
    page = (tmp_path / 'quant_tpu.ops.quantize.html').read_text()
    assert 'quantizer_ls_2' in page
