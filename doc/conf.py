# Sphinx configuration for quant_tpu API docs.
#
# Mirrors the reference's doc/conf.py (apple/ml-quant doc/conf.py:17-40:
# autodoc + napoleon over the package tree, README pulled into the index).
# This environment has no sphinx; `python tools/gen_docs.py` renders the
# same module tree with the stdlib instead. This config is for hosts that
# do have sphinx: `cd doc && make html`.

import os
import sys

sys.path.insert(0, os.path.abspath('../'))

import quant_tpu  # noqa: E402

project = 'quant_tpu'
copyright = '2026, quant_tpu authors'
author = 'quant_tpu authors'
version = quant_tpu.__version__
release = quant_tpu.__version__

extensions = [
    'sphinx.ext.napoleon',
    'sphinx.ext.autodoc',
    'sphinx.ext.intersphinx',
    'sphinx.ext.viewcode',
]

templates_path = ['_templates']
source_suffix = '.rst'
master_doc = 'index'
language = 'en'
exclude_patterns = ['_build', 'Thumbs.db', '.DS_Store']
pygments_style = 'sphinx'

html_theme = 'alabaster'
html_static_path = []

autodoc_member_order = 'bysource'
autodoc_default_options = {
    'members': True,
    'undoc-members': True,
    'special-members': '__init__, __call__',
}

intersphinx_mapping = {
    'python': ('https://docs.python.org/3', None),
    'jax': ('https://jax.readthedocs.io/en/latest/', None),
}
