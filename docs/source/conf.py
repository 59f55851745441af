# Sphinx configuration for the haet_tpu documentation site.
#
# Mirrors the reference's RTD setup (/root/reference/docs/source/conf.py)
# with one structural improvement: the reference needs dependency-free stub
# classes (haet_doc_stubs.py) because its package can't import without CUDA
# deps; haet_tpu imports cleanly, so autodoc runs against the real package.

project = "haet_tpu"
copyright = "2026, haet_tpu contributors"
author = "haet_tpu contributors"

release = "0.3"
version = "0.3.0"

import os
import sys

sys.path.insert(0, os.path.abspath("../../"))

extensions = [
    "sphinx.ext.duration",
    "sphinx.ext.doctest",
    "sphinx.ext.autodoc",
    "sphinx.ext.autosummary",
    "sphinx.ext.intersphinx",
    "sphinx.ext.viewcode",
    "sphinx.ext.napoleon",
]

# jax/flax/optax are importable in the dev image; mock them anyway so the
# docs build on a bare RTD worker.
autodoc_mock_imports = [
    "jax", "jaxlib", "flax", "optax", "orbax", "chex", "einops",
    "scipy", "sklearn", "h5py", "matplotlib", "wandb",
]
autodoc_typehints = "description"
autoclass_content = "both"
autodoc_member_order = "bysource"

intersphinx_mapping = {
    "python": ("https://docs.python.org/3/", None),
    "jax": ("https://jax.readthedocs.io/en/latest/", None),
    "flax": ("https://flax.readthedocs.io/en/latest/", None),
}
intersphinx_disabled_domains = ["std"]

templates_path = ["_templates"]

html_theme = "sphinx_rtd_theme"
epub_show_urls = "footnote"
