"""Sphinx configuration for sbmc_tpu (autodoc over the package modules,
the role of the reference's docs/ skeleton)."""

import os
import sys

sys.path.insert(0, os.path.abspath("../.."))

project = "sbmc_tpu"
author = "sbmc_tpu authors"
release = "0.1.0"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
    "myst_parser",
]
source_suffix = {".rst": "restructuredtext", ".md": "markdown"}
master_doc = "index_rst"
html_theme = "alabaster"
autodoc_mock_imports = ["jax", "jaxlib", "flax", "optax", "torch"]
