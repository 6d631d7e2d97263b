"""Thin shim over pyproject.toml metadata (PEP 621): lets environments
without the `wheel` package (no-network cluster images, this sandbox)
install via `python setup.py develop` / legacy paths.  The console
entry point mirrors the reference's (/root/reference/setup.py:22-24)."""
from setuptools import setup

setup()
