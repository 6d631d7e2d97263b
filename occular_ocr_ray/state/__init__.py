"""Per-worker state: the extractor registry."""

from .registry import Registry, get_extractor, register_extractor  # noqa: F401
