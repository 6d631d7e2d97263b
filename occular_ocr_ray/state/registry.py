"""Extractor registry — the user-extension surface.

Graft analog of the reference's component registry
(``ocr_skel/registry.py:18-52``): named extractor classes with
constructor kwargs, unknown name → ``ValueError`` listing available.

The reference's process-level instance cache (``registry.py:14-16``,
"load model once per worker") is NOT reproduced here: Ray actor
lifecycle replaces it — one extractor instance per actor, built once in
``__init__`` and reused across batches (SURVEY.md §2.3 A5).
"""

from __future__ import annotations


class Registry:
    _extractors: dict[str, type] = {}

    @classmethod
    def register_extractor(cls, name: str, extractor_cls: type) -> None:
        cls._extractors[name] = extractor_cls

    @classmethod
    def get_extractor(cls, name: str) -> type:
        if name not in cls._extractors:
            raise ValueError(
                f"Unknown extractor {name!r}. Available: {sorted(cls._extractors)}"
            )
        return cls._extractors[name]

    @classmethod
    def available(cls) -> list[str]:
        return sorted(cls._extractors)


register_extractor = Registry.register_extractor
get_extractor = Registry.get_extractor
