"""The extraction stage: a callable CLASS for ``map_batches`` actor
pools.

Graft analog of the reference's stateful model stages (SURVEY.md §2.3
A1-A5): the detector/recognizer held per worker becomes an extractor
instance per Ray actor — setup in ``__init__`` (once per actor), work in
``__call__`` (per Arrow batch, zero-copy in).  The per-row loop inside
``__call__`` is intentional: the kernel is a document parser (like the
reference's per-page model inference), so the unit of work is the
document; vectorization happens at the batch/actor-pool level, not
inside the parse.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.extract import extract_row
from ..schemas import EXTRACTED_SCHEMA
from ..state.registry import register_extractor


class DensityExtractor:
    """Main-content extractor (density/link-density heuristics).

    State built once per actor (analog of model load at
    ``dbnet_detector.py:23-45``): today the compiled heuristic tables are
    module-level frozensets, so ``__init__`` is cheap — but the actor
    shape is load-bearing: it keeps per-batch overhead at zero as the
    heuristic state grows (stopword tables, codepoint maps, ML scorers).
    """

    def __init__(self) -> None:
        # Touch the heuristic tables so import/compile cost is paid at
        # actor construction, not first batch.
        from ..functions import classify, html_blocks  # noqa: F401

        self._extract = extract_row

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        htmls = batch["html"].to_pylist()
        texts = batch["text"].to_pylist()
        out = [self._extract(u, h, t) for u, h, t in zip(urls, htmls, texts)]
        return rows_to_table(out)


def rows_to_table(rows: list[dict]) -> pa.Table:
    """Assemble output rows into an Arrow table with the frozen
    ``EXTRACTED_SCHEMA`` (SURVEY.md §2.2 M11 record assembly)."""
    cols = {name: [r[name] for r in rows] for name in EXTRACTED_SCHEMA.names}
    return pa.Table.from_pydict(cols, schema=EXTRACTED_SCHEMA)


def extract_batch(batch: pa.Table) -> pa.Table:
    """Stateless variant of the same transform, for small/driver-side
    paths and tests."""
    return DensityExtractor()(batch)


register_extractor("density", DensityExtractor)
