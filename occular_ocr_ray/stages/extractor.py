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

import gc
import zlib

import pyarrow as pa

from ..functions.extract import extract_row
from ..schemas import EXTRACTED_SCHEMA
from ..state.registry import register_extractor


def _tune_gc_for_parse() -> None:
    """Raise the gen-0 GC threshold in this worker process (once): the
    parse kernel allocates millions of short-lived container objects per
    batch (parser state, RawBlock/ScoredBlock, span dicts), none of them
    cyclic, so CPython's default gen-0 threshold (700) fires thousands
    of useless young-gen scans per batch — measured ~10% of kernel wall
    on article-sized documents (clean-process A/B, 400-doc batch:
    ~2.7 s → ~2.46 s).  50k bounds the young generation to a few tens
    of MB; collection still runs, just 70x less often.  Process-global
    by design — called from stage ``__init__`` so every Ray worker that
    hosts a parse stage gets it exactly once."""
    if gc.get_threshold()[0] < 50_000:
        gc.set_threshold(50_000, 100, 100)


def url_host_part(url: str, num_parts: int) -> int:
    """Hash-partition key: crc32 of the url host, mod P.  crc32 (not
    ``hash()``) so the key is stable across processes/runs — required
    for resume and for cross-run output layout stability."""
    try:
        host = url.split("/", 3)[2]
    except IndexError:
        host = url
    return zlib.crc32(host.encode("utf-8")) % num_parts


class DensityExtractor:
    """Main-content extractor (density/link-density heuristics).

    State built once per actor (analog of model load at
    ``dbnet_detector.py:23-45``): today the compiled heuristic tables are
    module-level frozensets, so ``__init__`` is cheap — but the actor
    shape is load-bearing: it keeps per-batch overhead at zero as the
    heuristic state grows (stopword tables, codepoint maps, ML scorers).

    ``num_parts`` fuses the hash-partition column into the same output
    assembly (one Arrow pass instead of a separate ``map_batches``);
    ``force_parse`` re-extracts from the raw payload even when a native
    text layer exists (reference ``force_ocr``, ``pipeline.py:94``).
    """

    def __init__(self, num_parts: int | None = None, force_parse: bool = False,
                 **thresholds) -> None:
        # Touch the heuristic tables so import/compile cost is paid at
        # actor construction, not first batch.
        from ..functions import classify, html_blocks  # noqa: F401

        _tune_gc_for_parse()

        self._extract = extract_row
        self._thresholds = thresholds or None  # None = frozen defaults
        self._num_parts = num_parts
        self._force_parse = force_parse

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch["url"].to_pylist()
        htmls = batch["html"].to_pylist()
        texts = batch["text"].to_pylist()
        th, fp = self._thresholds, self._force_parse
        out = [self._extract(u, h, t, th, fp) for u, h, t in zip(urls, htmls, texts)]
        table = rows_to_table(out)
        if self._num_parts:
            parts = [url_host_part(u, self._num_parts) for u in urls]
            table = table.append_column("part", pa.array(parts, pa.int32()))
        return table


def rows_to_table(rows: list[dict]) -> pa.Table:
    """Assemble output rows into an Arrow table with the frozen
    ``EXTRACTED_SCHEMA`` (SURVEY.md §2.2 M11 record assembly).

    The spans list column is built by flattening into parallel arrays +
    a ListArray offset vector — ~30x faster than ``pa.array`` over
    per-span Python dicts (giant docs carry thousands of spans)."""
    starts: list[int] = []
    ends: list[int] = []
    paths: list[str] = []
    scores: list[float] = []
    offsets = [0]
    for r in rows:
        for s in r["spans"]:
            starts.append(s["start"])
            ends.append(s["end"])
            paths.append(s["tag_path"])
            scores.append(s["score"])
        offsets.append(len(starts))
    span_struct = pa.StructArray.from_arrays(
        [
            pa.array(starts, pa.int64()),
            pa.array(ends, pa.int64()),
            pa.array(paths, pa.string()),
            pa.array(scores, pa.float64()),
        ],
        fields=list(EXTRACTED_SCHEMA.field("spans").type.value_type),
    )
    spans = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), span_struct)
    return pa.Table.from_arrays(
        [
            pa.array([r["url"] for r in rows], pa.string()),
            pa.array([r["extracted_text"] for r in rows], pa.string()),
            spans.cast(EXTRACTED_SCHEMA.field("spans").type),
            pa.array([r["method"] for r in rows], pa.string()),
            pa.array([r["n_blocks_kept"] for r in rows], pa.int64()),
            pa.array([r["n_blocks_dropped"] for r in rows], pa.int64()),
            pa.array([r["bytes_emitted"] for r in rows], pa.int64()),
        ],
        schema=EXTRACTED_SCHEMA,
    )


def extract_batch(batch: pa.Table) -> pa.Table:
    """Stateless variant of the same transform, for small/driver-side
    paths and tests."""
    return DensityExtractor()(batch)


class LenientExtractor(DensityExtractor):
    """Named variant (extension-surface demo, SURVEY.md §2.9): lower
    keep threshold + shorter minimum — keeps headings and short
    paragraphs the default classifier drops.  NOT golden-contract."""

    def __init__(self, **kw) -> None:
        kw.setdefault("keep_thresh", 0.25)
        kw.setdefault("min_chars", 12)
        super().__init__(**kw)


register_extractor("density", DensityExtractor)
register_extractor("lenient", LenientExtractor)
