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

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.extract import extract_row
from ..schemas import EXTRACTED_SCHEMA
from ..state.registry import register_extractor


def _html_accessor(col: pa.ChunkedArray):
    """Row-index → decoded payload str (or None), reading straight off
    the Arrow binary buffers: ``str(memoryview, 'utf-8', 'replace')``
    decodes from the (shared-memory) block without first materializing
    a Python ``bytes`` copy of every payload — ``to_pylist()`` was one
    full extra pass of the whole input through the allocator, on the
    stage whose 8→32 scaling wall is memory bandwidth (VERDICT r4 #5).
    Lazy: native-text rows never decode their payload at all.  Falls
    back to per-row ``as_py()`` for exotic layouts (sliced validity,
    unexpected types)."""
    chunks = []
    start = 0
    for ch in col.chunks:
        n = len(ch)
        entry = None
        if n and (pa.types.is_binary(ch.type)
                  or pa.types.is_large_binary(ch.type)):
            try:
                bufs = ch.buffers()
                odt = (np.int64 if pa.types.is_large_binary(ch.type)
                       else np.int32)
                offs = np.frombuffer(bufs[1], dtype=odt,
                                     count=ch.offset + n + 1)[ch.offset:]
                mv = memoryview(bufs[2]) if bufs[2] is not None else None
                valid = (ch.is_valid().to_numpy(zero_copy_only=False)
                         if ch.null_count else None)
                entry = (offs, mv, valid)
            except Exception:
                entry = None
        chunks.append((start, ch, entry))
        start += n
    bounds = [s for s, _, _ in chunks]

    def get(i: int):
        import bisect

        k = bisect.bisect_right(bounds, i) - 1
        s0, ch, entry = chunks[k]
        j = i - s0
        if entry is None:
            v = ch[j].as_py()
            return v.decode("utf-8", errors="replace") if v is not None else None
        offs, mv, valid = entry
        if valid is not None and not valid[j]:
            return None
        return str(mv[offs[j]:offs[j + 1]], "utf-8", "replace")

    return get


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
        texts = batch["text"].to_pylist()
        get_html = _html_accessor(batch["html"])
        th, fp = self._thresholds, self._force_parse
        extract = self._extract
        out = []
        for i, (u, t) in enumerate(zip(urls, texts)):
            if t and not fp:  # native fast path: payload never decoded
                out.append(extract(u, None, t, th, False,
                                   compute_bytes=False))
            else:
                out.append(extract(u, get_html(i), t, th, fp,
                                   compute_bytes=False))
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
    extracted = pa.array([r["extracted_text"] for r in rows], pa.string())
    if rows and rows[0]["bytes_emitted"] == -1:
        # deferred byte counts (extract_row compute_bytes=False): UTF-8
        # lengths come straight off the string array's offsets — no
        # per-document encode copy (VERDICT r4 #5).  binary_length on a
        # zero-copy binary view counts BYTES (utf8_length counts chars).
        bytes_emitted = pc.binary_length(
            extracted.cast(pa.binary())).cast(pa.int64())
    else:
        bytes_emitted = pa.array([r["bytes_emitted"] for r in rows],
                                 pa.int64())
    return pa.Table.from_arrays(
        [
            pa.array([r["url"] for r in rows], pa.string()),
            extracted,
            spans.cast(EXTRACTED_SCHEMA.field("spans").type),
            pa.array([r["method"] for r in rows], pa.string()),
            pa.array([r["n_blocks_kept"] for r in rows], pa.int64()),
            pa.array([r["n_blocks_dropped"] for r in rows], pa.int64()),
            bytes_emitted,
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
