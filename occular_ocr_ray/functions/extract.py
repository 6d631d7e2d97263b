"""The per-row extraction kernel — one pure function from a ``pages``
row to an ``extracted`` row.

Graft analog of the reference's per-document dispatch + pipeline
(``ocr_skel/__init__.py:87-101``, ``pipeline.py:284-288``): a three-way
``method`` branch inside ONE function (SURVEY.md §2.2 M14), kept per-row
so Ray Data never needs a dataset split:

- ``native``  — the ``text`` column is non-null/non-empty: emit it
  (normalized per line) directly, skipping the HTML parse.  Analog of the
  PDF native-text fast path (``pipeline.py:192-226``).
- ``layout``  — the ``html`` payload carries the ``LAYOUT1`` magic
  header + JSON blocks with bboxes: XY-cut reading order.  Analog of the
  OCR branch's quad sort (``pipeline.py:242``).
- ``parsed``  — real HTML: segment → density classify → rescue →
  normalize → spans.  Analog of detect→recognize→assemble
  (``pipeline.py:47-77``).

This module is pure Python with zero Ray imports; it IS the golden
byte-identity contract and doubles as the trivially-auditable oracle that
produces the committed golden fixtures (FIXTURES.md).
"""

from __future__ import annotations

import json
from typing import Any

from .classify import classify_blocks
from .html_blocks import segment_html
from .normalize import decode_html_bytes, join_blocks, normalize_ws
from .xycut import xy_cut_order

LAYOUT_MAGIC = b"LAYOUT1\n"
LAYOUT_MAGIC_STR = "LAYOUT1\n"

# Output schema field order (FIXTURES.md "Expected output schema").
OUTPUT_COLUMNS = (
    "url",
    "extracted_text",
    "spans",
    "method",
    "n_blocks_kept",
    "n_blocks_dropped",
    "bytes_emitted",
)


def _assemble(
    url: str,
    method: str,
    kept: list[tuple[str, str, float]],  # (text, tag_path, score) in reading order
    n_dropped: int,
    compute_bytes: bool = True,
) -> dict[str, Any]:
    """Build the output row: the join + span offsets.  The ``zip`` of
    texts and scores the reference does at ``pipeline.py:66-73`` is free
    here because both live in one tuple stream (SURVEY.md §2.2 M11).

    ``compute_bytes=False`` defers ``bytes_emitted`` (-1 placeholder) to
    the batch assembler, which reads UTF-8 lengths off the Arrow string
    buffer it builds anyway — ``str.encode`` here would allocate a full
    byte copy of every extracted document purely to measure it (the
    extract kernel's 8→32 scaling wall is memory bandwidth, VERDICT r4
    #5).  The default stays exact for the golden-oracle path."""
    spans = []
    offset = 0
    for text, tag_path, score in kept:
        start = offset
        end = start + len(text)
        spans.append({"start": start, "end": end, "tag_path": tag_path, "score": score})
        offset = end + 1  # +1 for the "\n" separator
    extracted = join_blocks([t for t, _, _ in kept])
    return {
        "url": url,
        "extracted_text": extracted,
        "spans": spans,
        "method": method,
        "n_blocks_kept": len(kept),
        "n_blocks_dropped": n_dropped,
        "bytes_emitted": (len(extracted.encode("utf-8"))
                          if compute_bytes else -1),
    }


def _extract_native(url: str, text: str,
                    compute_bytes: bool = True) -> dict[str, Any]:
    """Native-text fast path: per-line normalize, skip blanks (analog of
    the ``strip()`` skip at ``pipeline.py:204``), confidence fixed 1.0
    (as the reference fixes native-text confidence, ``pipeline.py:210``)."""
    kept = []
    for line in text.split("\n"):
        norm = normalize_ws(line)
        if norm:
            kept.append((norm, "native", 1.0))
    return _assemble(url, "native", kept, 0, compute_bytes)


def _extract_layout(url: str, payload: str,
                    compute_bytes: bool = True) -> dict[str, Any]:
    """Layout path: JSON blocks with bboxes → XY-cut reading order.
    ``payload`` is the DECODED payload including the magic prefix —
    slicing the str at the (pure-ASCII) magic length is byte-identical
    to the old slice-bytes-then-decode order."""
    try:
        blocks = json.loads(payload[len(LAYOUT_MAGIC_STR):])
    except Exception:
        blocks = []
    if not isinstance(blocks, list):
        blocks = []
    bboxes = []
    texts = []
    for b in blocks:
        try:
            x0, y0, x1, y1 = (float(v) for v in b["bbox"])
            texts.append(str(b.get("text", "")))
            bboxes.append((x0, y0, x1, y1))
        except Exception:
            continue
    order = xy_cut_order(bboxes)
    kept = []
    n_dropped = 0
    for i in order:
        norm = normalize_ws(texts[i])
        if not norm:
            n_dropped += 1
            continue
        x0, y0, x1, y1 = bboxes[i]
        tag_path = f"layout/{x0:g},{y0:g},{x1:g},{y1:g}"
        kept.append((norm, tag_path, 1.0))
    return _assemble(url, "layout", kept, n_dropped, compute_bytes)


def _extract_parsed(url: str, html: str, thresholds: dict | None = None,
                    compute_bytes: bool = True) -> dict[str, Any]:
    scored = classify_blocks(segment_html(html), **(thresholds or {}))
    kept = [(s.text, s.tag_path, s.score) for s in scored if s.keep]
    n_dropped = sum(1 for s in scored if not s.keep)
    return _assemble(url, "parsed", kept, n_dropped, compute_bytes)


def extract_row(
    url: str,
    html: bytes | str | None,
    text: str | None,
    thresholds: dict | None = None,
    force_parse: bool = False,
    compute_bytes: bool = True,
) -> dict[str, Any]:
    """Extract one page.  Total and deterministic for any input row.
    ``thresholds`` (extension surface) tunes the parsed-branch
    classifier; None/empty = the frozen golden-contract defaults.
    ``force_parse`` re-extracts from the raw payload even when a native
    ``text`` layer exists (analog of the reference's ``force_ocr``,
    ``pipeline.py:94`` — the recovery path for stale/bad text columns);
    rows with no payload still fall back to the native branch.

    ``html`` may be the raw payload bytes OR an already-decoded str
    (UTF-8/replace — the actor stage decodes straight off the Arrow
    buffer to skip an intermediate ``to_pylist`` byte copy of the whole
    batch).  Branching is identical either way: the LAYOUT magic is
    pure ASCII, so a decoded payload starts with the magic STRING iff
    the raw bytes started with the magic BYTES."""
    if text and not (force_parse and html):
        return _extract_native(url, text, compute_bytes)
    if not html:
        return _extract_parsed(url, "", thresholds, compute_bytes)
    s = html if isinstance(html, str) else decode_html_bytes(html)
    if s.startswith(LAYOUT_MAGIC_STR):
        return _extract_layout(url, s, compute_bytes)
    return _extract_parsed(url, s, thresholds, compute_bytes)
