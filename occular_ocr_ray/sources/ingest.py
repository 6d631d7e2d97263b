"""Ingestion of non-parquet page sources into the canonical ``pages``
schema (SURVEY.md §2.1 S1/S2 generalization: the reference dispatches on
file suffix, ``pipeline.py:284-288``; the graft dispatches on container
format and normalizes to ONE schema so every downstream stage is
format-agnostic).

Supported: JSONL (``html`` base64 or plain text field) and CSV (text
pages only — CSV cannot carry raw binary safely).  Both return a
Dataset with exactly ``PAGES_SCHEMA`` columns.
"""

from __future__ import annotations

import base64

import pyarrow as pa
import ray.data as rd

from .pages import PAGES_SCHEMA


def _normalize_batch(batch: pa.Table) -> pa.Table:
    """Coerce a loosely-typed ingested batch to PAGES_SCHEMA: missing
    columns become nulls; ``html_b64`` decodes to binary; ``warc_ts``
    accepts epoch micros or ISO strings."""
    n = batch.num_rows
    cols = {name: None for name in PAGES_SCHEMA.names}

    def get(name):
        return batch[name] if name in batch.column_names else None

    url = get("url")
    cols["url"] = url.cast(pa.string()) if url is not None else pa.nulls(n, pa.string())

    if "html_b64" in batch.column_names:
        raw = [
            base64.b64decode(v) if v is not None else None
            for v in batch["html_b64"].to_pylist()
        ]
        cols["html"] = pa.array(raw, pa.binary())
    elif "html" in batch.column_names:
        h = batch["html"]
        if pa.types.is_binary(h.type) or pa.types.is_large_binary(h.type):
            cols["html"] = h.cast(pa.binary())
        else:  # string html → utf-8 bytes
            cols["html"] = pa.array(
                [v.encode("utf-8") if v is not None else None for v in h.to_pylist()],
                pa.binary(),
            )
    else:
        cols["html"] = pa.nulls(n, pa.binary())

    t = get("text")
    cols["text"] = t.cast(pa.string()) if t is not None else pa.nulls(n, pa.string())
    lang = get("lang")
    cols["lang"] = lang.cast(pa.string()) if lang is not None else pa.nulls(n, pa.string())

    ts = get("warc_ts")
    if ts is None:
        cols["warc_ts"] = pa.nulls(n, pa.timestamp("us"))
    elif pa.types.is_timestamp(ts.type):
        cols["warc_ts"] = ts.cast(pa.timestamp("us"))
    elif pa.types.is_integer(ts.type):
        cols["warc_ts"] = ts.cast(pa.int64()).cast(pa.timestamp("us"))
    else:
        import datetime as dt

        vals = []
        for v in ts.to_pylist():
            try:
                vals.append(dt.datetime.fromisoformat(v) if v else None)
            except ValueError:
                vals.append(None)
        cols["warc_ts"] = pa.array(vals, pa.timestamp("us"))

    arrays = [
        cols[name] if hasattr(cols[name], "type") else cols[name]
        for name in PAGES_SCHEMA.names
    ]
    arrays = [
        a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in arrays
    ]
    return pa.Table.from_arrays(arrays, schema=PAGES_SCHEMA)


def read_pages_json(paths) -> rd.Dataset:
    """JSONL shards → pages Dataset (html via ``html_b64`` field)."""
    return rd.read_json(paths).map_batches(_normalize_batch, batch_format="pyarrow")


def read_pages_csv(paths) -> rd.Dataset:
    """CSV shards (text pages) → pages Dataset."""
    return rd.read_csv(paths).map_batches(_normalize_batch, batch_format="pyarrow")
