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
from ray.data import Datasink as _Datasink

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


class _SizeBucketSink(_Datasink):
    """Datasink that routes each row to ``small/`` or ``giant/`` by html
    payload size in ONE pass — the ingest-time alternative to the
    flagship's ``giant_threshold`` filter routing, which reads the
    (pruned) input twice (``flagship.py`` skew note).  File names derive
    from ``(task_idx, block_ordinal)`` so a retried write task
    overwrites its own files (same idempotency contract as the
    flagship's ``_WaveSink``)."""

    def __init__(self, out_dir: str, giant_threshold: int) -> None:
        import os

        self._small = os.path.join(out_dir, "small")
        self._giant = os.path.join(out_dir, "giant")
        self._thr = giant_threshold

    @property
    def supports_distributed_writes(self) -> bool:
        return True

    def on_write_start(self) -> None:
        import os

        os.makedirs(self._small, exist_ok=True)
        os.makedirs(self._giant, exist_ok=True)

    def write(self, blocks, ctx) -> dict:
        import os

        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        from ray.data.block import BlockAccessor

        counts = {"small": 0, "giant": 0}
        for bi, block in enumerate(blocks):
            tbl = BlockAccessor.for_block(block).to_arrow()
            if tbl.num_rows == 0:
                continue
            ln = pc.fill_null(pc.binary_length(tbl["html"]), 0)
            giant_mask = pc.greater(ln, self._thr)
            fname = f"part-{ctx.task_idx:06d}-{bi:04d}.parquet"
            for d, sub in (
                (self._small, tbl.filter(pc.invert(giant_mask))),
                (self._giant, tbl.filter(giant_mask)),
            ):
                if sub.num_rows == 0:
                    continue
                pq.write_table(sub, os.path.join(d, fname))
                counts["small" if d == self._small else "giant"] += sub.num_rows
        return counts

    def on_write_complete(self, write_result) -> None:
        self.totals = {"small": 0, "giant": 0}
        for partial in write_result.write_returns:
            for k, v in partial.items():
                self.totals[k] += v


def bucket_pages_by_size(input_dir: str, out_dir: str, giant_threshold: int) -> dict:
    """ONE streaming pass over a pages parquet dir → ``out_dir/small``
    and ``out_dir/giant`` parquet sets split at ``giant_threshold``
    html bytes.  Feed ``out_dir`` to
    ``flagship.run_extraction(..., pre_bucketed=True)`` so the giant
    branch gets its own file set and the extract phase reads each input
    byte exactly once (vs the in-flight ``giant_threshold`` filter
    routing, which scans the pruned input once per branch).

    Returns ``{"small": n_rows, "giant": n_rows, "out_dir": ...}``."""
    import glob as _glob
    import os
    import shutil

    files = sorted(_glob.glob(os.path.join(input_dir, "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no parquet files under {input_dir}")
    # wipe both buckets: write filenames are task-deterministic within a
    # run but file COUNT can differ across runs, so a re-bucket into a
    # non-empty dir could strand stale files
    for sub in ("small", "giant"):
        shutil.rmtree(os.path.join(out_dir, sub), ignore_errors=True)

    sink = _SizeBucketSink(out_dir, giant_threshold)
    rd.read_parquet(files).write_datasink(sink)
    return {**sink.totals, "out_dir": out_dir}


def ingest_to_pages_parquet(input_dir: str, out_dir: str, fmt: str,
                            num_files: int | None = None) -> dict:
    """Materialize a non-parquet page source (warc/jsonl/csv directory)
    as canonical pages parquet under ``out_dir`` — the ingest half of
    the CLI's ``--input-format``: extraction's wave/resume machinery is
    file-granular over parquet shards, so foreign containers are
    converted ONCE (idempotent: a ``_DONE`` marker skips re-ingest on
    resume) and the job then runs exactly like a parquet job.

    Returns {"files": n_input_files, "rows": n_pages}."""
    import glob
    import json as _json
    import os
    import shutil

    patterns = {
        "warc": ("*.warc", "*.warc.gz"),
        "jsonl": ("*.jsonl", "*.json"),
        "csv": ("*.csv",),
    }
    if fmt not in patterns:
        raise ValueError(f"unknown input format {fmt!r}; "
                         f"expected one of {sorted(patterns)} or 'parquet'")
    files = sorted(
        f for pat in patterns[fmt]
        for f in glob.glob(os.path.join(input_dir, pat))
    )
    if not files:
        raise FileNotFoundError(
            f"no {fmt} files under {input_dir} "
            f"(patterns: {', '.join(patterns[fmt])})")

    # input identity for the skip-on-resume marker: the ingested parquet
    # file NAMES are the same for any source, so without this a re-run
    # pointed at a DIFFERENT --input (or format) would silently extract
    # yesterday's pages (same hazard class the wave manifests' params
    # guard closes).  Basenames, not mtimes: a re-download of identical
    # files must still resume.
    src = {"fmt": fmt, "input_dir": os.path.abspath(input_dir),
           "file_names": [os.path.basename(f) for f in files]}
    marker = os.path.join(out_dir, "_DONE")
    if os.path.exists(marker):
        with open(marker) as fh:
            done = _json.load(fh)
        if "src" not in done:
            pass  # legacy marker (pre-r4): can't verify → re-ingest below
        elif done["src"] != src:
            raise ValueError(
                f"ingest dir {out_dir} was produced from a different "
                f"source (marker: {done['src']['fmt']} x "
                f"{len(done['src']['file_names'])} files from "
                f"{done['src']['input_dir']}; now: {fmt} x {len(files)} "
                f"files from {src['input_dir']}) — resuming would extract "
                f"stale pages; use a fresh --output dir"
            )
        else:
            return done

    if fmt == "warc":
        from .warc import read_pages_warc

        ds = read_pages_warc(files)
    elif fmt == "jsonl":
        ds = read_pages_json(files)
    else:
        ds = read_pages_csv(files)

    shutil.rmtree(out_dir, ignore_errors=True)  # crashed partial attempt
    os.makedirs(out_dir, exist_ok=True)
    ds.write_parquet(out_dir)
    import pyarrow.parquet as pq

    rows = sum(
        pq.read_metadata(f).num_rows
        for f in glob.glob(os.path.join(out_dir, "*.parquet"))
    )
    totals = {"files": len(files), "rows": int(rows), "src": src}
    tmp = marker + ".tmp"
    with open(tmp, "w") as fh:
        _json.dump(totals, fh)
    os.replace(tmp, marker)
    return totals
