"""Continuous crawl ingestion: ordered increments of a web crawl →
extraction → cross-run exact dedup → append-only partitioned corpus.

This is the streaming-ingest composition the individual pieces were
built for: ``sources.warc`` / ``sources.ingest`` produce pages
Datasets, ``pipelines.flagship.extract_dataset`` turns pages into
extracted text, and ``state.incremental.IncrementalDeduper`` is the
cross-run fingerprint index that makes "drop anything ANY earlier
increment already admitted" possible without re-reading history.

Scale shape (the 100-TB story):
- Each increment streams independently: pages → extract (actor/task
  ``map_batches``) → dedup filter (one RPC per index shard per batch)
  → ``write_parquet`` into its OWN ``increment=<id>/`` directory.
  Nothing ever re-reads the historical corpus; the only cross-increment
  state is the fingerprint index (bounded: 16-byte digest per distinct
  document, sharded over zero-CPU actors).
- The corpus is append-only and partitioned by increment — a committed
  increment's files are never rewritten.

Commit protocol (crash-replay safe):
- The durable commit unit is the index SNAPSHOT.  After an increment is
  processed, its marker (``done/<id>.json``) is written; every
  ``snapshot_every`` increments (and always on the last) the index is
  snapshotted to ``index/post_<id>/`` BEFORE the marker.  A marker is
  only trusted across runs if it is covered by a snapshot at or after
  it — markers newer than the newest snapshot describe admissions that
  lived only in actor memory.
- Every call rebuilds the index from the newest committed snapshot and
  INVALIDATES (marker + corpus dir removed, then reprocessed) any
  increment committed after it.  A crash mid-increment, between corpus
  write and marker, between snapshot and marker, or a full cluster
  restart all heal the same way: replay from the last snapshot.  With
  ``snapshot_every=K`` a restart replays at most K−1 increments —
  the snapshot-cost/replay-cost knob for the 1 B-fingerprint regime.

Which duplicate ROW survives follows arrival order within an increment
(see ``state.incremental`` semantics); totals and the admitted CONTENT
set are deterministic — the tested invariant.

Reference analog: the reference processes one directory per CLI run
(``ocr_skel/cli.py``) with no memory across runs; this module is the
cross-run extension its registry cache (``registry.py:14-16``) hints at.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Callable

import ray.data as rd

from ..state.incremental import IncrementalDeduper


def _marker_path(work_dir: str, iid: str) -> str:
    return os.path.join(work_dir, "done", f"{iid}.json")


def _snap_dir(work_dir: str, iid: str) -> str:
    return os.path.join(work_dir, "index", f"post_{iid}")


def _latest_committed_snapshot(work_dir: str, ids: list[str]) -> str | None:
    """Increment id of the newest snapshot that is COMMITTED (its own
    marker present) — orphan snapshots from crashed attempts between
    snapshot and marker are ignored (their increment replays)."""
    best = None
    for iid in ids:
        if os.path.exists(_marker_path(work_dir, iid)) and os.path.exists(
                os.path.join(_snap_dir(work_dir, iid), "meta.json")):
            best = iid
    return best


def run_crawl_ingest(
    increments: list[tuple[str, Callable[[], rd.Dataset]]],
    work_dir: str,
    *,
    transform: Callable[[rd.Dataset], rd.Dataset] | None = None,
    text_col: str = "extracted_text",
    num_shards: int = 8,
    snapshot_every: int = 1,
) -> dict:
    """Process crawl ``increments`` (ordered ``(id, pages_factory)``
    pairs — factories so skipped increments cost zero reads) into an
    append-only deduplicated corpus under ``work_dir``.

    ``transform`` maps a pages Dataset to the rows to admit (default:
    ``flagship.extract_dataset``); dedup fingerprints ``text_col`` of
    the TRANSFORMED rows.  Re-running with the same arguments is
    idempotent: committed increments are skipped, uncommitted ones
    replayed.  Returns per-increment counts (``status`` ∈
    {"ran", "skipped"}).

    Layout: ``corpus/increment=<id>/*.parquet`` (the corpus),
    ``index/post_<id>/`` (index snapshots), ``done/<id>.json``
    (commit markers, written last).
    """
    if transform is None:
        from .flagship import extract_dataset
        transform = extract_dataset
    ids = [iid for iid, _ in increments]
    if len(set(ids)) != len(ids):
        raise ValueError("increment ids must be unique")
    for sub in ("corpus", "index", "done"):
        os.makedirs(os.path.join(work_dir, sub), exist_ok=True)

    # Rebuild the index from the newest committed snapshot; anything
    # committed after it was admitted only into (now possibly dead)
    # actor memory — invalidate so it replays against the restored state.
    anchor = _latest_committed_snapshot(work_dir, ids)
    past_anchor = anchor is None
    for iid in ids:
        if past_anchor:
            m = _marker_path(work_dir, iid)
            if os.path.exists(m):
                os.remove(m)
            out = os.path.join(work_dir, "corpus", f"increment={iid}")
            if os.path.exists(out):
                shutil.rmtree(out)
        if iid == anchor:
            past_anchor = True
    deduper = (IncrementalDeduper.load(_snap_dir(work_dir, anchor))
               if anchor else
               IncrementalDeduper(num_shards=num_shards, text_col=text_col))

    results: dict[str, dict] = {}
    since_snapshot = 0
    try:
        for pos, (iid, factory) in enumerate(increments):
            marker = _marker_path(work_dir, iid)
            if os.path.exists(marker):
                with open(marker) as fh:
                    results[iid] = json.load(fh) | {"status": "skipped"}
                continue

            admitted_ds = deduper.dedup(transform(factory()))
            admitted = admitted_ds.count()
            out_dir = os.path.join(work_dir, "corpus", f"increment={iid}")
            if os.path.exists(out_dir):  # crashed attempt's partial files
                shutil.rmtree(out_dir)
            if admitted:
                admitted_ds.write_parquet(out_dir)

            # Commit: snapshot first (when due), marker last.
            since_snapshot += 1
            do_snap = since_snapshot >= snapshot_every or pos == len(increments) - 1
            if do_snap:
                deduper.save(_snap_dir(work_dir, iid))
                since_snapshot = 0
            counts = {"increment": iid, "admitted": admitted,
                      "index_total": deduper.index_size(),
                      "snapshot": do_snap}
            tmp = marker + ".tmp"
            with open(tmp, "w") as fh:
                json.dump(counts, fh)
            os.replace(tmp, marker)
            results[iid] = counts | {"status": "ran"}
    finally:
        deduper.shutdown()
    return results


def read_corpus(work_dir: str, columns: list[str] | None = None) -> rd.Dataset:
    """The accumulated corpus as one Dataset (glob files, not dirs —
    ``read_parquet`` rejects directory lists)."""
    import glob

    files = sorted(glob.glob(os.path.join(work_dir, "corpus", "*", "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no corpus parquet under {work_dir}/corpus")
    return rd.read_parquet(files, columns=columns)


def crawl_ingest_q(sf_dir: str):
    """Driver-contract query: two overlapping crawl increments over the
    ``documents`` table (doc_id ≡ 0 mod 2, then mod 3 — the mod-6 docs
    overlap) through the full commit protocol; per-increment admitted
    counts are the deterministic surface (cross-run dedup totals =
    distinct content, independent of arrival order)."""
    import tempfile

    import pandas as pd
    import pyarrow as pa

    work = os.path.join(
        tempfile.gettempdir(),
        f"crawl_ingest_q_{os.path.basename(os.path.normpath(sf_dir))}",
    )
    shutil.rmtree(work, ignore_errors=True)

    def inc(mod: int):
        def keep(b: pa.Table) -> pa.Table:
            return b.filter(pa.array(b["doc_id"].to_numpy() % mod == 0))

        return lambda: (
            rd.read_parquet(f"{sf_dir}/documents.parquet",
                            columns=["doc_id", "text"])
            .map_batches(keep, batch_format="pyarrow")
        )

    res = run_crawl_ingest(
        [("inc1", inc(2)), ("inc2", inc(3))], work,
        transform=lambda ds: ds, text_col="text", num_shards=4,
    )
    return pd.DataFrame(
        {"increment": ["inc1", "inc2"],
         "admitted": pd.array(
             [res["inc1"]["admitted"], res["inc2"]["admitted"]],
             dtype="int64")}
    )
