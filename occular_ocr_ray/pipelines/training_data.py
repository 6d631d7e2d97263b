"""End-to-end training-data corpus pipeline — the composition a
large-scale pretraining-data user runs daily, built entirely from this
engine's stages:

    pages parquet
      → main-content extraction (flagship stage, zero-copy Arrow)
      → text analysis (tokens, lang-id, quality, fingerprints)
      → quality + language filter (vectorized)
      → exact dedup (hash-partition on md5, keep first url)
      → MinHash-LSH near-dup drop (signature-only shuffle + union-find)
      → corpus + per-stage funnel metrics

Every stage is streaming `map_batches`; the only shuffles are the two
dedup groupbys, both over fingerprint/signature rows — never the corpus
text.  Funnel counts are exact and returned with the corpus so silent
drops are impossible (ray_guide "No silent caps").

Scale shape of the near-dup drop: only the DROP-set (non-representative
cluster members — the duplicates themselves, not the surviving corpus)
ever reaches the driver; it is broadcast once via ``ray.put`` and each
worker builds its Arrow value-set once (cached per ObjectRef), so the
anti-filter ships an ObjectRef per task, not a Python set per batch.
Multi-consumer stages checkpoint to parquet (resumable, object-store
friendly) instead of pinning the corpus with ``materialize()``.
"""

from __future__ import annotations

import glob as _glob
import hashlib as _hashlib
import os
import uuid

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..stages.dedup import minhash_lsh_pairs, neardup_drop_ids
from ..stages.extractor import DensityExtractor
from ..stages.text_analysis import TextStats

# per-worker cache (FIFO, max 4): each live run's broadcast drop-set is
# fetched + converted once per worker, not per batch.  Bounded so
# long-lived Ray workers don't accumulate one pinned array per
# historical run; >1 entry so two concurrent pipelines sharing a worker
# don't evict each other every batch.
_DROP_SET_CACHE: dict[str, pa.Array] = {}
_DROP_SET_CACHE_MAX = 4


# schema of the analyzed stream (extract → TextStats), used as the
# explicit fallback when an EMPTY checkpoint must persist a schema-only
# parquet file (schema inference over an all-empty map_groups output is
# not guaranteed)
_ANALYZED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("extracted_text", pa.string()),
        ("n_tokens", pa.int64()),
        ("n_bpe_tokens", pa.int64()),
        ("pred_lang", pa.string()),
        ("quality", pa.float64()),
        ("fp_md5", pa.string()),
        ("fp_rolling", pa.int64()),
    ]
)
_EXACT_KEPT_SCHEMA = _ANALYZED_SCHEMA.append(pa.field("row_id", pa.int64()))


def _checkpoint(ds: rd.Dataset, path: str, key: str,
                fallback_schema: pa.Schema | None = None) -> rd.Dataset:
    """Write a multi-consumer intermediate to parquet and re-read it:
    downstream consumers each stream from disk instead of recomputing
    lineage or pinning the whole stage output in the object store.

    Resume-safe: a completed checkpoint whose marker carries the SAME
    parameter key is reused as-is; anything else (crashed half-write,
    stale prior run, a run with different filter parameters) is wiped
    first — Ray's write filenames carry a fresh uuid per run, so writing
    into a non-empty dir would otherwise mix generations and duplicate
    rows on re-read, and a parameterless marker would silently serve a
    checkpoint built under different thresholds.  The marker commits
    only after the write returns (same durability order as the flagship
    wave manifests)."""
    import shutil

    marker = f"{path.rstrip('/')}.done.{key}"  # sibling: the data dir
    if os.path.exists(marker):                 # holds only parquet files
        return rd.read_parquet(path)
    shutil.rmtree(path, ignore_errors=True)
    for stale in _glob.glob(path.rstrip("/") + ".done.*"):
        os.remove(stale)
    ds.write_parquet(path)
    if not _glob.glob(os.path.join(path, "*.parquet")):
        # all rows filtered out → write_parquet emitted ZERO files; a
        # re-read would raise.  Persist a schema-only file so the empty
        # checkpoint round-trips (strict filters must yield an empty
        # corpus, not a crash).
        import pyarrow.parquet as _pq

        from ..stages.joins import _arrow_schema

        schema = fallback_schema
        if schema is None:
            schema = _arrow_schema(ds)
        os.makedirs(path, exist_ok=True)
        _pq.write_table(schema.empty_table(),
                        os.path.join(path, "empty-0000.parquet"))
    out = rd.read_parquet(path)
    # marker commits only after the re-read succeeds (file listing +
    # schema resolution) — a half-written checkpoint must not be blessed
    with open(marker, "w") as fh:
        fh.write("ok")
    return out


def build_corpus(
    pages: rd.Dataset,
    *,
    min_quality: float = 0.35,
    min_tokens: int = 20,
    langs: tuple[str, ...] = (),
    neardup_threshold: float = 0.8,
    batch_size: int = 32,
    checkpoint_dir: str | None = None,
    drop_strategy: str = "broadcast",
) -> tuple[rd.Dataset, dict]:
    """pages (url, html, text) → (corpus Dataset, funnel metrics).

    Returns the corpus as a streaming Dataset of
    (url, extracted_text, n_tokens, pred_lang, quality) plus a funnel
    dict with exact counts at every stage boundary.

    ``checkpoint_dir`` identity must track the INPUT: a completed
    checkpoint is reused as-is on re-run (the resume contract), and its
    marker encodes the filter parameters — changed thresholds invalidate
    it automatically, but a changed input dataset does not, so feed a
    fresh dir (or the default per-run dir) when the input changes.
    """
    if drop_strategy not in ("broadcast", "anti_join"):
        # validate before any execution — a typo must fail in
        # milliseconds, not after the extract pipeline has run
        raise ValueError(
            f"unknown drop_strategy {drop_strategy!r}; use 'broadcast' or 'anti_join'"
        )
    funnel: dict[str, int] = {}
    funnel["input_rows"] = pages.count()

    extracted = pages.map_batches(
        DensityExtractor(), batch_format="pyarrow", batch_size=batch_size
    ).map_batches(
        lambda b: b.filter(pc.greater(pc.utf8_length(b["extracted_text"]), 0)),
        batch_format="pyarrow",
    )

    analyzed = extracted.select_columns(["url", "extracted_text"]).map_batches(
        TextStats(text_col="extracted_text"), batch_format="pyarrow", batch_size=256
    )

    def quality_filter(b: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.greater_equal(b["quality"], min_quality),
            pc.greater_equal(b["n_tokens"], min_tokens),
        )
        if langs:
            mask = pc.and_(mask, pc.is_in(b["pred_lang"], value_set=pa.array(langs)))
        return b.filter(mask)

    filtered = analyzed.map_batches(quality_filter, batch_format="pyarrow")
    # checkpoint once: three downstream consumers (exact dedup keys,
    # near-dup signatures, final corpus filter) would otherwise recompute
    # the whole extract+analyze lineage per consumer.  Parquet, not
    # materialize(): at corpus scale a pinned object-store copy is a
    # spill storm; a parquet checkpoint streams back per consumer and is
    # the resume point a failed run restarts from.
    if checkpoint_dir is None:
        checkpoint_dir = f"/tmp/occular_corpus_ckpt/{uuid.uuid4().hex[:12]}"
    params_key = _hashlib.md5(
        repr((min_quality, min_tokens, tuple(langs), batch_size)).encode()
    ).hexdigest()[:12]
    filtered = _checkpoint(filtered, os.path.join(checkpoint_dir, "filtered"),
                           params_key, fallback_schema=_ANALYZED_SCHEMA)
    funnel["after_extract_and_quality"] = filtered.count()

    # Exact row dedup: THE one corpus shuffle — hash-group rows by
    # content fingerprint, keep the lexicographically-first url per
    # group (deterministic).  Coarse-grouped (fp prefix mod prime) so
    # map_groups overhead is amortized, same as stages/dedup.py.
    def add_fp(b: pa.Table) -> pa.Table:
        import hashlib

        fps = [
            hashlib.md5(t.encode()).hexdigest()
            for t in b["extracted_text"].to_pylist()
        ]
        coarse = [int(f[:8], 16) % 199 for f in fps]
        b = b.append_column("fp", pa.array(fps, pa.string()))
        return b.append_column("coarse", pa.array(coarse, pa.int32()))

    def keep_first(cg: pd.DataFrame) -> pd.DataFrame:
        cg = cg.sort_values(["fp", "url"], kind="mergesort")
        return cg.drop_duplicates("fp", keep="first").drop(columns=["fp", "coarse"])

    exact_kept = _checkpoint(
        filtered.map_batches(add_fp, batch_format="pyarrow")
        .groupby("coarse")
        .map_groups(keep_first, batch_format="pandas")
        .map_batches(_with_int_id, batch_format="pyarrow"),
        os.path.join(checkpoint_dir, "exact_kept"), params_key,
        fallback_schema=_EXACT_KEPT_SCHEMA,
    )
    funnel["after_exact_dedup"] = exact_kept.count()

    # Near-dup drop: pair graph → cluster → DROP-set (duplicates only,
    # ≪ corpus) → broadcast anti-filter.  The surviving corpus never
    # reaches the driver.
    pairs = minhash_lsh_pairs(
        exact_kept.select_columns(["row_id", "extracted_text"]),
        id_col="row_id",
        text_col="extracted_text",
        threshold=neardup_threshold,
    )
    if drop_strategy == "anti_join":
        # dup-heavy regime: the drop-set itself may outgrow a broadcast —
        # distributed CC labels → bucketed anti-join; nothing corpus- or
        # drop-set-sized touches the driver.
        from ..stages.dedup import anti_join_ids, neardup_drop_ids_dataset

        drop_ds = neardup_drop_ids_dataset(pairs)
        corpus = (
            exact_kept
            if drop_ds is None
            else anti_join_ids(exact_kept, drop_ds, id_col="row_id", drop_col="id")
        )
    else:
        drop_df = neardup_drop_ids(pairs, strategy="driver")
        drop_ref = ray.put(drop_df["id"].to_numpy(dtype="int64"))
        corpus = exact_kept.map_batches(_drop_ids_fn(drop_ref), batch_format="pyarrow")
    corpus = corpus.select_columns(
        ["url", "extracted_text", "n_tokens", "pred_lang", "quality"]
    )
    funnel["corpus_rows"] = corpus.count()
    return corpus, funnel


def _with_int_id(b: pa.Table) -> pa.Table:
    """Stable integer row id from the url (crc-free: blake2b mod 2^62)
    — dedup stages key on int64 ids."""
    import hashlib
    import struct

    if "row_id" in b.column_names:
        return b
    ids = [
        struct.unpack("<q", hashlib.blake2b(u.encode(), digest_size=8).digest())[0]
        & 0x3FFFFFFFFFFFFFFF
        for u in b["url"].to_pylist()
    ]
    return b.append_column("row_id", pa.array(ids, pa.int64()))


def _drop_ids_fn(drop_ref):
    """Anti-filter against the broadcast drop-set: the ObjectRef ships
    with each task (bytes); the numpy array is fetched from the object
    store and converted to an Arrow value-set ONCE per worker process
    (module-level cache), never per batch."""

    def f(b: pa.Table) -> pa.Table:
        key = drop_ref.hex()
        arr = _DROP_SET_CACHE.get(key)
        if arr is None:
            arr = pa.array(ray.get(drop_ref), pa.int64())
            while len(_DROP_SET_CACHE) >= _DROP_SET_CACHE_MAX:
                _DROP_SET_CACHE.pop(next(iter(_DROP_SET_CACHE)))
            _DROP_SET_CACHE[key] = arr
        return b.filter(pc.invert(pc.is_in(b["row_id"], value_set=arr)))

    return f


def corpus_pipeline_q(sf_dir: str) -> pd.DataFrame:
    """Driver query: run the full corpus pipeline over the synthetic
    pages table and return the per-url corpus summary + funnel (rows-only
    check; the funnel is appended as pseudo-rows with url='__funnel::k')."""
    import os

    from ..sources.pages import write_pages

    tier = os.path.basename(sf_dir.rstrip("/"))
    n_rows = {"sf0.001": 400, "sf0.01": 800, "sf0.1": 1600}.get(tier, 400)
    cache = f"/tmp/graft_pages/{tier}_{n_rows}"
    if not os.path.exists(os.path.join(cache, "pages_0000.parquet")):
        write_pages(cache, n_rows, seed=42, num_files=8)
    pages = rd.read_parquet(cache, columns=["url", "html", "text"])
    import shutil

    ckpt = f"/tmp/occular_corpus_ckpt/q_{tier}"
    shutil.rmtree(ckpt, ignore_errors=True)
    corpus, funnel = build_corpus(pages, checkpoint_dir=ckpt)
    out = corpus.select_columns(["url", "n_tokens", "pred_lang"]).to_pandas()
    out["quality_bucket"] = ""
    rows = [out]
    for k, v in funnel.items():
        rows.append(
            pd.DataFrame(
                {"url": [f"__funnel::{k}"], "n_tokens": [v], "pred_lang": [""],
                 "quality_bucket": [""]}
            )
        )
    return (
        pd.concat(rows, ignore_index=True)
        .sort_values("url")
        .reset_index(drop=True)
    )
