"""Range-partitioned parquet layout with a zone-map manifest —
predicate pushdown BEYOND the row group.

At 100 TB a range predicate (``price BETWEEN lo AND hi``, ``ts >=
watermark``) should not open every file: parquet row-group stats prune
WITHIN a file only after the footer is fetched, and Ray's
``read_parquet`` still schedules a task per file.  This module writes a
dataset clustered into key-range buckets (hive-style ``zb=<i>/``
directories) plus a tiny ``zonemap.json`` manifest of per-bucket
[min, max], so a reader plans from the manifest and schedules read
tasks ONLY for overlapping buckets — the other buckets never produce a
task, a footer fetch, or a byte of I/O.

Scale shape:
- boundary selection is a one-pass mergeable histogram (per-batch
  bucket counts, tiny groupby, driver-side cumulative split) — no sort,
  no sample collection of raw rows;
- the write is a single extra int64 column + ``partition_cols`` write
  (hash-free: rows move no further than their output file);
- the manifest is O(num_buckets) — bytes, not data;
- ``read_range`` is exact: manifest pruning is conservative (bucket
  ranges are TRUE min/max aggregated during the same pass), and a
  residual vectorized filter inside ``map_batches`` re-applies the
  predicate to the surviving buckets.

Reference analog: the reference prunes pages before OCR via cheap
page-level metadata (ocr_skel/pipeline.py:96-118 page iteration); this
is the storage-level equivalent for range predicates.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

_MANIFEST = "zonemap.json"
# histogram resolution for boundary selection: key values are bucketed
# at key >> _HIST_SHIFT; boundaries land on histogram-bucket edges,
# which skews bucket SIZES slightly but never correctness (the manifest
# records true min/max).
_HIST_SHIFT = 6


def _key_hist(ds: rd.Dataset, key: str) -> pd.DataFrame:
    """One-pass mergeable histogram of ``key`` (int64 domain):
    per-batch (coarse-bucket, count, min, max) partials → tiny groupby
    → driver table ordered by bucket."""
    from ray.data.aggregate import Max, Min, Sum

    def partials(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.schema([("hb", pa.int64()), ("cnt", pa.int64()),
                              ("kmin", pa.int64()),
                              ("kmax", pa.int64())]).empty_table()
        k = b.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"hb": k >> _HIST_SHIFT, "k": k})
        out = df.groupby("hb", as_index=False).agg(
            cnt=("k", "size"), kmin=("k", "min"), kmax=("k", "max"))
        out["cnt"] = out["cnt"].astype(np.int64)
        return pa.Table.from_pandas(out, preserve_index=False)

    agg = (ds.map_batches(partials, batch_format="pyarrow")
           .groupby("hb")
           .aggregate(Sum("cnt", alias_name="cnt"),
                      Min("kmin", alias_name="kmin"),
                      Max("kmax", alias_name="kmax"))
           .to_pandas())
    if agg.empty:  # zero-row input: the aggregate comes back columnless
        return pd.DataFrame({"hb": pd.Series([], dtype=np.int64),
                             "cnt": pd.Series([], dtype=np.int64),
                             "kmin": pd.Series([], dtype=np.int64),
                             "kmax": pd.Series([], dtype=np.int64)})
    return agg.sort_values("hb").reset_index(drop=True)


def write_range_partitioned(ds: rd.Dataset, path: str, key: str,
                            num_buckets: int = 16) -> dict:
    """Write ``ds`` clustered into ``num_buckets`` key-range buckets
    under ``path`` (``zb=<i>/`` hive dirs) and a ``zonemap.json``
    manifest of per-bucket true [min, max] on ``key`` (an integer-domain
    column — cents, ids, epoch seconds).  Returns the manifest dict."""
    hist = _key_hist(ds, key)
    if hist.empty:
        manifest = {"key": key, "buckets": []}
        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, _MANIFEST), "w") as f:
            json.dump(manifest, f)
        return manifest

    # boundary selection: split the cumulative histogram into
    # num_buckets ~equal-count runs; boundaries are histogram-bucket
    # UPPER edges ((hb+1) << shift), i.e. rows with key < edge go left.
    cum = hist["cnt"].cumsum()
    total = int(cum.iloc[-1])
    targets = [total * (i + 1) // num_buckets for i in range(num_buckets - 1)]
    edges: list[int] = []
    for t in targets:
        j = int(np.searchsorted(cum.to_numpy(), t, side="left"))
        edge = int((hist["hb"].iloc[min(j, len(hist) - 1)] + 1)) << _HIST_SHIFT
        if not edges or edge > edges[-1]:
            edges.append(edge)
    edges_arr = np.asarray(edges, dtype=np.int64)

    def assign(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b.append_column("zb", pa.array([], pa.int64()))
        k = b.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
        zb = np.searchsorted(edges_arr, k, side="right").astype(np.int64)
        return b.append_column("zb", pa.array(zb, pa.int64()))

    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        path, partition_cols=["zb"])

    # true per-bucket min/max from the SAME histogram (hist buckets
    # nest inside zone buckets by construction: edges are hist-bucket
    # boundaries), so no second data pass.
    hb_edge = hist["hb"].to_numpy() << _HIST_SHIFT
    hist_zb = np.searchsorted(edges_arr, hb_edge, side="right")
    buckets = []
    for zb, g in hist.groupby(hist_zb):
        buckets.append({"zb": int(zb),
                        "min": int(g["kmin"].min()),
                        "max": int(g["kmax"].max()),
                        "rows": int(g["cnt"].sum())})
    manifest = {"key": key, "buckets": sorted(buckets, key=lambda b: b["zb"])}
    with open(os.path.join(path, _MANIFEST), "w") as f:
        json.dump(manifest, f)
    return manifest


def plan_range(path: str, lo: int, hi: int) -> tuple[list[str], int]:
    """Manifest-only planning: directories whose [min, max] overlaps
    [lo, hi] (inclusive), plus the total bucket count.  No parquet
    footer is touched."""
    with open(os.path.join(path, _MANIFEST)) as f:
        manifest = json.load(f)
    dirs = [os.path.join(path, f"zb={b['zb']}")
            for b in manifest["buckets"]
            if b["min"] <= hi and b["max"] >= lo]
    return dirs, len(manifest["buckets"])


def read_range(path: str, lo: int, hi: int,
               columns: list[str] | None = None) -> rd.Dataset:
    """Read only the buckets overlapping [lo, hi] and re-apply the
    exact predicate as a vectorized residual filter.  An empty plan
    returns an empty dataset with the manifest's key column."""
    dirs, _ = plan_range(path, lo, hi)
    with open(os.path.join(path, _MANIFEST)) as f:
        key = json.load(f)["key"]
    if not dirs:
        return rd.from_arrow(
            pa.schema([(key, pa.int64())]).empty_table())
    # expand bucket dirs to files: ray's list-of-paths read expects
    # file paths, and explicit files also skip partition re-inference
    files = []
    for d in dirs:
        files.extend(sorted(
            os.path.join(d, f) for f in os.listdir(d)
            if f.endswith(".parquet")))
    cols = None
    if columns is not None:
        cols = list(dict.fromkeys([*columns, key]))
    ds = rd.read_parquet(files, columns=cols)

    def residual(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return b
        k = b.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
        mask = (k >= lo) & (k <= hi)
        return b.filter(pa.array(mask))

    return ds.map_batches(residual, batch_format="pyarrow")
