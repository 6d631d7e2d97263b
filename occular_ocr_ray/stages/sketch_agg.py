"""Distributed approximate COUNT(DISTINCT) via mergeable HLL sketches.

Scale shape (ray_guide "Aggregation at scale" sketch pattern): each
batch emits ONE serialized sketch row per group key; a tiny groupby
merges the fixed-size registers (element-wise max).  The shuffle moves
2^b bytes per (batch, key) — never the distinct keys themselves, which
is what makes COUNT(DISTINCT) feasible at 10^12 rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions import sketches as sk


def approx_distinct(
    ds,
    key_col: str,
    value_col: str,
    *,
    b: int = 12,
    batch_size: int = 4096,
) -> pd.DataFrame:
    """Per-``key_col`` approximate distinct count of ``value_col``.
    Returns (key, approx_distinct) sorted by key; standard error
    ≈ 1.04/sqrt(2^b) (~1.6% at b=12)."""

    def batch_sketches(batch: pa.Table) -> pa.Table:
        # group-by-key via one Arrow sort + run-boundary scan (no pandas
        # frame build per batch); values convert to Python once, as the
        # HLL hash consumes Python objects anyway
        import pyarrow.compute as pc

        idx = pc.sort_indices(batch[key_col])
        k_np = batch[key_col].take(idx).to_numpy(zero_copy_only=False)
        vals = batch[value_col].take(idx).to_pylist()
        bounds = [0, *(np.flatnonzero(k_np[1:] != k_np[:-1]) + 1), len(k_np)]
        keys, blobs = [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            if s == e:
                continue
            reg = sk.hll_create(b)
            sk.hll_add(reg, vals[s:e])
            keys.append(k_np[s])
            blobs.append(reg.tobytes())
        return pa.table(
            {
                key_col: pa.array(keys),
                "sketch": pa.array(blobs, pa.binary()),
            }
        )

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        reg = sk.hll_create(b)
        for blob in g["sketch"]:
            reg = sk.hll_merge(reg, np.frombuffer(blob, dtype=np.uint8))
        return pd.DataFrame(
            {
                key_col: [g[key_col].iloc[0]],
                "approx_distinct": [int(round(sk.hll_estimate(reg)))],
            }
        )

    out = (
        ds.map_batches(batch_sketches, batch_format="pyarrow", batch_size=batch_size)
        .groupby(key_col)
        .map_groups(merge_group, batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values(key_col).reset_index(drop=True)


# --- mergeable log-bucket histogram quantiles --------------------------
_GAMMA = 1.01
_LOG_GAMMA = float(np.log(_GAMMA))
_UNDERFLOW = np.iinfo(np.int64).min // 2  # bucket for values <= 0


def _mg_compress(counts: dict, capacity: int) -> dict:
    """Misra-Gries decrement step: keep ≤ ``capacity`` counters by
    subtracting the (capacity+1)-th largest count from all and dropping
    the non-positive — each surviving estimate undercounts by at most
    the total decremented amount (≤ n/(capacity+1) overall, and the
    bound survives merging; Agarwal et al., "Mergeable Summaries",
    PODS 2012)."""
    if len(counts) <= capacity:
        return counts
    d = sorted(counts.values(), reverse=True)[capacity]
    return {k: c - d for k, c in counts.items() if c > d}


def topk_by_frequency(
    ds,
    col: str,
    *,
    k: int = 10,
    capacity: int = 4096,
    tokenize=str.split,
    batch_size: int = 1024,
) -> pd.DataFrame:
    """EXACT top-k most frequent tokens via a two-pass sketch+verify:

    1. **Candidate pass** — each batch tokenizes locally, counts
       exactly, compresses to a Misra-Gries sketch of ``capacity``
       counters, and emits ONE row (token list + count list + batch
       token total).  The driver OR-folds the partials streaming
       (``iter_batches``, one dict accumulator — same fold shape as
       ``bloom.build_bloom``), re-compressing after each merge.  Every
       token with true count > n/(capacity+1) is guaranteed present.
    2. **Verify pass** — the candidate set (≤ capacity tokens) is
       broadcast via ``ray.put``; each batch emits exact counts for
       candidates only; a tiny groupby sums them.  Top-k is taken with
       a deterministic tie-break (count desc, token asc).

    The result is EXACT whenever the k-th count strictly exceeds the
    sketch error bound n/(capacity+1) — checked at runtime, raising
    ``ValueError`` (raise ``capacity``) instead of silently returning a
    possibly-wrong tail.  Shuffle volume: stage 1 moves one
    ≤ capacity-entry row per batch; stage 2 moves ≤ capacity rows per
    batch — never the corpus.
    """
    from collections import Counter

    import pyarrow as pa
    import ray

    def partial_sketch(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        n = 0
        for text in batch[col].to_pylist():
            toks = tokenize(text) if text else []
            n += len(toks)
            c.update(toks)
        mg = _mg_compress(dict(c), capacity)
        return pa.table({
            "tokens": pa.array([list(mg.keys())], pa.list_(pa.string())),
            "counts": pa.array([list(mg.values())], pa.list_(pa.int64())),
            "n": pa.array([n], pa.int64()),
            "lossless": pa.array([len(mg) == len(c)], pa.bool_()),
        })

    acc: dict = {}
    n_total = 0
    compressed = False  # False ⇒ candidates = complete vocabulary ⇒ exact
    partials = ds.map_batches(partial_sketch, batch_format="pyarrow",
                              batch_size=batch_size)
    for b in partials.iter_batches(batch_format="pyarrow"):
        for toks, cnts, n, lossless in zip(b["tokens"].to_pylist(),
                                           b["counts"].to_pylist(),
                                           b["n"].to_pylist(),
                                           b["lossless"].to_pylist()):
            compressed = compressed or not lossless
            for t, c in zip(toks, cnts):
                acc[t] = acc.get(t, 0) + c
            if len(acc) > capacity:
                acc = _mg_compress(acc, capacity)
                compressed = True
            n_total += n

    if not acc:
        return pd.DataFrame({"token": pd.Series([], dtype=str),
                             "cnt": pd.Series([], dtype=np.int64)})

    cand_ref = ray.put(frozenset(acc))

    def exact_counts(batch: pa.Table) -> pa.Table:
        cand = ray.get(cand_ref)
        c: Counter = Counter()
        for text in batch[col].to_pylist():
            if text:
                c.update(t for t in tokenize(text) if t in cand)
        return pa.table({"token": pa.array(list(c.keys()), pa.string()),
                         "cnt": pa.array(list(c.values()), pa.int64())})

    from ray.data.aggregate import Sum

    exact = (
        ds.map_batches(exact_counts, batch_format="pyarrow",
                       batch_size=batch_size)
        .groupby("token").aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    exact = exact.sort_values(["cnt", "token"],
                              ascending=[False, True]).reset_index(drop=True)
    top = exact.head(k).copy()
    bound = n_total / (capacity + 1)
    kth = float(top["cnt"].iloc[-1]) if len(top) == k else 0.0
    if compressed and kth <= bound:
        raise ValueError(
            f"top-{k} not certifiably exact: k-th confirmed count {kth:.0f}"
            f" <= error bound {bound:.1f}; raise capacity (= {capacity})"
        )
    top["cnt"] = top["cnt"].astype(np.int64)
    return top.reset_index(drop=True)


def _cms_hashes(items: list) -> tuple[np.ndarray, np.ndarray]:
    """One 128-bit blake2b per item → two uint64 halves; depth-d CMS row
    indices derive as (h1 + d·h2) mod width (Kirsch–Mitzenmacher double
    hashing), so hashing cost is one digest per DISTINCT item per batch
    regardless of sketch depth.  Stable across processes (never
    PYTHONHASHSEED-dependent — a mergeable sketch hard-requires that)."""
    import hashlib
    import struct

    h1 = np.empty(len(items), dtype=np.uint64)
    h2 = np.empty(len(items), dtype=np.uint64)
    for i, t in enumerate(items):
        d = hashlib.blake2b(t.encode("utf-8"), digest_size=16).digest()
        h1[i], h2[i] = struct.unpack("<QQ", d)
    return h1, h2


def heavy_hitters(
    ds,
    col: str,
    *,
    phi: float = 0.001,
    width: int = 8192,
    depth: int = 4,
    tokenize=None,
    batch_size: int = 4096,
) -> pd.DataFrame:
    """EXACT φ-heavy-hitters: every item whose frequency is ≥ φ·N, via a
    pigeonhole candidate pass + mergeable count-min-sketch prune + exact
    verify — the skewed-key detector a 100-TB join planner / hot-token
    scan needs (complement to ``topk_by_frequency``: threshold-based,
    not rank-based).

    1. **Candidate pass** — each batch counts locally (exact) and emits
       items with local count ≥ φ·n_batch, plus one fixed-size count-min
       sketch (Cormode & Muthukrishnan 2005) and its token total.  By
       averaging, any item with global count ≥ φ·N must clear the local
       bar in ≥ 1 batch, so candidate recall is total.  The shuffle
       moves ≤ ⌈1/φ⌉ candidate strings + depth·width int64 per batch —
       never the corpus.
    2. **Driver fold** — CMS matrices merge by element-wise SUM
       (streaming ``iter_batches``, same fold shape as
       ``topk_by_frequency``); candidates whose merged CMS estimate
       (min over rows) is < φ·N are pruned — CMS never underestimates,
       so pruning is lossless.
    3. **Verify pass** — the pruned candidate set broadcasts via
       ``ray.put``; batches emit exact counts for candidates only; a
       tiny groupby sums and the φ·N filter is applied on TRUE counts.

    The output is therefore exact for any ``width``/``depth`` — the
    sketch only controls how many false candidates survive to the
    verify pass.  Items are keyed by their canonical ``str()`` form
    (callers cast back; mixed-type columns would collide otherwise).
    Returns (item:str, cnt:int64) sorted by cnt desc, item asc.
    Reference analog: confidence-thresholded block keep,
    ocr_skel/heuristics.py — same certify-then-emit discipline.
    """
    from collections import Counter

    import ray

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch[col].to_pylist()
        c: Counter = Counter()
        if tokenize is None:
            c.update(str(v) for v in vals if v is not None)
        else:
            for v in vals:
                if v:
                    c.update(tokenize(v))
        n = sum(c.values())
        toks = [str(t) for t in c.keys()]
        cnts = np.fromiter(c.values(), dtype=np.int64, count=len(c))
        cms = np.zeros((depth, width), dtype=np.int64)
        cand: list[str] = []
        if toks:
            h1, h2 = _cms_hashes(toks)
            w = np.uint64(width)
            for d in range(depth):
                idx = ((h1 + np.uint64(d) * h2) % w).astype(np.int64)
                np.add.at(cms[d], idx, cnts)
            keep = cnts.astype(np.float64) >= phi * n
            cand = [t for t, m in zip(toks, keep) if m]
        return pa.table({
            "cand": pa.array([cand], pa.list_(pa.string())),
            "cms": pa.array([cms.tobytes()], pa.binary()),
            "n": pa.array([n], pa.int64()),
        })

    cms_total = np.zeros((depth, width), dtype=np.int64)
    cand_all: set[str] = set()
    n_total = 0
    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=batch_size)
    for b in partials.iter_batches(batch_format="pyarrow"):
        for cand, blob, n in zip(b["cand"].to_pylist(), b["cms"].to_pylist(),
                                 b["n"].to_pylist()):
            cms_total += np.frombuffer(blob, dtype=np.int64).reshape(
                depth, width)
            cand_all.update(cand)
            n_total += n

    empty = pd.DataFrame({"item": pd.Series([], dtype=str),
                          "cnt": pd.Series([], dtype=np.int64)})
    if not cand_all or n_total == 0:
        return empty

    # lossless CMS prune: min-over-rows estimate is an UPPER bound on
    # the true count, so est < φ·N proves the item is not a heavy hitter
    cand_list = sorted(cand_all)
    h1, h2 = _cms_hashes(cand_list)
    w = np.uint64(width)
    est = np.full(len(cand_list), np.iinfo(np.int64).max, dtype=np.int64)
    for d in range(depth):
        idx = ((h1 + np.uint64(d) * h2) % w).astype(np.int64)
        est = np.minimum(est, cms_total[d][idx])
    thresh = phi * n_total
    pruned = [t for t, e in zip(cand_list, est)
              if float(e) >= thresh]
    if not pruned:
        return empty

    cand_ref = ray.put(frozenset(pruned))

    def exact_counts(batch: pa.Table) -> pa.Table:
        cand = ray.get(cand_ref)
        c: Counter = Counter()
        vals = batch[col].to_pylist()
        if tokenize is None:
            c.update(s for s in (str(v) for v in vals if v is not None)
                     if s in cand)
        else:
            for v in vals:
                if v:
                    c.update(t for t in tokenize(v) if t in cand)
        return pa.table({"item": pa.array(list(c.keys()), pa.string()),
                         "cnt": pa.array(list(c.values()), pa.int64())})

    from ray.data.aggregate import Sum

    exact = (
        ds.map_batches(exact_counts, batch_format="pyarrow",
                       batch_size=batch_size)
        .groupby("item").aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
    )
    out = exact[exact["cnt"].astype(np.float64) >= thresh].copy()
    out = out.sort_values(["cnt", "item"],
                          ascending=[False, True]).reset_index(drop=True)
    out["cnt"] = out["cnt"].astype(np.int64)
    return out


def approx_quantiles(
    ds,
    key_col: str,
    value_col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.9),
    *,
    batch_size: int = 4096,
) -> pd.DataFrame:
    """Per-key approximate quantiles via a mergeable log-bucket
    histogram (HDR-histogram family): bucket = floor(ln(v)/ln(1.01)),
    value estimate = bucket midpoint → ≤ ~0.5% relative error for any
    positive value range in ~1.3k buckets per decade-span key.

    Scale shape mirrors ``approx_distinct``: each batch emits
    PRE-AGGREGATED (key, bucket, count) rows — the shuffle moves
    O(#occupied buckets) rows per (batch, key), never the values — and
    one key-grouped merge selects quantile buckets from the cumulative
    counts.  Counts are exact integer sums, so unlike sampling sketches
    the result is parallelism- AND partitioning-invariant (same
    determinism class as the HLL path).  This is the documented 100-TB
    alternative to ``relational.order_price_quantiles``'s exact
    per-group sort.  Values ≤ 0 collapse into one underflow bucket
    estimated as 0.0 (prices/latencies — the intended domain — are
    positive).  Rank convention matches the exact operator:
    idx = ceil(q·n) − 1."""
    import math

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        v = df[value_col].to_numpy(dtype=np.float64)
        b = np.full(len(v), _UNDERFLOW, dtype=np.int64)
        pos = v > 0
        b[pos] = np.floor(np.log(v[pos]) / _LOG_GAMMA).astype(np.int64)
        out = pd.DataFrame(
            {key_col: df[key_col].to_numpy(), "bucket": b,
             "count": np.ones(len(v), dtype=np.int64)}
        )
        return out.groupby([key_col, "bucket"], as_index=False).agg(
            count=("count", "sum")
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        m = (
            g.groupby("bucket", as_index=False)
            .agg(count=("count", "sum"))
            .sort_values("bucket")
        )
        buckets = m["bucket"].to_numpy()
        cum = m["count"].to_numpy().cumsum()
        n = int(cum[-1])
        row: dict = {key_col: [g[key_col].iloc[0]],
                     "n_rows": np.array([n], dtype=np.int64)}
        for q in qs:
            idx = min(n - 1, max(0, math.ceil(q * n) - 1))
            j = int(np.searchsorted(cum, idx + 1))
            bk = int(buckets[j])
            est = (
                0.0 if bk == _UNDERFLOW
                else (math.pow(_GAMMA, bk) + math.pow(_GAMMA, bk + 1)) / 2.0
            )
            row[f"p{int(round(q * 100))}"] = [est]
        return pd.DataFrame(row)

    out = (
        ds.map_batches(partials, batch_format="pandas", batch_size=batch_size)
        .groupby(key_col)
        .map_groups(merge, batch_format="pandas")
        .to_pandas()
    )
    if out.empty and key_col not in out.columns:
        # empty input drops the schema entirely — return the typed shape
        cols = {key_col: [], "n_rows": pd.Series([], dtype=np.int64)}
        cols |= {f"p{int(round(q * 100))}": pd.Series([], dtype=np.float64)
                 for q in qs}
        return pd.DataFrame(cols)
    return out.sort_values(key_col).reset_index(drop=True)
