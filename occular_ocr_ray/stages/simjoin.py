"""Set-similarity self-join: all pairs of distinct string values whose
character-n-gram Jaccard meets a threshold, via PREFIX FILTERING
(Chaudhuri/Ganti/Kaushik ICDE'06; Bayardo/Ma/Srikant WWW'07 "all-pairs")
instead of the O(n^2) cross join.

Reference analog: the recognizer's candidate-lattice pruning
(``ocr_skel/recognizer_onnx.py:62-86``) keeps only beam candidates that
can still reach the score threshold; prefix filtering is the same
"upper-bound then verify" discipline applied to set overlap.

Scale shape (the whole point of the operator):

1. **Distinct pass** — ``groupby(col).count()``: one hash exchange over
   (value, partial-count) rows; duplicates collapse map-side, so the
   exchange moves the *vocabulary*, not the table.
2. **Gram document-frequency pass** — per-batch partial counts, one row
   per (gram, batch); a tiny groupby sums them.  The char-n-gram
   vocabulary is intrinsically bounded (<= |charset|^n, ~50k for ASCII
   trigrams), so the merged DF table is driver-small and broadcasts
   once via ``ray.put`` as a global rarity ranking.
3. **Prefix emission** — each value sorts its grams by (DF asc, gram)
   and emits only the first ``|T| - ceil(tau*|T|) + 1`` as blocking
   keys: any pair with Jaccard >= tau MUST share a prefix gram (with
   the |y| >= tau*|x| length filter, required overlap
   ceil(tau/(1+tau)*(|x|+|y|)) >= tau*|x|, so skipping the last
   ceil(tau*|x|)-1 grams cannot skip all shared ones).  Rarity-first
   ordering makes blocking buckets SMALL by construction — the hot
   grams everyone shares are never blocking keys at realistic tau.
4. **Candidate generation** — groupby(prefix gram): within each bucket,
   pairs passing the length filter; pair dedup is another map-side
   groupby (a pair found under several grams collapses before the
   exchange).
5. **Exact verify** — candidates join their gram sets back (broadcast
   here: the distinct vocabulary is dimension-bounded by step 1's
   contract; a bucketed join replaces the broadcast when it is not)
   and exact Jaccard filters >= tau.  Verification is exact, so steps
   2-4 only ever need to produce a candidate SUPERSET — the prefix
   bound is load-bearing for cost, not correctness.
"""

from __future__ import annotations

import math
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd
from ray.data.aggregate import Sum

from .dedup import _COARSE


def char_ngrams(s: str, n: int = 3) -> frozenset:
    """Distinct character n-grams; values shorter than n fall back to a
    single whole-string gram (matches the SQL oracle's CASE)."""
    if len(s) >= n:
        return frozenset(s[i : i + n] for i in range(len(s) - n + 1))
    return frozenset((s,))


def _prefix_len(size: int, threshold: float) -> int:
    return size - int(math.ceil(threshold * size)) + 1


def similarity_self_join(
    ds: rd.Dataset,
    col: str,
    *,
    threshold: float,
    ngram: int = 3,
    round_digits: int = 4,
) -> pd.DataFrame:
    """All distinct-value pairs (a < b) of ``ds[col]`` with char-n-gram
    Jaccard >= threshold.  Returns (name_a, name_b, jaccard) sorted by
    (name_a, name_b)."""
    if not (0.0 < threshold <= 1.0):
        raise ValueError("threshold must be in (0, 1]")

    # materialized: three downstream consumers (gram-DF pass, prefix
    # emission, verify-set build) would each re-execute the distinct
    # exchange — and the read feeding it — if left lazy.  Size is the
    # phase-1 contract: the VOCABULARY, not the table.
    distinct = ds.groupby(col).count().materialize()

    # Phase 2: gram document frequencies (bounded vocabulary).
    def gram_partials(batch: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for v in batch[col].to_pylist():
            for g in char_ngrams(v, ngram):
                counts[g] = counts.get(g, 0) + 1
        return pa.table(
            {
                "gram": pa.array(list(counts.keys()), pa.string()),
                "df": pa.array(list(counts.values()), pa.int64()),
            }
        )

    df_tbl = (
        distinct.map_batches(gram_partials, batch_format="pyarrow")
        .groupby("gram")
        .aggregate(Sum("df", alias_name="df"))
        .to_pandas()
    )
    # Global rarity ranking: DF asc, gram asc (total order → every
    # worker sorts grams identically).
    df_tbl = df_tbl.sort_values(["df", "gram"]).reset_index(drop=True)
    rank_ref = ray.put({g: i for i, g in enumerate(df_tbl["gram"])})

    # Phase 3: prefix-gram emission.
    class PrefixEmit:
        def __init__(self):
            self.rank = ray.get(rank_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            grams_out, names, sizes = [], [], []
            rank = self.rank
            for v in batch[col].to_pylist():
                gs = sorted(char_ngrams(v, ngram), key=rank.__getitem__)
                for g in gs[: _prefix_len(len(gs), threshold)]:
                    grams_out.append(g)
                    names.append(v)
                    sizes.append(len(gs))
            coarse = [zlib.crc32(g.encode()) % _COARSE for g in grams_out]
            return pa.table(
                {
                    "gram": pa.array(grams_out, pa.string()),
                    "name": pa.array(names, pa.string()),
                    "size": pa.array(sizes, pa.int64()),
                    "coarse": pa.array(coarse, pa.int32()),
                }
            )

    prefixes = distinct.map_batches(
        PrefixEmit, batch_format="pyarrow", concurrency=(1, 4)
    )

    # Phase 4: in-bucket candidate pairs + map-side pair dedup.  The
    # rarity-first prefix keeps buckets small.  The exchange groups by
    # COARSE gram hash (crc32 % 199 — process-seed-independent), not by
    # gram: the gram vocabulary is ~50k groups, and one pandas
    # map_groups invocation per gram is exactly the per-group overhead
    # the LSH path already solved with coarse buckets (dedup.py
    # `_COARSE` discipline); the fine per-gram resolution happens
    # vectorized-enough INSIDE each coarse group.
    def bucket_pairs(cg: pd.DataFrame) -> pd.DataFrame:
        a_all, b_all = [], []
        for _, g in cg.groupby("gram", sort=False):
            names = g["name"].to_numpy()
            sizes = g["size"].to_numpy()
            order = np.argsort(names, kind="stable")
            names, sizes = names[order], sizes[order]
            for i in range(len(names)):
                for j in range(i + 1, len(names)):
                    lo, hi = sorted((sizes[i], sizes[j]))
                    if lo < threshold * hi:  # length filter
                        continue
                    a_all.append(names[i])
                    b_all.append(names[j])
        return pd.DataFrame({"name_a": a_all, "name_b": b_all})

    cands = (
        prefixes.groupby("coarse")
        .map_groups(bucket_pairs, batch_format="pandas")
        .groupby(["name_a", "name_b"])
        .count()
    )

    # Phase 5: exact verify.  Distinct vocabulary is dimension-bounded
    # (phase-1 contract) → gram sets broadcast once; swap for a double
    # bucketed join (stages/joins.bucketed_join) on unbounded corpora.
    name_grams = {
        v: char_ngrams(v, ngram)
        for batch in distinct.select_columns([col]).iter_batches(
            batch_format="pyarrow"
        )
        for v in batch[col].to_pylist()
    }
    grams_ref = ray.put(name_grams)

    class Verify:
        def __init__(self):
            self.grams = ray.get(grams_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            a_keep, b_keep, jac_keep = [], [], []
            for a, b in zip(
                batch["name_a"].to_pylist(), batch["name_b"].to_pylist()
            ):
                ta, tb = self.grams[a], self.grams[b]
                j = len(ta & tb) / len(ta | tb)
                if j >= threshold:
                    a_keep.append(a)
                    b_keep.append(b)
                    jac_keep.append(j)
            return pa.table(
                {
                    "name_a": pa.array(a_keep, pa.string()),
                    "name_b": pa.array(b_keep, pa.string()),
                    "jaccard": pa.array(jac_keep, pa.float64()),
                }
            )

    out = cands.map_batches(
        Verify, batch_format="pyarrow", concurrency=(1, 4)
    ).to_pandas()
    if out.empty:
        out = pd.DataFrame(
            {
                "name_a": pd.Series(dtype=str),
                "name_b": pd.Series(dtype=str),
                "jaccard": pd.Series(dtype=np.float64),
            }
        )
    # DuckDB-compatible half-away rounding (relational._round_away
    # inlined to keep stages/ free of the pipelines package).
    scale = 10.0 ** round_digits
    vals = out["jaccard"].to_numpy(dtype=np.float64)
    out["jaccard"] = np.sign(vals) * np.floor(np.abs(vals) * scale + 0.5) / scale
    return (
        out[["name_a", "name_b", "jaccard"]]
        .sort_values(["name_a", "name_b"])
        .reset_index(drop=True)
    )


def similarity_self_join_bruteforce(
    values: list[str], *, threshold: float, ngram: int = 3
) -> list[tuple[str, str, float]]:
    """O(n^2) reference for parity tests (never called by queries)."""
    names = sorted(set(values))
    out = []
    for i, a in enumerate(names):
        ta = char_ngrams(a, ngram)
        for b in names[i + 1 :]:
            tb = char_ngrams(b, ngram)
            j = len(ta & tb) / len(ta | tb)
            if j >= threshold:
                out.append((a, b, j))
    return out
