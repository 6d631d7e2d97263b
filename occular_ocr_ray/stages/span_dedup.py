"""Span-level (substring) exact dedup — the ExactSubstr family of
Lee et al., "Deduplicating Training Data Makes Language Models Better"
(arXiv:2107.06499): remove every re-occurrence of a duplicated w-token
window anywhere in the corpus, keeping one canonical copy.

Shape (vs the paper's suffix array): a distributed w-gram inversion.
1. Every document emits one (gram-hash, doc_id, pos) row per w-token
   window — the token stream explodes 1:1, the same order of work the
   suffix array costs, but expressed as a flat map + ONE hash-keyed
   groupby instead of a monolithic sorted index.
2. Gram groups with ≥2 occurrences mark every occurrence EXCEPT the
   global keeper (min (doc_id, pos)) as removable.
3. Removable occurrences collapse per document into merged token
   intervals (second, doc-keyed groupby — rows ≪ corpus).
4. Documents are rewritten through a bucketed left-outer join with
   their interval lists (``stages.joins`` exchange; docs without dups
   pass through a null join column).

Gram identity is an 8-byte blake2b of the space-joined window —
tokens are whitespace-split so the join is injective; a hash collision
(≈ n²/2⁶⁵) could merge two distinct grams, the standard accepted risk
(same trade MinHash banding makes, documented not silent).  The
per-position gram build is O(w) Python — the per-doc-kernel unit of
work this repo standardizes on; at 100 TB swap in a rolling polynomial
hash (same interface, same groupby).

Keeper protection is per-gram, not per-interval: a keeper window's
tokens can still be removed if an OVERLAPPING different gram's
re-occurrence covers them — the same non-guarantee ExactSubstr has;
deterministic because keeper choice (min doc_id, pos) and interval
merging are order-free.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from .joins import bucketed_lookup_join


def _gram_hashes(tokens: list[str], w: int) -> list[int]:
    """int64 blake2b of each w-token window (space-joined)."""
    out = []
    for i in range(len(tokens) - w + 1):
        h = hashlib.blake2b(
            " ".join(tokens[i : i + w]).encode("utf-8"), digest_size=8
        ).digest()
        out.append(int.from_bytes(h, "little", signed=True))
    return out


def span_occurrences(ds, *, w: int, text_col: str = "text",
                     id_col: str = "doc_id"):
    """documents → (doc_id, pos, h): every w-gram occurrence.
    Documents shorter than w tokens emit nothing."""

    def emit(batch: pa.Table) -> pa.Table:
        ids, poss, hs = [], [], []
        for did, t in zip(batch[id_col].to_pylist(),
                          batch[text_col].to_pylist()):
            toks = (t or "").split()
            gh = _gram_hashes(toks, w)
            ids.extend([did] * len(gh))
            poss.extend(range(len(gh)))
            hs.extend(gh)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "pos": pa.array(poss, pa.int64()),
            "h": pa.array(hs, pa.int64()),
        })

    return ds.map_batches(emit, batch_format="pyarrow")


def removable_occurrences(occ):
    """Gram groups with ≥2 occurrences → all occurrences except the
    global keeper (min (doc_id, pos)).  One hash-keyed groupby; group
    sizes are the gram's occurrence count (tiny for natural text)."""

    def drop_keeper(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return g.iloc[0:0][["doc_id", "pos"]]
        g = g.sort_values(["doc_id", "pos"], kind="mergesort")
        return g.iloc[1:][["doc_id", "pos"]]

    return occ.groupby("h").map_groups(drop_keeper, batch_format="pandas")


def dup_span_intervals(rem, *, w: int):
    """Removable occurrences → one row per affected doc with merged,
    sorted removal intervals [start, end) in token space."""

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        starts = np.sort(g["pos"].to_numpy(dtype=np.int64))
        ends = starts + w
        m_starts, m_ends = [int(starts[0])], [int(ends[0])]
        for s, e in zip(starts[1:], ends[1:]):
            if s <= m_ends[-1]:
                m_ends[-1] = max(m_ends[-1], int(e))
            else:
                m_starts.append(int(s))
                m_ends.append(int(e))
        return pd.DataFrame({
            "doc_id": [int(g["doc_id"].iloc[0])],
            "starts": [m_starts],
            "ends": [m_ends],
        })

    return rem.groupby("doc_id").map_groups(merge, batch_format="pandas")


def dedup_spans(ds, *, w: int, text_col: str = "text",
                id_col: str = "doc_id", num_buckets: int | None = None):
    """Rewrite the corpus with duplicated w-token spans removed (one
    canonical copy survives per gram, modulo the overlap caveat above).
    Returns the input columns with ``text_col`` rewritten plus
    ``n_removed_tokens``."""
    occ = span_occurrences(ds, w=w, text_col=text_col, id_col=id_col)
    iv = dup_span_intervals(removable_occurrences(occ), w=w)

    # Arrow's hash join rejects list-typed payload columns — ship the
    # interval list as one "s:e;s:e" string through the exchange, under
    # a dunder name no real corpus column uses (the flagship's extracted
    # rows already carry a ``spans`` struct column — a bare name would
    # collide in the join and the rewrite would read the wrong side).
    def serialize(b: pa.Table) -> pa.Table:
        spans = [";".join(f"{s}:{e}" for s, e in zip(ss, ee))
                 for ss, ee in zip(b["starts"].to_pylist(),
                                   b["ends"].to_pylist())]
        return pa.table({"doc_id": b["doc_id"],
                         "__dup_spans": pa.array(spans, pa.string())})

    # lookup join, not Acero hash join: the corpus side may carry
    # list/struct columns (flagship rows have a ``spans`` struct) that
    # Acero rejects as join payloads
    joined = bucketed_lookup_join(
        ds, iv.map_batches(serialize, batch_format="pyarrow"),
        left_on=id_col, right_on="doc_id", num_buckets=num_buckets,
        # the corpus may have zero dup spans — an empty right side has
        # no block to infer a schema from
        right_schema=pa.schema([("doc_id", pa.int64()),
                                ("__dup_spans", pa.string())]),
    )

    def rewrite(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        spans_col = batch["__dup_spans"].to_pylist()
        new_texts, removed = [], []
        for t, spans in zip(texts, spans_col):
            if not spans:  # null join column: no dup spans in this doc
                new_texts.append(t)
                removed.append(0)
                continue
            toks = (t or "").split()
            keep = np.ones(len(toks), dtype=bool)
            for part in spans.split(";"):
                s, e = part.split(":")
                keep[int(s):int(e)] = False
            new_texts.append(" ".join(np.asarray(toks, dtype=object)[keep]))
            removed.append(int((~keep).sum()))
        cols = {n: batch[n] for n in batch.column_names
                if n not in (text_col, "__dup_spans")}
        cols[text_col] = pa.array(new_texts, pa.string())
        cols["n_removed_tokens"] = pa.array(removed, pa.int64())
        return pa.table(cols)

    return joined.map_batches(rewrite, batch_format="pyarrow")
