"""Benchmark decontamination: drop corpus documents sharing any word
n-gram with an evaluation set (the GPT-3 appendix-C / open-data
"training-set decontamination" op every LLM data pipeline runs before
training).

Scale shape (100 TB corpus, small eval set — the realistic asymmetry):

- The EVAL side is tiny by definition (benchmark suites are at most a
  few hundred k documents), so its distinct n-gram hash set is reduced
  map-side per batch, collected once, and broadcast via ``ray.put`` —
  the corpus is never shuffled and never compared pairwise.
- The CORPUS side streams: one actor-pool ``map_batches`` pass computes
  each doc's gram hashes and drops the doc on any membership hit
  (vectorized ``np.isin`` against the sorted broadcast array).  Cost is
  O(grams · log |eval grams|) per doc, zero exchanges.
- Grams are 64-bit hashes, not strings — the broadcast array is
  8 bytes/gram regardless of gram text.  Collision probability for
  |eval| = 10^7 grams is ~3e-6 per corpus gram-set (birthday over
  2^64), which only ever causes a spurious DROP, never contamination
  leakage — the conservative direction for this op.
- The gram kernel is the O(L) ROLLING polynomial hash shared with
  ``stages.span_dedup`` (one vectorized siphash pass over the batch's
  tokens + O(1) vector work per window), not a per-window digest:
  membership semantics are unchanged because BOTH the eval and corpus
  sides use the same kernel, and this op scans the WHOLE corpus — the
  ~n× kernel win (n = gram width) lands on every byte of the 100 TB
  (VERDICT r4 #3).  The round-3 per-window blake2b build survives as
  ``_gram_hashes_blake2b`` for A/B parity and benchmarks.

Reference analog: the reference has no decontamination; this extends
its dedup family (SURVEY §2.6) the way `stages/dedup.py` extends exact
dedup — same broadcast-small-side discipline as
`training_data.build_corpus`'s drop-set (ref: ocr_skel/pipeline.py:63
one-pass filter composition).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import ray
import ray.data as rd


def _gram_hashes_blake2b(text: str, n: int) -> np.ndarray:
    """The round-3 O(w·L) per-window digest build — retained as the
    independent A/B reference for the rolling kernel (parity asserted
    at the FILTER-RESULT level in tests; hash values differ by
    construction)."""
    toks = text.split()
    if len(toks) < n:
        return np.empty(0, dtype=np.uint64)
    out = np.empty(len(toks) - n + 1, dtype=np.uint64)
    for i in range(len(out)):
        gram = " ".join(toks[i:i + n])
        out[i] = int.from_bytes(
            hashlib.blake2b(gram.encode(), digest_size=8).digest(), "little")
    return np.unique(out)


def _batch_gram_hashes(texts, n: int) -> list[np.ndarray]:
    """Per-document sorted-unique uint64 gram hashes for a whole batch,
    via the O(L) rolling polynomial kernel shared with
    ``stages.span_dedup``: ONE vectorized siphash pass over the batch's
    tokens, power tables built once per batch, O(1) vector work per
    window.  Whitespace tokenization matches the SQL oracle's \\s+
    split."""
    from .span_dedup import _B, _BINV, _pow_table, _rolling_gram_hashes

    tok_lists = [(t if isinstance(t, str) else "").split() for t in texts]
    lens = np.fromiter((len(t) for t in tok_lists), dtype=np.int64,
                       count=len(tok_lists))
    total = int(lens.sum())
    empty = np.empty(0, dtype=np.uint64)
    if total == 0 or int(lens.max(initial=0)) < n:
        return [empty] * len(tok_lists)
    all_toks = np.empty(total, dtype=object)
    ofs = 0
    for tl in tok_lists:
        all_toks[ofs:ofs + len(tl)] = tl
        ofs += len(tl)
    th_all = pd.util.hash_array(all_toks)
    maxn = int(lens.max())
    b_pows = _pow_table(_B, maxn)
    binv_pows = _pow_table(_BINV, maxn)
    out: list[np.ndarray] = []
    ofs = 0
    for ln in lens.tolist():
        if ln >= n:
            h = _rolling_gram_hashes(th_all[ofs:ofs + ln], n,
                                     b_pows, binv_pows)
            out.append(np.unique(h.view(np.uint64)))
        else:
            out.append(empty)
        ofs += ln
    return out


def eval_gram_hashes(eval_ds: rd.Dataset, text_col: str = "text",
                     n: int = 4, hasher: str = "rolling") -> np.ndarray:
    """Distinct gram hashes of the (small) eval set: per-batch unique
    map-side, tiny union at the driver."""
    def batch_hashes(df: pd.DataFrame) -> pd.DataFrame:
        if hasher == "rolling":
            hs = _batch_gram_hashes(df[text_col].to_numpy(), n)
        else:
            hs = [_gram_hashes_blake2b(t if isinstance(t, str) else "", n)
                  for t in df[text_col]]
        merged = (np.unique(np.concatenate(hs)) if hs
                  else np.empty(0, dtype=np.uint64))
        return pd.DataFrame({"h": merged})

    parts = eval_ds.select_columns([text_col]).map_batches(
        batch_hashes, batch_format="pandas")
    pdf = parts.to_pandas()
    if "h" not in pdf.columns:  # empty eval set: zero blocks, no schema
        return np.empty(0, dtype=np.uint64)
    return np.unique(pdf["h"].to_numpy(dtype=np.uint64))


class ContaminationFilter:
    """Actor-pool batch filter: keep only corpus rows sharing NO n-gram
    with the broadcast eval gram-hash set.  The sorted array is fetched
    from the object store once per actor (zero-copy numpy)."""

    def __init__(self, eval_ref, text_col: str = "text", n: int = 4,
                 hasher: str = "rolling"):
        self.eval_hashes = ray.get(eval_ref)  # sorted uint64
        self.text_col = text_col
        self.n = n
        self.hasher = hasher

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        texts = df[self.text_col].to_numpy()
        if self.hasher == "rolling":
            per_doc = _batch_gram_hashes(texts, self.n)
        else:
            per_doc = [_gram_hashes_blake2b(
                t if isinstance(t, str) else "", self.n) for t in texts]
        keep = np.ones(len(df), dtype=bool)
        for i, hs in enumerate(per_doc):
            if hs.size and np.isin(
                    hs, self.eval_hashes, assume_unique=True).any():
                keep[i] = False
        return df[keep]


def decontaminate(corpus: rd.Dataset, eval_ds: rd.Dataset,
                  text_col: str = "text", n: int = 4,
                  concurrency: int | None = None,
                  hasher: str = "rolling") -> rd.Dataset:
    """Corpus minus every document sharing a word n-gram with the eval
    set.  One streaming pass over the corpus; the eval side is reduced
    and broadcast once.  ``hasher`` selects the gram kernel (BOTH sides
    always share it): "rolling" (default, O(L) per doc) or "blake2b"
    (the O(n·L) A/B reference)."""
    from .util import default_pool

    if hasher not in ("rolling", "blake2b"):
        raise ValueError(f"unknown hasher {hasher!r}")
    ref = ray.put(eval_gram_hashes(eval_ds, text_col=text_col, n=n,
                                   hasher=hasher))
    return corpus.map_batches(
        ContaminationFilter,
        fn_constructor_kwargs={"eval_ref": ref, "text_col": text_col,
                               "n": n, "hasher": hasher},
        batch_format="pandas",
        concurrency=concurrency or default_pool(),
    )
