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
- Grams are 64-bit blake2b hashes, not strings — the broadcast array
  is 8 bytes/gram regardless of gram text.  Collision probability for
  |eval| = 10^7 grams is ~3e-6 per corpus gram-set (birthday over
  2^64), which only ever causes a spurious DROP, never contamination
  leakage — the conservative direction for this op.

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


def _gram_hashes(text: str, n: int) -> np.ndarray:
    """Sorted unique uint64 hashes of the word n-grams of ``text``
    (whitespace tokenization, matching the SQL oracle's \\s+ split)."""
    toks = text.split()
    if len(toks) < n:
        return np.empty(0, dtype=np.uint64)
    out = np.empty(len(toks) - n + 1, dtype=np.uint64)
    for i in range(len(out)):
        gram = " ".join(toks[i:i + n])
        out[i] = int.from_bytes(
            hashlib.blake2b(gram.encode(), digest_size=8).digest(), "little")
    return np.unique(out)


def eval_gram_hashes(eval_ds: rd.Dataset, text_col: str = "text",
                     n: int = 4) -> np.ndarray:
    """Distinct gram hashes of the (small) eval set: per-batch unique
    map-side, tiny union at the driver."""
    def batch_hashes(df: pd.DataFrame) -> pd.DataFrame:
        hs = [_gram_hashes(t if isinstance(t, str) else "", n)
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

    def __init__(self, eval_ref, text_col: str = "text", n: int = 4):
        self.eval_hashes = ray.get(eval_ref)  # sorted uint64
        self.text_col = text_col
        self.n = n

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        keep = np.ones(len(df), dtype=bool)
        for i, t in enumerate(df[self.text_col].to_numpy()):
            hs = _gram_hashes(t if isinstance(t, str) else "", self.n)
            if hs.size and np.isin(
                    hs, self.eval_hashes, assume_unique=True).any():
                keep[i] = False
        return df[keep]


def decontaminate(corpus: rd.Dataset, eval_ds: rd.Dataset,
                  text_col: str = "text", n: int = 4,
                  concurrency: int | None = None) -> rd.Dataset:
    """Corpus minus every document sharing a word n-gram with the eval
    set.  One streaming pass over the corpus; the eval side is reduced
    and broadcast once."""
    from .util import default_pool

    ref = ray.put(eval_gram_hashes(eval_ds, text_col=text_col, n=n))
    return corpus.map_batches(
        ContaminationFilter,
        fn_constructor_kwargs={"eval_ref": ref, "text_col": text_col, "n": n},
        batch_format="pandas",
        concurrency=concurrency or default_pool(),
    )
