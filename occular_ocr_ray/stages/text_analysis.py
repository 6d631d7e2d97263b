"""Text-analysis stages over a documents table — actor-pool
``map_batches`` callables wrapping ``functions/textstats.py``.

Stage shape follows SURVEY.md §2.3: compiled regex/tables are touched in
``__init__`` (once per actor), per-batch work is a tight loop over the
Arrow column (the kernels are per-document string ops, like the
reference's per-crop recognizer)."""

from __future__ import annotations

import pyarrow as pa

from ..functions import textstats as ts


class TextStats:
    """Adds token counts, language prediction, quality score and
    fingerprints to a documents batch."""

    def __init__(self, text_col: str = "text") -> None:
        self.text_col = text_col
        # touch module-level compiled state (regexes, marker tables)
        self._fns = (
            ts.token_count,
            ts.bpe_ish_token_count,
            ts.lang_id,
            ts.quality_score,
            ts.md5_fingerprint,
            ts.rolling_fingerprint,
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        # total over null text (documents/pages allow it): null → ''
        texts = [t or "" for t in batch[self.text_col].to_pylist()]
        tok, bpe, lang, qual, md5s, roll = self._fns
        batch = batch.append_column("n_tokens", pa.array([tok(t) for t in texts], pa.int64()))
        batch = batch.append_column("n_bpe_tokens", pa.array([bpe(t) for t in texts], pa.int64()))
        batch = batch.append_column("pred_lang", pa.array([lang(t) for t in texts], pa.string()))
        batch = batch.append_column("quality", pa.array([qual(t) for t in texts], pa.float64()))
        batch = batch.append_column("fp_md5", pa.array([md5s(t) for t in texts], pa.string()))
        batch = batch.append_column(
            "fp_rolling", pa.array([roll(t) for t in texts], pa.int64())
        )
        return batch


def analyze_documents(ds, text_col: str = "text", concurrency=None, batch_size: int = 1024):
    """documents Dataset → same rows + analysis columns."""
    if concurrency is None:
        return ds.map_batches(TextStats(text_col), batch_format="pyarrow", batch_size=batch_size)
    return ds.map_batches(
        TextStats,
        fn_constructor_kwargs={"text_col": text_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


class TokenChunker:
    """Flat-map stage: documents → overlapping token-window chunks
    (doc_id, chunk_index, chunk_text, n_tokens) — one batch in, a longer
    batch out, embarrassingly parallel; chunk ids are deterministic so
    the op is resumable/idempotent like every other map stage."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text",
                 max_tokens: int = 128, stride: int = 96) -> None:
        self.id_col, self.text_col = id_col, text_col
        self.max_tokens, self.stride = max_tokens, stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        out_id, out_ix, out_text, out_n = [], [], [], []
        for did, t in zip(ids, texts):
            for ix, chunk, n in ts.chunk_token_windows(t, self.max_tokens, self.stride):
                out_id.append(did)
                out_ix.append(ix)
                out_text.append(chunk)
                out_n.append(n)
        return pa.table({
            self.id_col: pa.array(out_id, pa.int64()),
            "chunk_index": pa.array(out_ix, pa.int64()),
            "chunk_text": pa.array(out_text, pa.string()),
            "n_tokens": pa.array(out_n, pa.int64()),
        })


def chunk_documents(ds, id_col: str = "doc_id", text_col: str = "text", *,
                    max_tokens: int = 128, stride: int = 96,
                    concurrency=None, batch_size: int = 512):
    """documents Dataset → chunk Dataset (trainer context windows)."""
    kwargs = dict(id_col=id_col, text_col=text_col,
                  max_tokens=max_tokens, stride=stride)
    if concurrency is None:
        return ds.map_batches(TokenChunker(**kwargs), batch_format="pyarrow",
                              batch_size=batch_size)
    return ds.map_batches(TokenChunker, fn_constructor_kwargs=kwargs,
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency, num_cpus=1)


def bm25_topk(
    ds,
    query_terms,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    batch_size: int = 1024,
    round_digits: int = 4,
):
    """Exact BM25 (Robertson/Spärck Jones) top-k full-corpus search —
    the IR ranking primitive a web-text engine needs beside the
    inverted index.  Two streaming passes, neither shuffles the corpus:

    1. **Corpus-stats pass** — each batch emits ONE row (doc count,
       token total, per-query-term document frequency); the driver
       folds them (``iter_batches``), yielding N, avgdl, and idf per
       term — a few dozen numbers regardless of corpus size.
    2. **Scoring pass** — (terms, idf, avgdl) broadcast via
       ``ray.put``; each batch scores its docs locally and emits only
       its LOCAL top-k under the final (−rounded score, id) order, so
       the driver merge sees ≤ k rows per batch and the local→global
       reduction is exact (any doc outside a batch top-k is beaten by
       k docs under the final order already).

    Scores round to ``round_digits`` BEFORE ranking so the ordering is
    reproducible across summation orders (ours, the SQL oracle's, and
    any reduction tree's).  Returns (id, score) sorted by score desc,
    id asc.  Reference analog: confidence-ranked candidate emission,
    ocr_skel/recognizer_onnx.py — same score-then-keep-k shape.
    """
    from collections import Counter

    import numpy as np
    import pandas as pd
    import ray

    terms = sorted(set(query_terms))
    empty = pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                          "score": pd.Series([], dtype="float64")})
    if not terms:
        return empty

    def stats(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        df = np.zeros(len(terms), dtype=np.int64)
        total = 0
        for txt in texts:
            toks = txt.split() if txt else []
            total += len(toks)
            present = set(toks)
            for j, t in enumerate(terms):
                if t in present:
                    df[j] += 1
        return pa.table({
            "n": pa.array([len(texts)], pa.int64()),
            "total": pa.array([total], pa.int64()),
            "df": pa.array([df.tolist()], pa.list_(pa.int64())),
        })

    n_docs = 0
    total_len = 0
    df = np.zeros(len(terms), dtype=np.int64)
    folded = ds.map_batches(stats, batch_format="pyarrow",
                            batch_size=batch_size)
    for bt in folded.iter_batches(batch_format="pyarrow"):
        n_docs += int(sum(bt["n"].to_pylist()))
        total_len += int(sum(bt["total"].to_pylist()))
        for d in bt["df"].to_pylist():
            df += np.asarray(d, dtype=np.int64)
    if n_docs == 0 or total_len == 0:
        return empty

    avgdl = total_len / n_docs
    idf = np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
    params_ref = ray.put((terms, idf, avgdl))

    def score_batch(batch: pa.Table) -> pa.Table:
        terms_, idf_, avgdl_ = ray.get(params_ref)
        texts = batch[text_col].to_pylist()
        ids = batch[id_col].to_pylist()
        rows: list[tuple[float, int]] = []  # (-ish) kept as (score, id)
        for did, txt in zip(ids, texts):
            toks = txt.split() if txt else []
            dl = len(toks)
            if not dl:
                continue
            c = Counter(toks)
            s = 0.0
            for j, t in enumerate(terms_):
                tf = c.get(t, 0)
                if tf:
                    s += (float(idf_[j]) * (tf * (k1 + 1.0))
                          / (tf + k1 * ((1.0 - b) + b * dl / avgdl_)))
            if s > 0.0:
                rows.append((round(s, round_digits), did))
        rows.sort(key=lambda r: (-r[0], r[1]))
        top = rows[:k]
        return pa.table({
            id_col: pa.array([r[1] for r in top], pa.int64()),
            "score": pa.array([r[0] for r in top], pa.float64()),
        })

    cand = ds.map_batches(score_batch, batch_format="pyarrow",
                          batch_size=batch_size).to_pandas()
    if cand.empty:
        return empty
    cand = cand.sort_values(["score", id_col],
                            ascending=[False, True]).head(k)
    return cand.reset_index(drop=True)
