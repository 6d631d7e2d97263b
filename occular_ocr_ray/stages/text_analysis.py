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
