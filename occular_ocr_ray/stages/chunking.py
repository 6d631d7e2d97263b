"""Skew-aware giant-document chunk split + keyed reassembly
(SURVEY.md §4 "Skew" / build-plan step 6).

Applies to the NATIVE-text branch only: native text is processed per
line (``functions/extract._extract_native``), so splitting on line
boundaries and re-joining chunk outputs with ``"\\n"`` is byte-identical
to whole-document processing (proved by tests/test_chunking.py).  HTML
payloads are never chunked — cutting an HTML document mid-stream changes
the parse and would break the golden contract; their skew is handled by
small batches + dynamic block splitting (flagship docstring).

Pattern: ``flat_map`` oversized docs into ``(url, chunk_id, text)`` rows
→ the same extract stage per chunk → ``groupby(url).map_groups``
reassembly in chunk order (the generalization of the reference's keyed
page-reassembly, ``pipeline.py:167-188``).

Cost note: the reassembly ``groupby(url)`` shuffles every row of the
stream it is applied to, so this variant is OPT-IN for workloads whose
skew is dominated by giant native-text rows; the flagship default path
stays shuffle-free.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from .extractor import DensityExtractor, rows_to_table


def split_batch(chunk_bytes: int):
    """Emit (url, chunk_id, html, text) rows; rows with native text
    longer than ``chunk_bytes`` are split at line boundaries."""

    def f(batch: pa.Table) -> pa.Table:
        urls, cids, htmls, texts = [], [], [], []
        for u, h, t in zip(
            batch["url"].to_pylist(), batch["html"].to_pylist(), batch["text"].to_pylist()
        ):
            if t and len(t) > chunk_bytes:
                lines = t.split("\n")
                cur: list[str] = []
                size = 0
                cid = 0
                for ln in lines:
                    cur.append(ln)
                    size += len(ln) + 1
                    if size >= chunk_bytes:
                        urls.append(u); cids.append(cid); htmls.append(None)
                        texts.append("\n".join(cur))
                        cur, size = [], 0
                        cid += 1
                if cur:
                    urls.append(u); cids.append(cid); htmls.append(None)
                    texts.append("\n".join(cur))
            else:
                urls.append(u); cids.append(0); htmls.append(h); texts.append(t)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "chunk_id": pa.array(cids, pa.int32()),
                "html": pa.array(htmls, pa.binary()),
                "text": pa.array(texts, pa.string()),
            }
        )

    return f


def _extract_keep_chunk(batch: pa.Table) -> pa.Table:
    out = DensityExtractor()(batch)
    return out.append_column("chunk_id", batch["chunk_id"])


def _reassemble(g: pd.DataFrame) -> pd.DataFrame:
    # url is the primary key (SURVEY.md §1.2): exact-duplicate input
    # rows land in the same group with colliding chunk_ids; extraction
    # is pure, so they carry identical content — keep the first.  The
    # chunked variant therefore also exact-dedups by url (documented).
    g = g.sort_values("chunk_id").drop_duplicates("chunk_id", keep="first")
    if len(g) == 1:
        return g.drop(columns=["chunk_id"])
    texts = [t for t in g["extracted_text"] if t]
    merged_text = "\n".join(texts)
    spans = []
    offset = 0
    for txt, sp in zip(g["extracted_text"], g["spans"]):
        if not txt:
            continue
        for s in sp:
            spans.append(
                {
                    "start": int(s["start"]) + offset,
                    "end": int(s["end"]) + offset,
                    "tag_path": s["tag_path"],
                    "score": float(s["score"]),
                }
            )
        offset += len(txt) + 1
    row = {
        "url": g["url"].iloc[0],
        "extracted_text": merged_text,
        "spans": spans,
        "method": g["method"].iloc[0],
        "n_blocks_kept": int(g["n_blocks_kept"].sum()),
        "n_blocks_dropped": int(g["n_blocks_dropped"].sum()),
        "bytes_emitted": len(merged_text.encode("utf-8")),
    }
    return rows_to_table([row]).to_pandas()


def extract_dataset_chunked(ds, *, chunk_bytes: int = 1_000_000, batch_size: int = 32):
    """pages Dataset → extracted Dataset with giant native-text rows
    split/extracted/reassembled.  Output rows are byte-identical to the
    unchunked ``extract_dataset`` per url."""
    chunks = ds.map_batches(split_batch(chunk_bytes), batch_format="pyarrow",
                            batch_size=batch_size)
    extracted = chunks.map_batches(_extract_keep_chunk, batch_format="pyarrow",
                                   batch_size=batch_size)
    return extracted.groupby("url").map_groups(_reassemble, batch_format="pandas")
