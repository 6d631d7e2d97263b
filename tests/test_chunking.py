"""Skew-aware chunk split + keyed reassembly: byte-identity proof vs
the unchunked path (SURVEY.md §4 / build-plan step 6)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from occular_ocr_ray.functions.normalize import normalize_ws

pytestmark = pytest.mark.usefixtures("ray_session")


def _pages_table():
    from occular_ocr_ray.sources.pages import gen_page_row

    rows = [gen_page_row(i) for i in range(0, 40)]
    # add giant native-text rows (the skew case this stage exists for)
    for j in range(3):
        line = f"A long native line number %d for giant doc {j} with payload words."
        text = "\n".join([line % i for i in range(40_000)] + ["", "  ", "last line"])
        rows.append(
            {
                "url": f"https://giant{j}.example/native/{j}",
                "warc_ts": 0,
                "html": b"<html><body><p>stub</p></body></html>",
                "text": text,
                "lang": "en",
            }
        )
    import pyarrow as pa

    from occular_ocr_ray.sources.pages import PAGES_SCHEMA

    return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)


def test_chunked_equals_unchunked():
    import ray.data as rd

    from occular_ocr_ray.pipelines.flagship import extract_dataset
    from occular_ocr_ray.stages.chunking import extract_dataset_chunked

    tbl = _pages_table().select(["url", "html", "text"])
    # plain path emits one row per input row; dup urls carry identical
    # content (purity), so keying by url is lossless here
    plain = {
        r["url"]: r
        for r in extract_dataset(rd.from_arrow(tbl), batch_size=8).take_all()
    }
    chunked = {
        r["url"]: r
        for r in extract_dataset_chunked(
            rd.from_arrow(tbl), chunk_bytes=200_000, batch_size=8
        ).take_all()
    }
    assert set(plain) == set(chunked)
    for u in plain:
        p, c = plain[u], chunked[u]
        assert p["extracted_text"] == c["extracted_text"], u
        # spans round-trip as numpy arrays through pandas map_groups —
        # normalize both to plain lists of dicts before comparing
        assert [dict(s) for s in p["spans"]] == [dict(s) for s in c["spans"]], u
        for k in ("method", "n_blocks_kept", "n_blocks_dropped", "bytes_emitted"):
            assert p[k] == c[k], (u, k)


def test_split_batch_boundaries():
    from occular_ocr_ray.stages.chunking import split_batch

    text = "\n".join(f"line {i}" for i in range(1000))
    batch = pa.table(
        {
            "url": ["u1", "u2"],
            "html": pa.array([None, b"<p>x</p>"], pa.binary()),
            "text": pa.array([text, None], pa.string()),
        }
    )
    out = split_batch(2000)(batch)
    df = out.to_pandas()
    chunks = df[df["url"] == "u1"].sort_values("chunk_id")
    assert len(chunks) > 1
    # chunk boundaries are line boundaries: re-join reproduces the text
    assert "\n".join(chunks["text"]) == text
    # html row passes through unsplit
    assert len(df[df["url"] == "u2"]) == 1 and df[df["url"] == "u2"]["chunk_id"].iloc[0] == 0
