"""Ingestion of JSONL/CSV page sources + poison-row robustness of the
extraction kernel (total function contract)."""

from __future__ import annotations

import base64
import csv
import json

import pytest

from occular_ocr_ray.functions.extract import extract_row

pytestmark = pytest.mark.usefixtures("ray_session")


def test_read_pages_json(tmp_path):
    from occular_ocr_ray.sources.ingest import read_pages_json
    from occular_ocr_ray.sources.pages import PAGES_SCHEMA, gen_page_row

    path = tmp_path / "pages.jsonl"
    with open(path, "w") as fh:
        for i in range(10):
            r = gen_page_row(i)
            fh.write(json.dumps({
                "url": r["url"],
                "warc_ts": r["warc_ts"],  # epoch micros
                "html_b64": base64.b64encode(r["html"]).decode(),
                "text": r["text"],
                "lang": r["lang"],
            }) + "\n")
    ds = read_pages_json(str(path))
    tbl = ds.take_batch(10, batch_format="pyarrow")
    assert [f.name for f in PAGES_SCHEMA] == tbl.column_names
    # round-trips the binary payload exactly (keyed by url — row order
    # across the ingest is not part of the contract)
    by_url = dict(zip(tbl["url"].to_pylist(), tbl["html"].to_pylist()))
    assert by_url[gen_page_row(0)["url"]] == gen_page_row(0)["html"]
    # and extraction over the ingested dataset matches the direct kernel
    from occular_ocr_ray.pipelines.flagship import extract_dataset

    out = {r["url"]: r["extracted_text"] for r in extract_dataset(ds).take_all()}
    for i in range(10):
        r = gen_page_row(i)
        assert out[r["url"]] == extract_row(r["url"], r["html"], r["text"])["extracted_text"]


def test_read_pages_csv(tmp_path):
    from occular_ocr_ray.sources.ingest import read_pages_csv

    path = tmp_path / "pages.csv"
    with open(path, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["url", "text", "lang", "warc_ts"])
        w.writerow(["https://a.example/1", "hello world line", "en", "2025-01-01T00:00:01"])
        w.writerow(["https://a.example/2", "second doc text", "en", "not-a-date"])
    ds = read_pages_csv(str(path))
    tbl = ds.take_batch(10, batch_format="pyarrow")
    assert tbl.num_rows == 2
    assert tbl["html"].null_count == 2  # text-only source
    assert tbl["warc_ts"].to_pylist()[1] is None  # bad date → null, not crash


@pytest.mark.parametrize(
    "html,text",
    [
        (b"\xff\xfe\x00garbage not utf8 \x80\x81", None),   # invalid utf-8
        (b"<p>" + b"\x00" * 64 + b"</p>", None),            # NUL bytes
        (b"<" * 10000, None),                               # pathological tags
        (b"<p>" + ("x" * 500000).encode(), None),           # unclosed giant
        (None, "\x00\x01 control \x1f chars"),              # native with controls
        (b"LAYOUT1\n[{\"bbox\": [0,0,1], \"text\": \"short bbox\"}]", None),
    ],
)
def test_extract_total_on_poison_rows(html, text):
    """The kernel is a total function: any bytes in, valid row out
    (analog of the reference's empty-image robustness,
    ``tests/test_dbnet.py:38-45``)."""
    out = extract_row("u", html, text)
    assert isinstance(out["extracted_text"], str)
    assert out["bytes_emitted"] == len(out["extracted_text"].encode("utf-8"))
    for s in out["spans"]:
        assert 0 <= s["start"] <= s["end"] <= len(out["extracted_text"])


def test_ingest_done_marker_validates_source(tmp_path):
    """The _DONE marker skips re-ingest only for the SAME source: a
    re-run pointed at a different input dir, format, or file list must
    raise, not silently extract yesterday's pages (regression: the
    marker recorded only totals, so any source reused a stale ingest)."""
    import pytest as _pytest

    from occular_ocr_ray.sources.ingest import ingest_to_pages_parquet

    def write_jsonl(d, names):
        d.mkdir(parents=True, exist_ok=True)
        for n in names:
            with open(d / n, "w") as fh:
                fh.write(json.dumps({"url": f"https://x/{n}",
                                     "text": "some words here"}) + "\n")

    src_a, src_b = tmp_path / "a", tmp_path / "b"
    write_jsonl(src_a, ["one.jsonl"])
    write_jsonl(src_b, ["other.jsonl"])
    out = tmp_path / "ingested"

    t1 = ingest_to_pages_parquet(str(src_a), str(out), "jsonl")
    # same source → marker short-circuits with the original totals
    t2 = ingest_to_pages_parquet(str(src_a), str(out), "jsonl")
    assert t2 == t1
    # different input dir → refuse
    with _pytest.raises(ValueError, match="different\\s+source"):
        ingest_to_pages_parquet(str(src_b), str(out), "jsonl")
    # same dir, changed file list → refuse
    write_jsonl(src_a, ["two.jsonl"])
    with _pytest.raises(ValueError, match="different\\s+source"):
        ingest_to_pages_parquet(str(src_a), str(out), "jsonl")
    # legacy marker (pre-r4, no src field) → re-ingest, then upgraded
    import os as _os
    marker = out / "_DONE"
    with open(marker) as fh:
        legacy = json.load(fh)
    legacy.pop("src")
    with open(marker, "w") as fh:
        json.dump(legacy, fh)
    t3 = ingest_to_pages_parquet(str(src_a), str(out), "jsonl")
    assert t3["files"] == 2 and "src" in t3
    assert _os.path.exists(marker)


def _warc_record(rtype: str, uri: str, date: str, payload: bytes) -> bytes:
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {rtype}\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        f"WARC-Date: {date}\r\n"
        f"Content-Length: {len(payload)}\r\n"
    ).encode()
    return head + b"\r\n" + payload + b"\r\n\r\n"


def _http_payload(body: bytes) -> bytes:
    return (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body)


def test_read_pages_warc(tmp_path):
    """WARC ingestion: response records become pages rows (request/
    warcinfo skipped, HTTP head stripped, WARC-Date parsed), both plain
    and per-member-gzipped (the Common Crawl layout); rows flow through
    extraction unmodified."""
    import gzip

    from occular_ocr_ray.sources.warc import read_pages_warc
    from occular_ocr_ray.stages.extractor import extract_batch

    body1 = b"<html><body><p>" + b"warc article text one " * 12 + b"</p></body></html>"
    body2 = b"<html><body><p>" + b"second warc doc body " * 12 + b"</p></body></html>"
    raw = (
        _warc_record("warcinfo", "none", "2017-03-22T17:00:00Z", b"software: test")
        + _warc_record("request", "https://w.example/a", "2017-03-22T17:00:01Z",
                       b"GET /a HTTP/1.1\r\n\r\n")
        + _warc_record("response", "https://w.example/a", "2017-03-22T17:00:01Z",
                       _http_payload(body1))
        + _warc_record("response", "https://w.example/b", "2017-03-22T17:00:02Z",
                       _http_payload(body2))
    )
    (tmp_path / "plain.warc").write_bytes(raw)
    # member-per-record gzip (Common Crawl layout) with distinct urls
    gz = b"".join(
        gzip.compress(
            _warc_record("response", f"https://gz.example/{i}",
                         "2017-03-22T18:00:00Z", _http_payload(body1))
        )
        for i in range(2)
    )
    (tmp_path / "cc.warc.gz").write_bytes(gz)

    ds = read_pages_warc([str(tmp_path / "plain.warc"), str(tmp_path / "cc.warc.gz")])
    df = ds.to_pandas().sort_values("url").reset_index(drop=True)
    assert list(df["url"]) == [
        "https://gz.example/0", "https://gz.example/1",
        "https://w.example/a", "https://w.example/b",
    ]
    assert df["html"].iloc[2] == body1  # HTTP head stripped, body exact
    assert str(df["warc_ts"].iloc[2]) == "2017-03-22 17:00:01"
    # truncated/garbage tail must not raise (total parser)
    (tmp_path / "bad.warc").write_bytes(raw[: len(raw) // 2] + b"\x00garbage")
    assert read_pages_warc([str(tmp_path / "bad.warc")]).count() >= 0
    # corrupt gzip MEMBER mid-shard: complete earlier members salvaged,
    # the bad tail dropped — never a dead read task
    good = gzip.compress(
        _warc_record("response", "https://gz.example/ok",
                     "2017-03-22T18:00:00Z", _http_payload(body1)))
    (tmp_path / "torn.warc.gz").write_bytes(
        good + b"\x1f\x8b\x08corrupt-member")
    torn = read_pages_warc([str(tmp_path / "torn.warc.gz")]).to_pandas()
    assert list(torn["url"]) == ["https://gz.example/ok"]

    import pyarrow as pa_

    batch = pa_.Table.from_pandas(df[["url", "html", "text"]])
    out = extract_batch(batch)
    assert out.num_rows == 4 and all(
        len(t) > 0 for t in out["extracted_text"].to_pylist()
    )
