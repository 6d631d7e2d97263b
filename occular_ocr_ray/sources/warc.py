"""WARC → pages-schema ingestion — the container format real Common
Crawl ships in (ISO 28500).  Stdlib-only parser (no ``warcio``
dependency in this environment), Ray-side plumbing via
``read_binary_files`` + a flat-map batch fn.

Graft analog of the reference's file-suffix source dispatch
(``pipeline.py:284-288``): a third container format normalized to the
ONE canonical ``PAGES_SCHEMA`` so every downstream stage stays
format-agnostic (same contract as ``ingest.read_pages_json/csv``).

Scale shape: one WARC file per read task (Common Crawl segments are
~1 GB — a natural task granule); records flat-map to rows inside the
task, so nothing is ever held beyond one file's decompressed content.
Gzip is detected per file by magic; multi-member gzip (Common Crawl's
member-per-record layout) decompresses with the stdlib in one call.
Malformed records are skipped, counted per batch would be overkill —
the parser is total: any undecodable tail ends that file's record
stream, mirroring ``extract_row``'s total-function contract.
"""

from __future__ import annotations

import datetime as _dt

import pyarrow as pa
import ray.data as rd

from .pages import PAGES_SCHEMA

_CRLF2 = b"\r\n\r\n"


def _parse_warc_date(s: str | None) -> int | None:
    """WARC-Date (ISO 8601, e.g. 2017-03-22T17:00:01Z) → epoch micros."""
    if not s:
        return None
    try:
        dt = _dt.datetime.fromisoformat(s.replace("Z", "+00:00"))
        return int(dt.timestamp() * 1_000_000)
    except ValueError:
        return None


def _split_http_payload(payload: bytes) -> bytes:
    """Drop the HTTP response head from a response record's payload;
    the body (the HTML bytes) is what the pages schema carries.  A
    payload with no header separator is taken as a bare body."""
    i = payload.find(_CRLF2)
    if i >= 0 and payload[:5].upper().startswith(b"HTTP/"):
        return payload[i + len(_CRLF2):]
    return payload


def parse_warc_records(data: bytes) -> list[dict]:
    """Parse raw (already-decompressed) WARC bytes into pages rows —
    one row per ``WARC-Type: response`` record; request/metadata/
    warcinfo records are skipped.  Total: a malformed header or a
    truncated payload ends the stream without raising."""
    rows: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos:pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        head_end = data.find(_CRLF2, pos)
        if head_end < 0:
            break
        try:
            head = data[pos:head_end].decode("utf-8", errors="replace")
        except Exception:  # pragma: no cover - decode is total with replace
            break
        if not head.startswith("WARC/"):
            break
        fields: dict[str, str] = {}
        for line in head.split("\r\n")[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                fields[k.strip().lower()] = v.strip()
        try:
            length = int(fields.get("content-length", ""))
        except ValueError:
            break
        body_start = head_end + len(_CRLF2)
        body_end = body_start + length
        if body_end > n:
            break  # truncated record
        if fields.get("warc-type") == "response":
            payload = data[body_start:body_end]
            rows.append(
                {
                    "url": fields.get("warc-target-uri"),
                    "warc_ts": _parse_warc_date(fields.get("warc-date")),
                    "html": _split_http_payload(payload),
                    "text": None,
                    "lang": None,
                }
            )
        pos = body_end
    return rows


def _maybe_gunzip(data: bytes) -> bytes:
    """Multi-member-safe gunzip when the gzip magic is present (Common
    Crawl compresses each record as its own member).  Total like the
    record parser: a corrupt/truncated member yields the members
    decompressed so far instead of killing the read task — at crawl
    scale one bad shard tail must cost its own records, not the job."""
    if data[:2] != b"\x1f\x8b":
        return data
    import zlib

    out, pos = [], 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        try:
            out.append(d.decompress(data[pos:]))
            out.append(d.flush())
        except zlib.error:
            break  # corrupt member: keep what decompressed cleanly
        if not d.eof:  # truncated final member
            break
        tail = d.unused_data
        if not tail:
            break
        pos = len(data) - len(tail)
    return b"".join(out)


def _warc_paths_to_pages(batch: pa.Table) -> pa.Table:
    from pyarrow import fs as pafs

    rows: list[dict] = []
    for p in batch["path"].to_pylist():
        if "://" in p:
            fsys, rel = pafs.FileSystem.from_uri(p)
        else:
            fsys, rel = pafs.LocalFileSystem(), p
        with fsys.open_input_stream(rel, compression=None) as fh:  # RAW bytes
            data = fh.read()
        rows.extend(parse_warc_records(_maybe_gunzip(data)))
    if not rows:
        return PAGES_SCHEMA.empty_table()
    return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)


def read_pages_warc(paths) -> rd.Dataset:
    """WARC (or .warc.gz) shards → pages Dataset: one file per read
    task, records flat-mapped to PAGES_SCHEMA rows.  Bytes are read RAW
    (compression=None) and decompressed by ``_maybe_gunzip`` — Ray's
    extension-based auto-gunzip cannot be disabled and dies inside the
    read task on a torn gzip member, where the total parser instead
    salvages the shard's clean prefix."""
    if isinstance(paths, str):
        paths = [paths]
    return rd.from_items([{"path": p} for p in paths]).map_batches(
        _warc_paths_to_pages, batch_format="pyarrow", batch_size=1
    )
