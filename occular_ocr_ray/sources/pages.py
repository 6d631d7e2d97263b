"""Deterministic synthetic ``pages`` table — exact ``input_hint`` shape
``(url:string, warc_ts:timestamp[us], html:binary, text:string,
lang:string)``.

This is the engine's ONLY test/bench input for the flagship pipeline (no
external data; BASELINE.json).  Row ``i`` is a pure function of
``(seed, i)`` — independent of table size and file sharding — so the
same url always carries the same payload at every scale and golden
fixtures stay valid.

Variant mix per FIXTURES.md (deterministic ``i % 20`` rule):
slots 0-11 article (60%), 12-14 native (15%), 15-16 layout (10%),
17 boilerplate-only (5%), 18 giant (5%), 19 dup (5%).
"""

from __future__ import annotations

import json
import random

import pyarrow as pa
import pyarrow.parquet as pq

PAGES_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)

LANGS = ("en", "ru", "de", "fr", "es", "zh")

_WORDS = (
    "stream arrow block batch shard crawl parse text density link token "
    "page corpus filter score merge span offset byte partition manifest "
    "worker actor pool schedule pipeline shuffle spill object store heap "
    "vector column table row group fragment index bucket salt key range "
    "window session event record field type cast scan prune push down "
    "graph node edge plan stage task retry lineage metric rollup wave "
    "anchor margin layout column band gap region quad contour kernel "
    "normalize collapse decode entity charset locale contract golden"
).split()

_GIANT_BYTES = 2_000_000
_EPOCH_2025 = 1735689600_000_000  # 2025-01-01T00:00:00 in microseconds


def _rng(seed: int, i: int) -> random.Random:
    return random.Random(seed * 1_000_003 + i)


def _sentence(r: random.Random, n: int) -> str:
    ws = [r.choice(_WORDS) for _ in range(n)]
    ws[0] = ws[0].capitalize()
    return " ".join(ws) + "."


def _paragraph(r: random.Random) -> str:
    return " ".join(_sentence(r, r.randint(8, 16)) for _ in range(r.randint(3, 6)))


def _nav(r: random.Random) -> str:
    items = "".join(
        f'<li><a href="/{w}">{w.capitalize()}</a></li>' for w in r.sample(_WORDS, 6)
    )
    return f"<nav><ul>{items}</ul></nav>"


def _link_farm(r: random.Random) -> str:
    links = " ".join(
        f'<a href="/t/{w}">{w} {r.choice(_WORDS)}</a>' for w in r.sample(_WORDS, 12)
    )
    return f'<aside><div class="tags">{links}</div></aside>'


def _footer(r: random.Random) -> str:
    return (
        "<footer><p>Copyright 2025 Example Corp. "
        f'<a href="/terms">Terms</a> <a href="/privacy">Privacy</a> '
        f"{_sentence(r, 5)}</p></footer>"
    )


def _article_body(r: random.Random, n_paras: int) -> str:
    parts = []
    parts.append(f"<h1>{_sentence(r, 4)[:-1]}</h1>")
    for k in range(n_paras):
        if k > 0 and r.random() < 0.3:
            parts.append(f"<h2>{_sentence(r, 3)[:-1]}</h2>")
        parts.append(f"<p>{_paragraph(r)}</p>")
        if r.random() < 0.2:
            parts.append(f'<p>{_sentence(r, 6)} <a href="/ref">source</a>.</p>')
    return "\n".join(parts)


def _article_html(r: random.Random, giant: bool = False) -> bytes:
    body = _article_body(r, r.randint(3, 8))
    if giant:
        # Tile one generated body to >= _GIANT_BYTES: cheap to generate,
        # same parse cost/skew profile as unique prose.
        unit = _article_body(r, 10)
        reps = _GIANT_BYTES // len(unit) + 1
        body = "\n".join([unit] * reps)
    html = (
        "<!DOCTYPE html><html><head><title>t</title>"
        "<style>body{margin:0}</style><script>var x=1;</script></head>"
        f"<body><header><p>Example Site &amp; Co</p></header>{_nav(r)}"
        f"<main><article>{body}</article></main>"
        f"{_link_farm(r)}{_footer(r)}</body></html>"
    )
    return html.encode("utf-8")


def _boiler_html(r: random.Random) -> bytes:
    html = (
        f"<!DOCTYPE html><html><head><title>t</title></head><body>"
        f"<header><p>Example Site</p></header>{_nav(r)}{_link_farm(r)}{_footer(r)}"
        "</body></html>"
    )
    return html.encode("utf-8")


def _native_row(r: random.Random) -> tuple[bytes, str]:
    lines = []
    for _ in range(r.randint(3, 10)):
        line = _sentence(r, r.randint(6, 14))
        if r.random() < 0.3:  # exercise whitespace normalization
            line = line.replace(" ", "  ", 1) + "\t"
        lines.append(line)
    return b"<html><body><p>native stub</p></body></html>", "\n".join(lines)


def _layout_html(r: random.Random) -> bytes:
    """Blocks with bboxes, shuffled, incl. a 2-column body."""
    blocks = [{"bbox": [0, 0, 600, 40], "text": _sentence(r, 5)}]  # header band
    y = 60
    for k in range(3):  # left column
        blocks.append({"bbox": [0, y + k * 60, 280, y + k * 60 + 50], "text": _paragraph(r)})
    for k in range(3):  # right column
        blocks.append({"bbox": [320, y + k * 60, 600, y + k * 60 + 50], "text": _paragraph(r)})
    blocks.append({"bbox": [0, 300, 600, 330], "text": _sentence(r, 6)})  # footer band
    if r.random() < 0.3:
        blocks.append({"bbox": [0, 340, 600, 350], "text": "   "})  # dropped (blank)
    r.shuffle(blocks)
    return b"LAYOUT1\n" + json.dumps(blocks, ensure_ascii=False).encode("utf-8")


def gen_page_row(i: int, seed: int = 42) -> dict:
    """Row ``i`` of the pages table — pure function of (seed, i)."""
    slot = i % 20
    if slot == 19:  # dup: exact repeat of the cycle's first article (slot 0)
        return gen_page_row(i - 19, seed)
    r = _rng(seed, i)
    variant = (
        "article" if slot <= 11 else
        "native" if slot <= 14 else
        "layout" if slot <= 16 else
        "boiler" if slot == 17 else
        "giant" if slot == 18 else
        "article"
    )
    host = i % 97
    url = f"https://host{host:03d}.example/{variant}/{i}"
    text = None
    if variant == "article":
        html = _article_html(r)
    elif variant == "native":
        html, text = _native_row(r)
    elif variant == "layout":
        html = _layout_html(r)
    elif variant == "boiler":
        html = _boiler_html(r)
    else:  # giant
        html = _article_html(r, giant=True)
    return {
        "url": url,
        "warc_ts": _EPOCH_2025 + i * 1_000_000,
        "html": html,
        "text": text,
        "lang": LANGS[i % 6],
    }


def gen_pages_table(n_rows: int, seed: int = 42, start: int = 0) -> pa.Table:
    rows = [gen_page_row(i, seed) for i in range(start, start + n_rows)]
    return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)


def write_pages(out_dir: str, n_rows: int, seed: int = 42, num_files: int = 8) -> list[str]:
    """Write the pages table as ``num_files`` parquet shards (contiguous
    row ranges) — the sharding is what the flagship pipeline's
    wave-granular resume keys on (SURVEY.md §4 Checkpoint/resume)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    per = (n_rows + num_files - 1) // num_files
    for f in range(num_files):
        start = f * per
        cnt = min(per, n_rows - start)
        if cnt <= 0:
            break
        path = os.path.join(out_dir, f"pages_{f:04d}.parquet")
        pq.write_table(gen_pages_table(cnt, seed=seed, start=start), path)
        paths.append(path)
    return paths
