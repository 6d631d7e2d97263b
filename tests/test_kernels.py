"""Unit tests for the pure extraction kernels (no Ray) — analog of the
reference's operator tests (``tests/test_dbnet.py``), per SURVEY.md §5.3."""

from __future__ import annotations

import json

from occular_ocr_ray.functions.classify import (
    KEEP_THRESH,
    MIN_CHARS,
    classify_blocks,
    score_block,
)
from occular_ocr_ray.functions.extract import LAYOUT_MAGIC, extract_row
from occular_ocr_ray.functions.html_blocks import RawBlock, segment_html
from occular_ocr_ray.functions.normalize import join_blocks, normalize_ws
from occular_ocr_ray.functions.xycut import xy_cut_order

LONG = (
    "This paragraph carries enough characters to clear the minimum length "
    "threshold and score as dense main content for the classifier."
)


# --- normalize ---------------------------------------------------------
def test_normalize_ws():
    assert normalize_ws("  a \t b\n\nc  ") == "a b c"
    assert normalize_ws(" x y") == "x y"  # unicode whitespace
    assert normalize_ws("") == ""
    assert normalize_ws(" \t\n") == ""
    assert join_blocks(["a", "b"]) == "a\nb"


# --- segmentation ------------------------------------------------------
def test_segment_basic_blocks():
    html = f"<html><body><p>{LONG}</p><p>Second para text.</p></body></html>"
    blocks = segment_html(html)
    texts = [normalize_ws(b.raw_text) for b in blocks if normalize_ws(b.raw_text)]
    assert texts == [LONG, "Second para text."]
    assert blocks[0].tag_path.endswith("body/p")


def test_segment_skips_script_style_head():
    html = (
        "<html><head><title>T</title><style>x{}</style></head>"
        f"<body><script>var a=1;</script><p>{LONG}</p></body></html>"
    )
    texts = [normalize_ws(b.raw_text) for b in segment_html(html)]
    assert [t for t in texts if t] == [LONG]


def test_segment_link_chars_counted():
    html = f'<body><p>{LONG} <a href="/x">click here now</a></p></body>'
    blocks = [b for b in segment_html(html) if normalize_ws(b.raw_text)]
    assert len(blocks) == 1
    assert blocks[0].link_chars == len("click here now")


def test_segment_entities_decoded():
    html = "<body><p>Fish &amp; chips &lt;now&gt;</p></body>"
    blocks = [b for b in segment_html(html) if normalize_ws(b.raw_text)]
    assert normalize_ws(blocks[0].raw_text) == "Fish & chips <now>"


def test_segment_malformed_html_is_salvaged():
    blocks = segment_html(f"<body><p>{LONG}<div><b>unclosed")
    assert any(normalize_ws(b.raw_text).startswith("This paragraph") for b in blocks)


def test_segment_fast_path_matches_stdlib_parse_starttag():
    """The parse_starttag fast path (private stdlib regex imports) is an
    opportunistic optimization only: a parser forced onto the BASE
    HTMLParser.parse_starttag — the fallback taken when the private
    names vanish in a future CPython — must produce the identical block
    stream."""
    from html.parser import HTMLParser

    from occular_ocr_ray.functions.html_blocks import _BlockParser

    class _Fallback(_BlockParser):
        parse_starttag = HTMLParser.parse_starttag
        updatepos = HTMLParser.updatepos

    samples = [
        f"<html><body><p class='x' data-a=\"1&amp;2\">{LONG}</p>"
        f"<div><a href=/y>link text here</a></div></body></html>",
        f"<body><p>{LONG}<br/><hr><td junk>cell</td>",
        "<body><p title='unterminated>odd</p><script>s</script>done",
    ]
    for html in samples:
        fast = _BlockParser()
        fast.feed(html)
        fast.close()
        slow = _Fallback()
        slow.feed(html)
        slow.close()
        assert [(b.raw_text, b.tag_path, b.link_chars, b.n_tags)
                for b in fast.blocks] == \
               [(b.raw_text, b.tag_path, b.link_chars, b.n_tags)
                for b in slow.blocks]


# --- classification ----------------------------------------------------
def _blk(text: str, path: str = "html/body/p", link: int = 0) -> RawBlock:
    b = RawBlock(pieces=[text], tag_path=path)
    b.raw_chars = len(text)
    b.link_chars = link
    return b


def test_score_keep_long_content():
    s = score_block(_blk(LONG))
    assert s is not None and s.keep and s.score >= KEEP_THRESH


def test_score_drop_short_and_linky():
    assert not score_block(_blk("tiny")).keep  # < MIN_CHARS
    linky = "word " * 20
    s = score_block(_blk(linky, link=len(linky)))  # 100% link chars
    assert not s.keep and s.score == 0.0


def test_score_boilerplate_path_penalised():
    s_main = score_block(_blk(LONG, "html/body/main/p"))
    s_nav = score_block(_blk(LONG, "html/body/nav/p"))
    assert s_nav.score < s_main.score and not s_nav.keep


def test_rescue_sandwiched_heading():
    blocks = [_blk(LONG), _blk("Short heading", "html/body/h2"), _blk(LONG + " More.")]
    scored = classify_blocks(blocks)
    assert [s.keep for s in scored] == [True, True, True]
    # not rescued when a neighbor is dropped
    scored2 = classify_blocks(blocks[:2])
    assert [s.keep for s in scored2] == [True, False]
    # nav-path blocks are never rescued
    blocks3 = [_blk(LONG), _blk("Menu item", "html/body/nav/li"), _blk(LONG)]
    assert [s.keep for s in classify_blocks(blocks3)] == [True, False, True]


def test_keep_threshold_boundary():
    # keep needs score >= KEEP_THRESH: with zero links that is
    # n/LEN_NORM >= 0.52 → n >= 80 chars; MIN_CHARS is a secondary floor.
    assert score_block(_blk("x" * 80)).keep
    assert not score_block(_blk("x" * 79)).keep
    assert not score_block(_blk("x" * (MIN_CHARS - 1))).keep


# --- XY-cut ------------------------------------------------------------
def test_xycut_two_columns():
    #  0: header band, 1-2 left col, 3-4 right col, 5 footer band
    # column gutter (20) wider than inter-row gaps (5): the classic
    # 2-column shape XY-cut must resolve columns-first inside the body.
    boxes = [
        (0, 0, 100, 10),
        (0, 20, 40, 30), (0, 35, 40, 45),
        (60, 20, 100, 30), (60, 35, 100, 45),
        (0, 60, 100, 70),
    ]
    assert xy_cut_order(boxes) == [0, 1, 2, 3, 4, 5]
    # shuffled input, same logical order
    perm = [3, 5, 0, 2, 4, 1]
    shuffled = [boxes[i] for i in perm]
    order = xy_cut_order(shuffled)
    assert [perm[i] for i in order] == [0, 1, 2, 3, 4, 5]


def test_xycut_overlapping_falls_back_to_ysort():
    boxes = [(0, 5, 10, 15), (0, 0, 10, 12)]
    assert xy_cut_order(boxes) == [1, 0]
    assert xy_cut_order([]) == []


# --- extract_row branches ---------------------------------------------
def test_native_branch():
    out = extract_row("u", b"<html>ignored</html>", "line one\n\n  line  two ")
    assert out["method"] == "native"
    assert out["extracted_text"] == "line one\nline two"
    assert [s["tag_path"] for s in out["spans"]] == ["native", "native"]
    assert all(s["score"] == 1.0 for s in out["spans"])


def test_layout_branch_reading_order():
    blocks = [
        {"bbox": [0, 50, 100, 60], "text": "bottom"},
        {"bbox": [0, 0, 100, 10], "text": "top"},
    ]
    payload = LAYOUT_MAGIC + json.dumps(blocks).encode()
    out = extract_row("u", payload, None)
    assert out["method"] == "layout"
    assert out["extracted_text"] == "top\nbottom"


def test_layout_branch_corrupt_payload():
    out = extract_row("u", LAYOUT_MAGIC + b"not json", None)
    assert out["method"] == "layout" and out["extracted_text"] == ""


def test_parsed_branch_boilerplate_stripped():
    html = (
        '<body><nav><ul><li><a href="/a">Home</a></li></ul></nav>'
        f"<main><p>{LONG}</p></main>"
        '<footer><p>Copyright.</p></footer></body>'
    ).encode()
    out = extract_row("u", html, None)
    assert out["method"] == "parsed"
    assert out["extracted_text"] == LONG
    assert out["n_blocks_kept"] == 1 and out["n_blocks_dropped"] >= 1


def test_empty_inputs():
    for html, text in [(None, None), (b"", ""), (b"<html></html>", None)]:
        out = extract_row("u", html, text)
        assert out["extracted_text"] == "" and out["n_blocks_kept"] == 0


def test_span_invariants():
    """Analog of the reference's schema-invariant smoke
    (``tests/test_smoke.py:67-78``): scores in [0,1]; spans ascending,
    non-overlapping, in-bounds; text round-trips each span."""
    from occular_ocr_ray.sources.pages import gen_page_row

    for i in range(0, 60):
        row = gen_page_row(i)
        out = extract_row(row["url"], row["html"], row["text"])
        prev_end = -1
        for s in out["spans"]:
            assert 0.0 <= s["score"] <= 1.0
            assert s["start"] > prev_end
            assert s["start"] <= s["end"] <= len(out["extracted_text"])
            seg = out["extracted_text"][s["start"]: s["end"]]
            assert seg == normalize_ws(seg) and seg
            prev_end = s["end"]
        assert out["bytes_emitted"] == len(out["extracted_text"].encode("utf-8"))


def test_registry_and_lenient_extractor():
    """Extension surface (SURVEY.md §2.9, analog of tests/test_smoke.py
    test_registry): named extractors resolve; unknown name errors with
    the available list; the lenient variant keeps strictly more blocks
    while the default path stays golden-identical."""
    import pytest as _pytest

    from occular_ocr_ray.state.registry import get_extractor
    from occular_ocr_ray.stages.extractor import DensityExtractor, LenientExtractor

    assert get_extractor("density") is DensityExtractor
    assert get_extractor("lenient") is LenientExtractor
    with _pytest.raises(ValueError, match="density"):
        get_extractor("nope")

    import pyarrow as pa

    # middle block: 45 chars → score ≈ 0.30 (lenient keeps ≥0.25,
    # default drops <0.52)
    html = (
        "<body><main><h2>A subheading of moderate length for this page</h2>"
        f"<p>{LONG}</p></main></body>"
    ).encode()
    batch = pa.table(
        {
            "url": ["u"],
            "html": pa.array([html], pa.binary()),
            "text": pa.array([None], pa.string()),
        }
    )
    default_out = DensityExtractor()(batch)
    lenient_out = LenientExtractor()(batch)
    assert (
        lenient_out["n_blocks_kept"][0].as_py() > default_out["n_blocks_kept"][0].as_py()
    )
    # default path is unchanged by the parameterization (golden safety)
    assert default_out["extracted_text"][0].as_py() == LONG


def test_normalize_ws_fast_path_equivalence():
    """The no-copy fast path in normalize_ws is sound iff the frozen char
    class covers EXACTLY the codepoints str.split() treats as whitespace —
    asserted exhaustively (a CPython unicode-table change must fail here,
    not silently break byte-identity), plus a hypothesis-style sweep of
    tricky strings through both paths."""
    import sys

    from occular_ocr_ray.functions.normalize import _WS_OTHER, normalize_ws

    missed = [c for c in map(chr, range(sys.maxunicode + 1))
              if c.isspace() and c != " " and not _WS_OTHER.search(c)]
    assert missed == []
    extra = [c for c in map(chr, range(sys.maxunicode + 1))
             if _WS_OTHER.search(c) and not c.isspace()]
    assert extra == []

    cases = [
        "", " ", "a", "a b", "a  b", " a b", "a b ", "a\tb", "a\nb",
        "a\xa0b", "a b", "plain single spaced text.",
        "\x1c\x1d\x1e\x1f", "word", "a b c d e", "  ", "a \t b",
        "tab\tend\t", "　wide　", "mixed  \n spaces",
    ]
    for s in cases:
        assert normalize_ws(s) == " ".join(s.split()), repr(s)
        # fast path taken ⇒ string must already be normalized
        if ("  " not in s and _WS_OTHER.search(s) is None
                and not s[:1] == " " and not s[-1:] == " "):
            assert s == " ".join(s.split()), repr(s)
