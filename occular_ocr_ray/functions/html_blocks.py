"""HTML → candidate block stream, stdlib-only (``html.parser``).

Graft analog of the reference's DBNet binarize+segment step
(``dbnet_detector.py:136-140``): instead of thresholding a probability
map and finding contours, we split the DOM into candidate text blocks at
block-level tag boundaries, tracking per block the raw text, the DOM tag
path (geometry provenance, analog of the quad), the number of characters
inside ``<a>`` (for link-density scoring) and the inline-tag count.

Deterministic: ``html.parser.HTMLParser`` with ``convert_charrefs=True``
(entity decoding = the graft's charset/entity canonicalization, analog of
the detection preprocess ``dbnet_detector.py:77-108``).  No external
parser dependencies, so byte-identity is fully under our control
(SURVEY.md §7).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from html.parser import HTMLParser

# Private stdlib tokenizer regexes, used only by the opportunistic
# parse_starttag fast path below.  They are undocumented internals that
# could be renamed between CPython versions — a missing name must
# degrade to the (byte-identical, ~15% slower) base implementation, not
# break import.
try:
    from html.parser import attrfind_tolerant as _ATTRFIND
    from html.parser import tagfind_tolerant as _TAGFIND
except ImportError:  # pragma: no cover - depends on CPython version
    _ATTRFIND = _TAGFIND = None

# Block-level boundary tags (SURVEY.md §2.2 M2).  Opening OR closing one
# of these flushes the current block.
BLOCK_TAGS = frozenset(
    {
        "p", "div", "li", "h1", "h2", "h3", "h4", "h5", "h6", "td", "th",
        "blockquote", "pre", "article", "section", "main", "aside", "nav",
        "header", "footer", "ul", "ol", "table", "tr", "dl", "dd", "dt",
        "figure", "figcaption", "summary", "details", "form", "body",
        "br", "hr",
    }
)

# Content inside these subtrees is ignored entirely (analog of the
# reference recognizer excluding non-text pixels).
SKIP_TAGS = frozenset({"script", "style", "noscript", "template", "svg", "head", "title", "iframe"})

# Tags that never appear on the open-tag stack (HTML void elements).
VOID_TAGS = frozenset(
    {"br", "hr", "img", "input", "meta", "link", "area", "base", "col",
     "embed", "source", "track", "wbr"}
)


@dataclass(slots=True)
class RawBlock:
    """One candidate block: raw (pre-normalization) text plus the
    provenance/scoring signals.  Analog of a detected contour before
    score filtering (``dbnet_detector.py:145-155``)."""

    pieces: list[str] = field(default_factory=list)
    tag_path: str = ""
    link_chars: int = 0
    raw_chars: int = 0
    n_tags: int = 0

    @property
    def raw_text(self) -> str:
        # single-piece blocks (the overwhelming majority: ~1.1 data
        # segments per block) return the parser's slice itself — the
        # join would copy nearly the whole corpus text a second time
        # (memory-bandwidth finding, VERDICT r4 #5)
        if len(self.pieces) == 1:
            return self.pieces[0]
        return "".join(self.pieces)


class _BlockParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.stack: list[str] = []
        self.skip_depth = 0
        self.link_depth = 0
        self.blocks: list[RawBlock] = []
        self.cur = RawBlock()

    # -- hot-path override ---------------------------------------------
    def updatepos(self, i: int, j: int) -> int:
        """Line/column tracking disabled: ``getpos`` is never consulted
        (blocks carry tag-path provenance, not source offsets), and the
        base implementation's newline counting is ~7% of the whole
        parse on article-sized documents.  Token stream and handler
        calls are unaffected — byte-identity is untouched (goldens)."""
        return j

    def parse_starttag(self, i: int) -> int:
        """Attribute materialization disabled: this segmenter never
        reads ``attrs`` (handlers take the tag name only), yet the base
        ``parse_starttag`` builds + entity-unescapes an attr list for
        every tag — ~15% of parse wall on attribute-bearing documents.
        This copy keeps the EXACT stdlib tokenization (same
        ``check_for_whole_start_tag`` end-finding, same
        ``attrfind_tolerant`` positioning loop, same junk-tag-as-data
        fallback, same CDATA-mode entry) and skips only the attr
        group-extraction/unescape/list-build.  Byte-identity pinned by
        the goldens."""
        endpos = self.check_for_whole_start_tag(i)
        if endpos < 0:
            return endpos
        rawdata = self.rawdata
        match = _TAGFIND.match(rawdata, i + 1)
        assert match, "unexpected call to parse_starttag()"
        k = match.end()
        self.lasttag = tag = match.group(1).lower()
        while k < endpos:
            m = _ATTRFIND.match(rawdata, k)
            if not m:
                break
            k = m.end()
        end = rawdata[k:endpos].strip()
        if end not in (">", "/>"):
            self.handle_data(rawdata[i:endpos])
            return endpos
        if end.endswith("/>"):
            self.handle_startendtag(tag, ())
        else:
            self.handle_starttag(tag, ())
            if tag in self.CDATA_CONTENT_ELEMENTS:
                self.set_cdata_mode(tag)
        return endpos

    # -- block lifecycle ------------------------------------------------
    def _flush(self) -> None:
        # an empty cur is pristine (tag_path/link/raw counters only move
        # once pieces exist) — reuse it instead of re-allocating
        if self.cur.pieces:
            self.blocks.append(self.cur)
            self.cur = RawBlock()

    # -- HTMLParser hooks ----------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in SKIP_TAGS:
            self.skip_depth += 1
            if tag not in VOID_TAGS:
                self.stack.append(tag)
            return
        if tag in BLOCK_TAGS:
            self._flush()
        elif self.skip_depth == 0 and self.cur.pieces:
            self.cur.n_tags += 1
        if tag == "a":
            self.link_depth += 1
        if tag not in VOID_TAGS:
            self.stack.append(tag)

    def handle_endtag(self, tag: str) -> None:
        if tag in VOID_TAGS:
            return
        # Pop up to the matching open tag (lenient, like browsers).
        if tag in self.stack:
            while self.stack:
                popped = self.stack.pop()
                if popped in SKIP_TAGS:
                    self.skip_depth = max(0, self.skip_depth - 1)
                if popped == "a":
                    self.link_depth = max(0, self.link_depth - 1)
                if popped == tag:
                    break
        if tag in BLOCK_TAGS:
            self._flush()

    def handle_startendtag(self, tag: str, attrs) -> None:
        if tag in BLOCK_TAGS:
            self._flush()
        elif self.skip_depth == 0 and tag not in SKIP_TAGS and self.cur.pieces:
            self.cur.n_tags += 1

    def handle_data(self, data: str) -> None:
        if self.skip_depth > 0 or not data:
            return
        if not self.cur.pieces:
            self.cur.tag_path = "/".join(self.stack)
        self.cur.pieces.append(data)
        self.cur.raw_chars += len(data)
        if self.link_depth > 0:
            self.cur.link_chars += len(data)

    def close(self) -> None:  # final flush
        super().close()
        self._flush()


if _ATTRFIND is None or _TAGFIND is None:  # pragma: no cover
    # stdlib internals moved: drop the fast path, inherit the base
    # parse_starttag (same token stream, attrs materialized again)
    del _BlockParser.parse_starttag


def segment_html(html: str) -> list[RawBlock]:
    """Split an HTML document into candidate blocks in DOM order.

    DOM order IS reading order for HTML (SURVEY.md §2.2 M12) — no
    dataset-level sort is ever needed; ordering lives entirely within the
    row.
    """
    p = _BlockParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        # Lenient like the reference's degraded-weights path
        # (dbnet_detector.py:40-42): salvage whatever parsed.
        p._flush()
    return p.blocks
