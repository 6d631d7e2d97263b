"""Text-analysis kernels for large-scale training-data pipelines:
language ID (character n-gram heuristic), quality scoring, token
counting, document fingerprinting.

All deterministic, vectorizable per batch, dependency-free.  These feed
the ``stages/text_analysis.py`` actor stages and the driver query
surface.
"""

from __future__ import annotations

import hashlib
import re

# Compiled once at import; actor __init__ re-touches the module so the
# cost is paid per worker, not per batch.
_TOKEN_RE = re.compile(r"\w+|[^\w\s]", re.UNICODE)
_PUNCT_RE = re.compile(r"[^\w\s]", re.UNICODE)

# Tiny per-language marker sets for the n-gram/stopword heuristic
# (public-knowledge most-frequent words; enough for a deterministic
# heuristic over synthetic corpora).
_LANG_MARKERS: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to in is that it for was with as his on be at by".split()),
    "de": frozenset("der die und das ist von mit nicht ein eine zu den im für auf".split()),
    "fr": frozenset("le la les et de des un une est dans pour que qui sur pas".split()),
    "es": frozenset("el la los las y de que en un una es por con para no se".split()),
    "ru": frozenset("и в не на что с как по это из у за то же от".split()),
}

_STOPWORDS_EN = _LANG_MARKERS["en"]


def token_count(text: str) -> int:
    """Whitespace token count — Python ``str.split()`` semantics."""
    return len(text.split())


def bpe_ish_token_count(text: str) -> int:
    """A BPE-ish proxy: word + punctuation tokens (``\\w+|[^\\w\\s]``)."""
    return len(_TOKEN_RE.findall(text))


def lang_id(text: str) -> str:
    """Heuristic language ID: score per-language marker-word hits over
    the lowercased token stream; Cyrillic codepoint share short-circuits
    to ``ru``; empty/no-signal → ``und``.  Deterministic total order on
    ties (score desc, lang asc)."""
    if not text:
        return "und"
    n_cyr = sum(1 for ch in text[:400] if "Ѐ" <= ch <= "ӿ")
    if n_cyr > len(text[:400]) * 0.3:
        return "ru"
    toks = text.lower().split()
    if not toks:
        return "und"
    scores = {
        lang: sum(1 for t in toks if t in markers)
        for lang, markers in _LANG_MARKERS.items()
    }
    lang, hits = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    return lang if hits > 0 else "und"


def quality_score(text: str) -> float:
    """Document quality in [0,1]: blend of length saturation, word
    length sanity, punctuation balance, stopword presence (C4/Gopher-rule
    style published heuristics).  Deterministic; fixed constants."""
    n = len(text)
    if n == 0:
        return 0.0
    toks = text.split()
    n_tok = len(toks)
    if n_tok == 0:
        return 0.0
    len_factor = min(1.0, n / 1000.0)
    mean_wl = sum(len(t) for t in toks) / n_tok
    wl_factor = 1.0 if 3.0 <= mean_wl <= 10.0 else 0.5
    n_punct = len(_PUNCT_RE.findall(text))
    punct_ratio = n_punct / n
    punct_factor = 1.0 if punct_ratio <= 0.2 else max(0.0, 1.0 - (punct_ratio - 0.2) * 2)
    stop_hits = sum(1 for t in toks if t.lower() in _STOPWORDS_EN)
    stop_factor = min(1.0, 4.0 * stop_hits / n_tok) if n_tok >= 5 else 0.5
    score = 0.35 * len_factor + 0.2 * wl_factor + 0.2 * punct_factor + 0.25 * stop_factor
    return round(min(1.0, max(0.0, score)), 6)


def md5_fingerprint(text: str) -> str:
    """Exact-dedup key: md5 hex of the utf-8 text (matches DuckDB's
    ``md5()``, so it is DuckDB-oracle-checkable)."""
    return hashlib.md5(text.encode("utf-8")).hexdigest()


_ROLL_BASE = 1_000_003
_ROLL_MOD = (1 << 61) - 1


def rolling_fingerprint(text: str, window: int = 64) -> int:
    """Content-defined rolling-hash fingerprint: min of polynomial
    rolling hashes over ``window``-char windows (winnowing-style, as in
    Schleimer et al., SIGMOD 2003).  Short texts hash whole."""
    if len(text) <= window:
        h = 0
        for ch in text:
            h = (h * _ROLL_BASE + ord(ch)) % _ROLL_MOD
        return h
    pow_w = pow(_ROLL_BASE, window - 1, _ROLL_MOD)
    h = 0
    for ch in text[:window]:
        h = (h * _ROLL_BASE + ord(ch)) % _ROLL_MOD
    best = h
    for i in range(window, len(text)):
        h = ((h - ord(text[i - window]) * pow_w) * _ROLL_BASE + ord(text[i])) % _ROLL_MOD
        if h < best:
            best = h
    return best


def chunk_token_windows(
    text: str | None, max_tokens: int = 128, stride: int = 96
) -> list[tuple[int, str, int]]:
    """Context-window chunking — the trainer-feeding shape: overlapping
    windows of ``max_tokens`` whitespace tokens advancing by ``stride``
    (stride < max_tokens ⇒ max_tokens−stride tokens of overlap).  The
    final window is emitted short rather than padded; empty/None text
    yields no chunks.  Returns (index, chunk_text, n_tokens) — the token
    count comes from the slice bounds, so consumers never re-tokenize.
    Deterministic; chunk identity is (doc, index)."""
    if not 1 <= stride <= max_tokens:
        raise ValueError("require 1 <= stride <= max_tokens")
    toks = (text or "").split()
    if not toks:
        return []
    out = []
    i = 0
    while True:
        s = i * stride
        window = toks[s : s + max_tokens]
        out.append((i, " ".join(window), len(window)))
        if s + max_tokens >= len(toks):
            return out
        i += 1
