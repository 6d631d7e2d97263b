"""URL canonicalization — the web-corpus dedup key the raw url string
is not: the same page is crawled as ``HTTP://Host/a?utm_source=x#frag``
and ``http://host/a``, and content-hash dedup misses it whenever the
page body carries per-request noise (timestamps, csrf tokens).

Stdlib-only (``urllib.parse``), deterministic, total.  Public-knowledge
rules (the conservative subset every crawler normalizes):

- scheme and host lowercased (case-insensitive per RFC 3986 §6.2.2.1)
- default ports dropped (``:80`` http, ``:443`` https)
- fragment dropped (never sent to the server)
- tracking query parameters dropped (``utm_*``, ``gclid``, ``fbclid``,
  ``msclkid``, ``mc_eid``); remaining params keep their ORDER (param
  order can be semantic — reordering would over-merge)
- empty path → ``/`` (so ``http://h`` ≡ ``http://h/``)

Deliberately NOT done (they over-merge real pages): path case-folding,
query sorting, ``index.html`` stripping, ``www.`` stripping.
"""

from __future__ import annotations

from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

_TRACKING_EXACT = frozenset({"gclid", "fbclid", "msclkid", "mc_eid"})
_DEFAULT_PORTS = {"http": ":80", "https": ":443"}


def _is_tracking(param: str) -> bool:
    return param.startswith("utm_") or param in _TRACKING_EXACT


def canonical_url(url: str | None) -> str:
    """Canonical form of ``url`` (see module docstring).  Total: None
    and unparseable inputs return '' and the input string respectively
    (never raises — crawl data carries garbage urls)."""
    if not url:
        return ""
    try:
        parts = urlsplit(url)
    except ValueError:
        return url
    scheme = parts.scheme.lower()
    netloc = parts.netloc.lower()
    default = _DEFAULT_PORTS.get(scheme)
    if default and netloc.endswith(default):
        netloc = netloc[: -len(default)]
    path = parts.path or "/"
    kept = [
        (k, v) for k, v in parse_qsl(parts.query, keep_blank_values=True)
        if not _is_tracking(k)
    ]
    query = urlencode(kept)
    return urlunsplit((scheme, netloc, path, query, ""))
