"""PII detection/redaction kernels — a first-class training-data op:
scrub emails, phone numbers and IPv4 addresses from document text
before corpus assembly.

Patterns are deliberately RE2-compatible (no backrefs/lookarounds) so
the DuckDB oracle (`regexp_replace(..., 'g')` / `regexp_extract_all`)
replicates the semantics exactly — Python `re` and RE2 agree on these
constructs.  Replacement order is fixed (email → phone → ip) and each
pattern is applied globally; counts are taken on the ORIGINAL text.

Reference analog: the reference normalizes recognized text through a
fixed kernel chain before assembly (`ocr_skel/recognizer.py:47-56`);
same per-document pure-function shape, here for redaction.
"""

from __future__ import annotations

import re

EMAIL_RE = re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}")
PHONE_RE = re.compile(r"\+\d{1,2}-\d{3}-\d{4}")
IPV4_RE = re.compile(r"\b(?:\d{1,3}\.){3}\d{1,3}\b")

_RULES: tuple[tuple[re.Pattern, str], ...] = (
    (EMAIL_RE, "<EMAIL>"),
    (PHONE_RE, "<PHONE>"),
    (IPV4_RE, "<IP>"),
)


def scrub_pii(text: str) -> tuple[str, int, int, int]:
    """Redact PII from ``text``.  Returns
    ``(redacted, n_emails, n_phones, n_ips)`` with counts measured on
    the input (an email swallowed inside another match is still
    counted — counts are detection counts, not replacement counts)."""
    counts = [len(p.findall(text)) for p, _ in _RULES]
    out = text
    for pat, token in _RULES:
        out = pat.sub(token, out)
    return out, counts[0], counts[1], counts[2]
