"""Text normalization — the graft analog of the reference's CTC greedy
decode (``models/crnn_mobilenet.py:135-161``, ``recognizer_onnx.py:128-148``):

- collapse whitespace runs  ≡  collapse repeated CTC symbols,
- drop empty tokens         ≡  drop CTC blanks,
- join with single spaces   ≡  join decoded chars.

Every choice here is part of the byte-identity contract (SURVEY.md §7
"Hard parts"): no locale dependence, no float formatting, pure
``str`` operations only.
"""

from __future__ import annotations

import re

# Characters Python's str.split() treats as whitespace cover all Unicode
# whitespace; we rely on it exclusively so the contract is exactly
# "Python 3 str.split() semantics", frozen and documented.

# Every codepoint str.split() treats as whitespace EXCEPT the plain
# ' ' — one flat character class, so the already-normalized check below
# is a single C-level scan (an alternation pattern was measurably
# slower than just doing the split).  The set is frozen by CPython's
# unicode tables; test_kernels re-derives it exhaustively and fails if
# an interpreter upgrade ever changes it.
_WS_OTHER = re.compile(
    "[\x09\x0a\x0b\x0c\x0d\x1c\x1d\x1e\x1f\x85\xa0\u1680"
    "\u2000-\u200a\u2028\u2029\u202f\u205f\u3000]"
)


def normalize_ws(text: str) -> str:
    """Collapse every run of Unicode whitespace to a single ASCII space
    and strip leading/trailing whitespace.  Deterministic and total.

    Fast path: text containing no double space, no exotic whitespace,
    and no leading/trailing space is already normalized — return it
    without the two full-string copies split+join would allocate (most
    block text is clean; on 2 MB documents those copies are a real
    share of the kernel's memory traffic, VERDICT r4 #5)."""
    if ("  " not in text
            and _WS_OTHER.search(text) is None
            and not text[:1] == " " and not text[-1:] == " "):
        return text
    return " ".join(text.split())


def decode_html_bytes(raw: bytes) -> str:
    """Decode a raw ``html`` payload to str.

    Contract: UTF-8 with ``errors="replace"`` — deterministic for any
    byte string, mirroring the reference's unconditional RGB conversion
    of arbitrary image inputs (``pipeline.py:79-92``).
    """
    return raw.decode("utf-8", errors="replace")


def join_blocks(texts: list[str]) -> str:
    """The reading-order join — analog of ``"\\n".join`` at
    ``__init__.py:94,101`` in the reference.  This exact join is the
    byte-identity surface (SURVEY.md §2.2 M13)."""
    return "\n".join(texts)
