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

# Characters Python's str.split() treats as whitespace cover all Unicode
# whitespace; we rely on it exclusively so the contract is exactly
# "Python 3 str.split() semantics", frozen and documented.


def normalize_ws(text: str) -> str:
    """Collapse every run of Unicode whitespace to a single ASCII space
    and strip leading/trailing whitespace.  Deterministic and total."""
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
