"""Text-density / link-density block classifier + neighbor rescue.

Graft analog of the reference's DBNet post-processing chain
(SURVEY.md §2.2 M3-M5):

- min-length filter           ≡ area filter        (``dbnet_detector.py:145-149``)
- density/link-density score  ≡ score filter       (``dbnet_detector.py:151-155``)
- neighbor rescue (merge)     ≡ unclip expansion   (``dbnet_detector.py:110-121``)

The constant tuple below is the graft's analog of the reference's
``(THRESHOLD=0.252, BOX_THRESH=0.52, MIN_AREA=38, UNCLIP_RATIO=2.44)``
(``dbnet_detector.py:14-17``): fixed, versioned, and part of the
golden-fixture identity — changing any value changes the byte-identity
contract.
"""

from __future__ import annotations

from dataclasses import dataclass

from .html_blocks import RawBlock
from .normalize import normalize_ws

# --- frozen classifier constants (golden-contract identity) -----------
LEN_NORM = 152.0          # chars at which the length factor saturates
BOILER_PENALTY = 0.252    # multiplier for boilerplate tag paths (≡ THRESHOLD)
KEEP_THRESH = 0.52        # keep if score >= this                 (≡ BOX_THRESH)
MIN_CHARS = 38            # drop blocks shorter than this         (≡ MIN_AREA)
RESCUE_MAX_LINK_RATIO = 0.2  # neighbor-rescue eligibility        (≡ UNCLIP role)

BOILER_PATH_TAGS = frozenset({"nav", "header", "footer", "aside"})

# tag paths repeat heavily within and across documents; memoize the
# boiler-path predicate (pure function of the path string)
_BOILER_MEMO: dict[str, bool] = {}


def _is_boiler_path(tag_path: str) -> bool:
    hit = _BOILER_MEMO.get(tag_path)
    if hit is None:
        hit = any(t in BOILER_PATH_TAGS for t in tag_path.split("/"))
        if len(_BOILER_MEMO) < 65536:  # bound the memo
            _BOILER_MEMO[tag_path] = hit
    return hit


@dataclass(slots=True)
class ScoredBlock:
    text: str        # normalized block text
    tag_path: str
    score: float
    keep: bool
    link_ratio: float = 0.0


def score_block(
    b: RawBlock,
    *,
    keep_thresh: float = KEEP_THRESH,
    min_chars: int = MIN_CHARS,
    boiler_penalty: float = BOILER_PENALTY,
    len_norm: float = LEN_NORM,
) -> ScoredBlock | None:
    """Score one candidate block; ``None`` for whitespace-only blocks
    (skipped entirely, analog of the blank-line skip at
    ``pipeline.py:204``).

    The keyword thresholds are the extension surface (SURVEY.md §2.9,
    analog of the reference's detector kwargs): the DEFAULTS are the
    frozen golden-contract constants — named extractor variants pass
    overrides, the flagship never does."""
    text = normalize_ws(b.raw_text)
    n = len(text)
    if n == 0:
        return None
    link_ratio = min(1.0, b.link_chars / max(1, b.raw_chars))
    score = min(1.0, n / len_norm) * (1.0 - link_ratio)
    if _is_boiler_path(b.tag_path):
        score *= boiler_penalty
    score = min(1.0, max(0.0, score))  # custom thresholds may leave [0,1]
    keep = score >= keep_thresh and n >= min_chars
    return ScoredBlock(
        text=text, tag_path=b.tag_path, score=score, keep=keep, link_ratio=link_ratio
    )


def classify_blocks(
    raw_blocks: list[RawBlock], **thresholds
) -> list[ScoredBlock]:
    """Score every non-empty block, then run the neighbor-rescue pass:
    a dropped block sandwiched between two kept blocks (by the ORIGINAL
    keep flags — one pass, no cascading) with low link density and a
    non-boilerplate path is rescued.  Order-sensitive across blocks of
    one document, so this must stay inside the per-row fn
    (SURVEY.md §7 "Non-standard semantics")."""
    scored = [s for b in raw_blocks if (s := score_block(b, **thresholds)) is not None]
    orig_keep = [s.keep for s in scored]
    for i, s in enumerate(scored):
        if orig_keep[i]:
            continue
        if 0 < i < len(scored) - 1 and orig_keep[i - 1] and orig_keep[i + 1]:
            if _is_boiler_path(s.tag_path):
                continue
            if s.link_ratio <= RESCUE_MAX_LINK_RATIO:
                s.keep = True
    return scored
