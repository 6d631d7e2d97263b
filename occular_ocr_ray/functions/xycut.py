"""Recursive XY-cut reading order over layout block boxes.

Graft analog of the reference's reading-order sort of detected quads by
top-left y (``pipeline.py:75-77``) generalized to 2-D layouts (the
``north_star`` requires an "XY-cut reading-order layout pass for
PDF-bearing payloads").  Published algorithm: Nagy & Seth, "Hierarchical
representation of optically scanned documents" (ICPR 1984): recursively
binary-split the box set at the widest empty gap in the x- or
y-projection profile (whichever axis has the wider gap; ties prefer y,
i.e. top-to-bottom bands), until no gap remains; leaves sort by
(y0, x0, index).

Deterministic: all comparisons use total tie-break keys, so ordering
never depends on input order beyond the documented tie-breaks.
"""

from __future__ import annotations


def _widest_gap(indices: list[int], lo: list[float], hi: list[float]):
    """Widest strictly-positive gap in the 1-D coverage of the intervals
    [lo[i], hi[i]).  Returns (gap_width, split_value) or (0.0, None)."""
    order = sorted(indices, key=lambda i: (lo[i], hi[i], i))
    best = 0.0
    split = None
    cur_hi = float("-inf")
    for i in order:
        if cur_hi != float("-inf") and lo[i] > cur_hi:
            gap = lo[i] - cur_hi
            if gap > best:
                best = gap
                split = cur_hi
        cur_hi = max(cur_hi, hi[i])
    return best, split


def xy_cut_order(bboxes: list[tuple[float, float, float, float]]) -> list[int]:
    """Return the reading order (indices into ``bboxes``)."""
    x0 = [b[0] for b in bboxes]
    y0 = [b[1] for b in bboxes]
    x1 = [b[2] for b in bboxes]
    y1 = [b[3] for b in bboxes]

    def recurse(indices: list[int]) -> list[int]:
        if len(indices) <= 1:
            return indices
        ygap, ysplit = _widest_gap(indices, y0, y1)
        xgap, xsplit = _widest_gap(indices, x0, x1)
        if ygap >= xgap and ygap > 0:  # horizontal cut → top band first
            top = [i for i in indices if y0[i] <= ysplit]
            bot = [i for i in indices if y0[i] > ysplit]
            return recurse(top) + recurse(bot)
        if xgap > 0:  # vertical cut → left column first
            left = [i for i in indices if x0[i] <= xsplit]
            right = [i for i in indices if x0[i] > xsplit]
            return recurse(left) + recurse(right)
        return sorted(indices, key=lambda i: (y0[i], x0[i], i))

    return recurse(list(range(len(bboxes))))
