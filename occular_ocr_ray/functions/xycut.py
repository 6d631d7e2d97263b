"""Recursive XY-cut reading order over layout block boxes.

Graft analog of the reference's reading-order sort of detected quads by
top-left y (``pipeline.py:75-77``) generalized to 2-D layouts (the
``north_star`` requires an "XY-cut reading-order layout pass for
PDF-bearing payloads").  Published algorithm: Nagy & Seth, "Hierarchical
representation of optically scanned documents" (ICPR 1984).

Deterministic: all splits/sorts use total tie-break keys (min-y, min-x,
original index) so stable ordering never depends on input order beyond
the documented tie-breaks.
"""

from __future__ import annotations


def _gap_groups(indices: list[int], lo: list[float], hi: list[float]) -> list[list[int]]:
    """Partition ``indices`` into groups separated by strictly-positive
    gaps in the 1-D interval coverage of [lo[i], hi[i])."""
    order = sorted(indices, key=lambda i: (lo[i], hi[i], i))
    groups: list[list[int]] = []
    cur: list[int] = []
    cur_hi = float("-inf")
    for i in order:
        if cur and lo[i] > cur_hi:
            groups.append(cur)
            cur = []
        cur.append(i)
        cur_hi = max(cur_hi, hi[i])
    if cur:
        groups.append(cur)
    return groups


def xy_cut_order(bboxes: list[tuple[float, float, float, float]]) -> list[int]:
    """Return the reading order (indices into ``bboxes``) by recursive
    XY-cut: prefer horizontal cuts (top-to-bottom bands), then vertical
    cuts (left-to-right columns); leaves sort by (y0, x0, index)."""
    x0 = [b[0] for b in bboxes]
    y0 = [b[1] for b in bboxes]
    x1 = [b[2] for b in bboxes]
    y1 = [b[3] for b in bboxes]

    def recurse(indices: list[int], allow: str) -> list[int]:
        if len(indices) <= 1:
            return indices
        if allow in ("xy", "y"):
            bands = _gap_groups(indices, y0, y1)
            if len(bands) > 1:
                out: list[int] = []
                for band in bands:
                    out.extend(recurse(band, "xy"))
                return out
        if allow in ("xy", "x"):
            cols = _gap_groups(indices, x0, x1)
            if len(cols) > 1:
                out = []
                for col in cols:
                    # full alternation terminates: every cut strictly
                    # shrinks the group, and a re-cut of a freshly-made
                    # maximal group on the same axis yields one group.
                    out.extend(recurse(col, "xy"))
                return out
        return sorted(indices, key=lambda i: (y0[i], x0[i], i))

    return recurse(list(range(len(bboxes))), "xy")
