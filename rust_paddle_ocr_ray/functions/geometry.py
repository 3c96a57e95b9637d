"""Span geometry: border expansion and transitive overlap-merge.

Spans are 2-D boxes like the reference's ``imageproc::rect::Rect``:
the x-axis is character offsets into the page html (``left`` = start,
``right`` = end - 1, inclusive) and the y-axis is html line numbers
(``top`` = first line, ``bottom`` = last line, inclusive).

- ``expand``: the border-growth-with-clamp of src/det.rs:363-380
  applied on the offset axis (lines are recomputed from offsets by the
  caller).
- ``merge_overlapping``: the worklist union-merge of
  src/det.rs:388-486, bit-faithful including its *output order*
  (merged boxes are re-queued at the head for transitive closure,
  src/det.rs:413-420) and the vertical-closeness rule
  ``gap <= int(0.4 * min(height_a, height_b))`` (src/det.rs:443-460).
"""

from __future__ import annotations

from typing import NamedTuple


class Box(NamedTuple):
    left: int     # char offset of first char (inclusive)
    right: int    # char offset of last char (inclusive)
    top: int      # first html line (inclusive)
    bottom: int   # last html line (inclusive)


def expand(left: int, right: int, border: int, page_len: int) -> tuple[int, int]:
    """Grow [left, right] (inclusive) by ``border`` chars, clamped to the page
    (src/det.rs:367-372: max(0, .) / min(len - 1, .))."""
    new_left = max(left - border, 0)
    new_right = min(right + border, page_len - 1)
    return new_left, new_right


def _overlap_with_threshold(a: Box, b: Box, threshold: int) -> bool:
    """src/det.rs:429-463: horizontal overlap within +/- threshold AND
    vertical closeness within 40% of the smaller height."""
    horizontal = not (a.right + threshold < b.left - threshold or b.right + threshold < a.left - threshold)
    a_height = a.bottom - a.top + 1
    b_height = b.bottom - b.top + 1
    vertical_threshold = int(min(a_height, b_height) * 0.4)
    if a.top <= b.top:
        vertical = a.bottom + vertical_threshold >= b.top
    else:
        vertical = b.bottom + vertical_threshold >= a.top
    return horizontal and vertical


def _union(a: Box, b: Box) -> Box:
    """src/det.rs:469-486: bounding union on both axes."""
    return Box(
        min(a.left, b.left),
        max(a.right, b.right),
        min(a.top, b.top),
        max(a.bottom, b.bottom),
    )


def merge_overlapping(boxes: list[Box], threshold: int) -> list[Box]:
    """Worklist transitive merge, output order exactly as src/det.rs:388-424."""
    if not boxes:
        return boxes
    result: list[Box] = []
    queue = list(boxes)
    while queue:
        merged = queue.pop(0)
        merged_any = False
        i = 0
        while i < len(queue):
            if _overlap_with_threshold(merged, queue[i], threshold):
                merged = _union(merged, queue[i])
                queue.pop(i)
                merged_any = True
            else:
                i += 1
        if merged_any:
            queue.insert(0, merged)  # re-queue for transitive closure
        else:
            result.append(merged)
    return result
