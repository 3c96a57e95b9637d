"""Merge-worklist + border-expansion unit fixtures (FIXTURES.md §4;
reference semantics /root/reference/src/det.rs:363-486)."""

from __future__ import annotations

from rust_paddle_ocr_ray.functions.geometry import Box, expand, merge_overlapping


def test_expand_clamps_to_page():
    # det.rs:367-372: max(0, .) / min(len-1, .)
    assert expand(5, 20, 10, 100) == (0, 30)
    assert expand(50, 95, 10, 100) == (40, 99)
    assert expand(0, 99, 10, 100) == (0, 99)


def test_merge_transitivity():
    # A overlaps B, AB overlaps C, but A does not overlap C directly:
    # the re-queue-at-head worklist (det.rs:413-420) must close transitively
    a = Box(0, 10, 0, 0)
    b = Box(8, 30, 0, 0)
    c = Box(28, 50, 0, 0)
    merged = merge_overlapping([a, b, c], threshold=1)
    assert merged == [Box(0, 50, 0, 0)]


def test_merge_output_order_is_worklist_order():
    # two disjoint clusters: first-popped cluster lands first in the result
    a = Box(0, 10, 0, 0)
    far = Box(100, 110, 0, 0)
    b = Box(9, 20, 0, 0)
    merged = merge_overlapping([a, far, b], threshold=1)
    assert merged == [Box(0, 20, 0, 0), Box(100, 110, 0, 0)]


def test_horizontal_threshold():
    # gap of exactly 2*threshold+? — det.rs:429-438 expands both edges by
    # threshold: [0,10] and [13,20] with threshold=1 -> 11 vs 12: no touch
    assert merge_overlapping([Box(0, 10, 0, 0), Box(13, 20, 0, 0)], 1) == [
        Box(0, 10, 0, 0),
        Box(13, 20, 0, 0),
    ]
    # [0,10] and [12,20] with threshold=1 -> a_right+1=11 >= b_left-1=11: touch
    assert merge_overlapping([Box(0, 10, 0, 0), Box(12, 20, 0, 0)], 1) == [Box(0, 20, 0, 0)]


def test_vertical_forty_percent_rule():
    # det.rs:443-460: gap <= int(0.4 * min(height)) — heights 10 -> vt=4
    a = Box(0, 10, 0, 9)      # bottom=9
    b_close = Box(5, 15, 13, 22)   # top=13, gap: 9+4 >= 13 -> close
    b_far = Box(5, 15, 14, 23)     # top=14, 9+4 < 14 -> not close
    assert merge_overlapping([a, b_close], 1) == [Box(0, 15, 0, 22)]
    assert merge_overlapping([a, b_far], 1) == [a, b_far]


def test_vertical_rule_single_line_boxes():
    # height-1 boxes: vt = int(0.4) = 0 -> only same/adjacent-overlapping lines merge
    a = Box(0, 10, 5, 5)
    b = Box(8, 20, 5, 5)
    c = Box(8, 20, 6, 6)
    assert merge_overlapping([a, b], 1) == [Box(0, 20, 5, 5)]
    assert merge_overlapping([a, c], 1) == [a, c]


def test_merge_empty():
    assert merge_overlapping([], 1) == []
