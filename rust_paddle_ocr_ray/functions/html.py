"""HTML block segmentation + text-density scoring (the detection math).

This is the detection stage's core: the analog of the reference's
det-model preprocessing + forward + binarize + contour steps
(/root/reference/src/det.rs:176-383), specified for HTML pages instead
of rasters.  As with the decode module, the behavior defined here is
THE spec; ``tests/oracle_impl.py`` re-implements it independently and
the goldens assert span-identical output.

Segmentation (M1 analog, det.rs:176-230): a single-pass tag tokenizer
walks the decoded html.  Text accumulates into the *current block*;
any open or close of a block-level tag (or <br>/<hr>, or a raw-text
element like <script>) flushes the block.  <script>/<style>/
<noscript>/<template> contents are skipped entirely.  Per block we
track: the raw text runs (offsets into the html string), the count of
visible (non-whitespace, entity-decoded) characters, how many of those
sit inside <a> links, the innermost enclosing block tag, its depth,
and whether it sits inside boilerplate (<nav>/<footer>/<header>/
<aside>).

Scoring (M2 analog, det.rs:232-348): the "probability map" value of a
block is

    link_density  = link_chars / vis_chars
    length_factor = min(1, vis_chars / density_length_norm)
    p = (1 - link_density) * (floor + (1 - floor) * length_factor)
    p *= boiler_penalty                       if inside boilerplate
    score_byte = min(int(p * 255.0), 255)     # det.rs:342 (x*255).min(255) as u8

Selection (M3/M4, det.rs:351-360, 491-518): keep blocks with
``score_byte > threshold`` (strict, THRESHOLD=200) and
``vis_chars > min_box_size`` (MIN_BOX_SIZE=5; 1-D analog — only the
width rule maps, html blocks have no meaningful pixel height).

Expansion (M5, det.rs:363-380): grow the tight [first, last] visible
char offsets by ``rect_border_size`` chars, clamped to the page.

Merge (D1, det.rs:388-486, off by default): the transitive worklist
merge from ``functions.geometry`` over (char-offset, html-line) boxes.
"""

from __future__ import annotations

import html as _htmlmod
import re
from bisect import bisect_left

from ..config import ExtractConfig

#: every branch ends with ``(?:...|\Z)``: an UNTERMINATED comment /
#: declaration / tag consumes to end-of-input (the HTML5 rule for
#: unterminated comments) instead of failing the match.  Without the
#: fallback, each failing "<" start rescans to EOF inside the
#: backtracking alternation — adversarial pages like ``"<!--" * 50k``
#: (real crawls have them) turn the tokenizer O(n^2): measured 54 s
#: for a 200 KB page, linear ~10 ms after.
TOKEN_RE = re.compile(
    r"<!--.*?(?:-->|\Z)|<[!?][^>]*(?:>|\Z)"
    r"|<(/?)([a-zA-Z][a-zA-Z0-9]*)[^>]*(?:>|\Z)",
    re.S,
)

BLOCK_TAGS = frozenset(
    "html head body p div h1 h2 h3 h4 h5 h6 li ul ol dl dt dd table thead tbody "
    "tr td th title nav footer header aside article section main blockquote pre "
    "form figure figcaption fieldset select option textarea button noscript "
    "template".split()
)
VOID_BOUNDARY_TAGS = frozenset({"br", "hr"})
RAWTEXT_TAGS = frozenset({"script", "style"})  # CDATA content, skipped wholesale
DROP_CONTAINER_TAGS = frozenset({"noscript", "template"})  # parsed, text not counted
BOILER_TAGS = frozenset({"nav", "footer", "header", "aside"})


def block_score(vis_chars: int, link_chars: int, boiler: bool, cfg: ExtractConfig) -> int:
    """Density score byte in [0, 255] for one block (see module docstring)."""
    if vis_chars <= 0:
        return 0
    link_density = link_chars / vis_chars
    floor = cfg.density_length_floor
    length_factor = min(1.0, vis_chars / cfg.density_length_norm)
    p = (1.0 - link_density) * (floor + (1.0 - floor) * length_factor)
    if boiler:
        p *= cfg.boiler_penalty
    return min(int(p * 255.0), 255)


class _Block:
    __slots__ = ("runs", "vis", "link", "tag", "depth", "boiler")

    def __init__(self) -> None:
        self.runs: list[tuple[int, int]] = []
        self.vis = 0
        self.link = 0
        self.tag = ""
        self.depth = 0
        self.boiler = False


def segment_page(page: str, cfg: ExtractConfig) -> list[dict]:
    """Segment one html page into scored, filtered, expanded span dicts.

    Returned keys: block_id, start, end, line_start, line_end, tag,
    depth, order, score, raw.  ``order`` is the reading-order key the
    merge stage sorts on (SURVEY.md §2.6 — the reference's implicit
    contour-scan order made explicit).
    """
    n = len(page)
    spans: list[dict] = []
    if n == 0:
        return spans

    page_lower = page.lower()
    newlines: list[int] = []
    _j = page.find("\n")
    while _j != -1:
        newlines.append(_j)
        _j = page.find("\n", _j + 1)

    stack: list[str] = []  # open block tags
    link_depth = 0
    boiler_depth = 0
    drop_depth = 0
    blocks: list[_Block] = []
    cur = _Block()

    def add_text(a: int, b: int) -> None:
        if drop_depth > 0:
            return
        seg = page[a:b]
        if not seg or seg.isspace():
            if seg:
                cur.runs.append((a, b))
            return
        cur.runs.append((a, b))
        decoded = _htmlmod.unescape(seg)
        # non-whitespace char count; str.split() splits on the same Unicode
        # whitespace set as str.isspace(), at C speed (map(len, ...) keeps
        # the summation frame-free — this line runs once per text run)
        vis = sum(map(len, decoded.split()))
        cur.vis += vis
        if link_depth > 0:
            cur.link += vis

    def flush() -> None:
        # the stack is unchanged between a block's first text and its flush
        # (block boundaries flush before mutating the stack), so the context
        # captured here is the context the text accumulated in
        nonlocal cur
        if cur.vis > 0:
            cur.tag = stack[-1] if stack else ""
            cur.depth = len(stack)
            cur.boiler = boiler_depth > 0
            blocks.append(cur)
        cur = _Block()

    pos = 0
    while pos < n:
        m = TOKEN_RE.search(page, pos)
        if m is None:
            add_text(pos, n)
            break
        if m.start() > pos:
            add_text(pos, m.start())
        pos = m.end()
        tag = m.group(2)
        if tag is None:  # comment or <!...>/<?...> declaration
            continue
        closing = m.group(1) == "/"
        tag = tag.lower()
        if not closing and tag in RAWTEXT_TAGS:
            flush()
            close_at = page_lower.find("</" + tag, pos)
            if close_at == -1:
                pos = n
            else:
                gt = page.find(">", close_at)
                pos = n if gt == -1 else gt + 1
            continue
        if tag == "a":
            if closing:
                link_depth = max(0, link_depth - 1)
            else:
                link_depth += 1
            continue
        if tag in VOID_BOUNDARY_TAGS:
            flush()
            continue
        if tag in BLOCK_TAGS:
            flush()
            if closing:
                if tag in stack:
                    while stack:
                        t = stack.pop()
                        if t in BOILER_TAGS:
                            boiler_depth = max(0, boiler_depth - 1)
                        if t in DROP_CONTAINER_TAGS:
                            drop_depth = max(0, drop_depth - 1)
                        if t == tag:
                            break
            else:
                stack.append(tag)
                if tag in BOILER_TAGS:
                    boiler_depth += 1
                if tag in DROP_CONTAINER_TAGS:
                    drop_depth += 1
        # non-block inline tags (span, b, i, em, img, ...) are transparent
    flush()

    # --- score, threshold (M3), min-size (M4) ---
    kept: list[tuple[_Block, int]] = []
    for blk in blocks:
        score = block_score(blk.vis, blk.link, blk.boiler, cfg)
        if score > cfg.threshold and blk.vis > cfg.min_box_size:
            kept.append((blk, score))
            if len(kept) >= cfg.max_spans_per_page:
                break  # skew guard (no reference analog)

    # --- tight bounds + border expansion (M5) ---
    def line_of(offset: int) -> int:
        return bisect_left(newlines, offset) if newlines else 0

    boxes: list[tuple[int, int, int, int]] = []  # left, right (incl), top, bottom
    tights: list[tuple[int, int]] = []  # first, last visible char (incl)
    attrs: list[tuple[str, int, int]] = []  # tag, depth, score
    for blk, score in kept:
        first = last = -1
        for a, b in blk.runs:
            seg = page[a:b]
            stripped = seg.lstrip()
            if stripped:
                first = a + (len(seg) - len(stripped))
                break
        for a, b in reversed(blk.runs):
            seg = page[a:b]
            stripped = seg.rstrip()
            if stripped:
                last = a + len(stripped) - 1
                break
        if first == -1:
            continue
        left = max(first - cfg.rect_border_size, 0)
        right = min(last + cfg.rect_border_size, n - 1)
        boxes.append((left, right, line_of(left), line_of(right)))
        tights.append((first, last))
        attrs.append((blk.tag, blk.depth, score))

    # --- optional transitive merge (D1) ---
    if cfg.merge_boxes and boxes:
        from .geometry import Box, merge_overlapping

        merged = merge_overlapping([Box(*b) for b in boxes], cfg.merge_threshold)
        claimed = [False] * len(boxes)
        out_boxes: list[tuple[int, int, int, int]] = []
        out_tights: list[tuple[int, int]] = []
        out_attrs: list[tuple[str, int, int]] = []
        for mb in merged:
            pick = -1
            t_first, t_last = mb.left, mb.right
            contained = [
                i
                for i, ob in enumerate(boxes)
                if ob[0] >= mb.left and ob[1] <= mb.right and ob[2] >= mb.top and ob[3] <= mb.bottom
            ]
            if contained:
                t_first = min(tights[i][0] for i in contained)
                t_last = max(tights[i][1] for i in contained)
                for i in contained:
                    if not claimed[i]:
                        pick = i
                        break
            if pick >= 0:
                claimed[pick] = True
                out_attrs.append(attrs[pick])
            else:
                out_attrs.append(("", 0, 0))
            out_boxes.append((mb.left, mb.right, mb.top, mb.bottom))
            out_tights.append((t_first, t_last))
        boxes, tights, attrs = out_boxes, out_tights, out_attrs

    for order, ((left, right, top, bottom), (t_first, t_last), (tag, depth, score)) in enumerate(
        zip(boxes, tights, attrs)
    ):
        spans.append(
            {
                "block_id": order,
                "start": left,
                "end": right + 1,
                "tstart": t_first,
                "tend": t_last + 1,
                "line_start": top,
                "line_end": bottom,
                "tag": tag,
                "depth": depth,
                "order": order,
                "score": float(score),
                # the expanded slice is carried (the "crop" incl. border,
                # det.rs:137-152); recognition decodes only the tight interior
                "raw": page[left : right + 1],
            }
        )
    return spans
