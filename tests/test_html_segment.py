"""Detection segmentation/scoring unit tests (spec in functions/html.py)."""

from __future__ import annotations

from rust_paddle_ocr_ray.config import CLI_CONFIG, ExtractConfig
from rust_paddle_ocr_ray.functions.html import block_score, segment_page

CFG = CLI_CONFIG

CONTENT = "This sentence has plenty of visible characters to pass the threshold."


def wrap(body: str) -> str:
    return f"<html><body>{body}</body></html>"


def test_empty_page():
    assert segment_page("", CFG) == []


def test_content_block_kept_nav_dropped():
    page = wrap(
        f'<nav><a href="/">home sweet home</a> <a href="/x">about this site</a></nav>'
        f"<p>{CONTENT}</p>"
    )
    spans = segment_page(page, CFG)
    assert len(spans) == 1
    assert spans[0]["tag"] == "p"


def test_min_size_boundary():
    # MIN_BOX_SIZE=5 (det.rs:37): 5 visible chars dropped, 6 kept — but only
    # if the density score clears the threshold, so isolate with long pages
    cfg = ExtractConfig(density_length_norm=1.0)  # length factor saturates fast
    five = wrap("<p>abcde</p>")
    six = wrap("<p>abcdef</p>")
    assert segment_page(five, cfg) == []
    assert len(segment_page(six, cfg)) == 1


def test_script_style_content_skipped():
    page = wrap(f"<script>var x = '<p>{CONTENT}</p>';</script><p>{CONTENT}</p>")
    spans = segment_page(page, CFG)
    assert len(spans) == 1
    page2 = wrap(f"<style>p {{ color: red }}</style><p>{CONTENT}</p>")
    assert len(segment_page(page2, CFG)) == 1


def test_noscript_content_dropped():
    page = wrap(f"<noscript><p>{CONTENT}</p></noscript><p>{CONTENT}</p>")
    spans = segment_page(page, CFG)
    assert len(spans) == 1


def test_entities_counted_decoded():
    # '&amp;' counts as one visible char
    assert block_score(6, 0, False, CFG) > 0
    page = wrap("<p>a &amp; b &lt; c &gt; d</p>")  # 7 visible chars > 5
    spans = segment_page(page, ExtractConfig(density_length_norm=1.0))
    assert len(spans) == 1


def test_link_density_kills_score():
    assert block_score(100, 100, False, CFG) == 0
    assert block_score(100, 0, False, CFG) == 255
    assert block_score(100, 50, False, CFG) == 127  # (1-0.5)*1.0*255 truncated


def test_boiler_penalty():
    s_plain = block_score(100, 0, False, CFG)
    s_boiler = block_score(100, 0, True, CFG)
    assert s_boiler == s_plain // 2


def test_border_expansion_offsets():
    page = wrap(f"<p>{CONTENT}</p>")
    spans = segment_page(page, CFG)
    s = spans[0]
    assert s["tstart"] - s["start"] == min(CFG.rect_border_size, s["tstart"])
    assert s["raw"] == page[s["start"] : s["end"]]
    interior = s["raw"][s["tstart"] - s["start"] : s["tend"] - s["start"]]
    assert interior == CONTENT


def test_order_is_document_order():
    page = wrap(f"<p>{CONTENT}</p><p>{CONTENT} again and again.</p><h1>{CONTENT}</h1>")
    spans = segment_page(page, CFG)
    assert [s["order"] for s in spans] == [0, 1, 2]
    assert [s["tag"] for s in spans] == ["p", "p", "h1"]
    assert spans[0]["start"] < spans[1]["start"] < spans[2]["start"]


def test_br_splits_blocks():
    cfg = ExtractConfig(density_length_norm=1.0)
    page = wrap("<p>first half before<br>second half after</p>")
    spans = segment_page(page, cfg)
    assert len(spans) == 2


def test_max_spans_cap():
    cfg = ExtractConfig(max_spans_per_page=3)
    page = wrap("".join(f"<p>{CONTENT}</p>" for _ in range(10)))
    assert len(segment_page(page, cfg)) == 3


def test_merge_boxes_on_same_line():
    cfg = ExtractConfig(merge_boxes=True, rect_border_size=12, density_length_norm=1.0)
    # two blocks on one html line, close enough for expanded boxes to overlap
    page = wrap("<p>first block text</p><p>second block text</p>")
    spans = segment_page(page, cfg)
    assert len(spans) == 1
    merged = spans[0]
    assert "first block text" in merged["raw"] and "second block text" in merged["raw"]


def test_max_spans_per_page_skew_guard():
    """The skew guard (ExtractConfig.max_spans_per_page, SURVEY.md §4)
    caps spans emitted for pathological pages so no single url can
    dominate a merge group."""
    import dataclasses

    from rust_paddle_ocr_ray.config import CLI_CONFIG
    from rust_paddle_ocr_ray.functions.html import segment_page

    page = "<html><body>" + "".join(
        f"<p>paragraph number {i} with plenty of visible characters here</p>"
        for i in range(200)
    ) + "</body></html>"
    full = segment_page(page, CLI_CONFIG)
    assert len(full) == 200
    capped_cfg = dataclasses.replace(CLI_CONFIG, max_spans_per_page=10)
    capped = segment_page(page, capped_cfg)
    assert len(capped) == 10
    # the kept spans are the FIRST 10 in reading order
    assert [s["order"] for s in capped] == list(range(10))
    assert capped == full[:10]


def test_skew_split_rows_spreads_heavy_page(ray_session):
    """ExtractConfig.skew_split_rows (SURVEY.md §4's repartition knob):
    a pathological page's span stream must split into multiple blocks —
    multiple recognition tasks — and the end-to-end extraction must be
    unchanged (the merge stage reroutes the split boundary partials)."""
    import dataclasses

    import pyarrow as pa

    import ray.data as rd

    from rust_paddle_ocr_ray.config import CLI_CONFIG
    from rust_paddle_ocr_ray.pipelines.extract import ExtractPipeline
    from rust_paddle_ocr_ray.sources.synth import PAGES_SCHEMA

    page = "<html><body>" + "".join(
        f"<p>paragraph number {i} with plenty of visible characters here</p>"
        for i in range(2000)
    ) + "</body></html>"
    tbl = pa.Table.from_pylist(
        [{"url": "https://heavy.test/0", "warc_ts": 0, "html": page.encode(),
          "text": "", "lang": "en"}],
        schema=PAGES_SCHEMA,
    )

    base_cfg = dataclasses.replace(CLI_CONFIG, max_spans_per_page=100_000)
    split_cfg = dataclasses.replace(base_cfg, skew_split_rows=250)
    plain = ExtractPipeline(base_cfg)
    split = ExtractPipeline(split_cfg)

    spans = plain.detect(rd.from_arrow(tbl))
    assert plain.split_for_skew(spans).materialize().num_blocks() == 1
    n_split = split.split_for_skew(spans).materialize().num_blocks()
    assert n_split >= 2000 // 250  # the heavy page spreads across tasks

    a = plain.run(rd.from_arrow(tbl)).to_pandas()
    b = split.run(rd.from_arrow(tbl)).to_pandas()
    assert a["extracted_text"].iloc[0] == b["extracted_text"].iloc[0]
    assert int(b["n_spans"].iloc[0]) == 2000


def test_pathological_pages_never_crash_or_hang():
    """Crawl-shaped adversarial inputs: the iterative tokenizer must
    stay linear and exception-free at any nesting depth or tag soup
    (100 TB of real crawl WILL contain all of these)."""
    import time

    long_text = "deep text content here long enough to pass the span gate " * 3
    cases = {
        "deep_nesting": "<div>" * 50_000 + long_text + "</div>" * 50_000,
        "huge_attr": "<p " + "a" * 1_000_000 + ">" + long_text + "</p>",
        "unterminated_attr": "<p onclick='" + "y" * 100_000,
        "comment_bomb": "<!--" * 50_000 + long_text,
        "unclosed_script": "<script>var a='" + "z" * 500_000,
        "null_and_invalid_utf8_markers": "<p>" + long_text + "\x00�</p>",
        "open_tag_flood": "<div" * 10_000 + ">" + long_text,
    }
    for name, page in cases.items():
        t0 = time.time()
        blocks = segment_page(page, CLI_CONFIG)
        assert time.time() - t0 < 10, name
        assert isinstance(blocks, list), name
    # deep nesting must still EXTRACT the content, not just survive
    deep = segment_page("<div>" * 500 + long_text + "</div>" * 500, CLI_CONFIG)
    assert len(deep) == 1 and deep[0]["depth"] == 500
