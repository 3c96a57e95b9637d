"""Equivalence of the dedup formulations (stages/merge.py).

"planned" (key-scan + winner filter + streaming merge) must produce the
same extracted table as "at_merge" (single bucket-groupby exchange) on a
corpus with duplicate urls — and exact-warc_ts ties must collapse to one
row per url in both, with tie versions' spans concatenated.
"""

from __future__ import annotations

import dataclasses

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data as rd

from rust_paddle_ocr_ray.config import CLI_CONFIG
from rust_paddle_ocr_ray.pipelines.extract import ExtractPipeline
from rust_paddle_ocr_ray.sources.synth import PAGES_SCHEMA, generate_pages


@pytest.fixture(scope="module")
def dup_corpus(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("dup") / "pages.parquet")
    pq.write_table(generate_pages(150, seed=9), p)  # ~7 dup urls (+1 day ts)
    return p


def _run(mode: str, path: str) -> pd.DataFrame:
    cfg = dataclasses.replace(CLI_CONFIG, dedup_mode=mode)
    df = ExtractPipeline(cfg).run_paths(path).to_pandas()
    return df.sort_values("url").reset_index(drop=True)


def test_planned_equals_at_merge(ray_session, dup_corpus):
    a = _run("planned", dup_corpus)
    b = _run("at_merge", dup_corpus)
    pd.testing.assert_frame_equal(a, b)
    assert a["url"].is_unique


def test_exact_ts_ties_collapse(ray_session, tmp_path):
    """Two versions with identical (url, warc_ts) but different html must
    still yield ONE output row (tie spans concatenate, matching the
    single-exchange formulation)."""
    base = generate_pages(40, seed=3).to_pylist()
    v1 = dict(base[1])
    v2 = dict(base[2])
    v2["url"] = v1["url"]
    v2["warc_ts"] = v1["warc_ts"]  # exact tie, different content
    rows = base + [v2]
    path = str(tmp_path / "ties.parquet")
    pq.write_table(pa.Table.from_pylist(rows, schema=PAGES_SCHEMA), path)

    planned = _run("planned", path)
    at_merge = _run("at_merge", path)
    assert planned["url"].is_unique
    assert at_merge["url"].is_unique
    tie_row_p = planned[planned["url"] == v1["url"]].iloc[0]
    tie_row_m = at_merge[at_merge["url"] == v1["url"]].iloc[0]
    # both versions' spans merged (more spans than either single page)
    assert tie_row_p["n_spans"] == tie_row_m["n_spans"]
    assert tie_row_p["extracted_text"] == tie_row_m["extracted_text"]


def test_distributed_plan_matches_local(ray_session, dup_corpus):
    """The distributed planning scan (plan_url_dedup — the >20M-row
    branch) must produce the same winners/ties as the driver-local
    fast path used below plan_local_max_rows."""
    import ray.data as rd

    from rust_paddle_ocr_ray.stages.merge import plan_url_dedup, plan_url_dedup_local

    local_w, local_t = plan_url_dedup_local(dup_corpus)
    keys = rd.read_parquet(dup_corpus, columns=["url", "warc_ts"])
    dist_w, dist_t = plan_url_dedup(keys)
    assert dist_w == local_w
    assert dist_t == local_t
    assert len(local_w) > 0  # the corpus really has dup urls


def test_planned_correct_under_block_splits(ray_session, dup_corpus):
    """Regression (ADVICE r1, high): Ray splits large map outputs at
    DataContext.target_max_block_size, so one (url, warc_ts) version's
    spans can straddle two blocks.  The planned path must route the
    batch-boundary partials through the bucket exchange instead of
    finalizing them streaming — otherwise split versions emit duplicate
    url rows with fragmented text."""
    from ray.data import DataContext

    ctx = DataContext.get_current()
    old = ctx.target_max_block_size
    try:
        ctx.target_max_block_size = 16 * 1024  # force mid-page splits
        planned = _run("planned", dup_corpus)
        at_merge = _run("at_merge", dup_corpus)
    finally:
        ctx.target_max_block_size = old
    assert planned["url"].is_unique
    # float tolerance on confidence: split-version partials sum in a
    # different association order than the single-pass combine
    pd.testing.assert_frame_equal(planned, at_merge, rtol=0, atol=1e-12)


def test_streaming_mode_page_aligned_yields(ray_session, dup_corpus):
    """With target_max_block_size past the streaming-safe bound
    (worst_page_span_bytes(cfg) <= 0.45 x target — see
    stages.recognize.streaming_merge_safe) the pipeline statically
    selects the zero-exchange streaming finalize and relies on the
    recognizer's greedy page-aligned bounded yields to keep block cuts
    between pages.  Verify the guarantee holds with a target small
    enough that many blocks are produced, i.e. the streaming path
    really is exercised AND correct — and that below the bound the
    pipeline refuses to stream."""
    from ray.data import DataContext

    from rust_paddle_ocr_ray.config import ExtractConfig
    from rust_paddle_ocr_ray.stages.recognize import (
        page_aligned_yield_cap,
        worst_page_span_bytes,
    )

    cfg = dataclasses.replace(
        ExtractConfig().cli(), max_html_bytes=64 * 1024,
        max_spans_per_page=256, dedup_mode="planned",
    )
    pipe = ExtractPipeline(cfg)
    ctx = DataContext.get_current()
    old = ctx.target_max_block_size
    try:
        # below the bound (the worst-case page — text bound PLUS the
        # span-count x per-span allowance the r3 model ignored — does
        # not fit the cap): boundary routing
        ctx.target_max_block_size = 4 * cfg.max_html_bytes
        assert worst_page_span_bytes(cfg) > page_aligned_yield_cap(
            ctx.target_max_block_size)
        assert pipe._splits_possible()
        ctx.target_max_block_size = 16 * cfg.max_html_bytes  # above the bound
        assert worst_page_span_bytes(cfg) <= page_aligned_yield_cap(
            ctx.target_max_block_size)
        assert not pipe._splits_possible()
        planned = pipe.run_paths(dup_corpus).to_pandas().sort_values("url").reset_index(drop=True)
        # at_merge twin under the SAME detection config (max_spans_per_page
        # binds on this corpus) — only the merge formulation differs
        at_merge = (
            ExtractPipeline(dataclasses.replace(cfg, dedup_mode="at_merge"))
            .run_paths(dup_corpus).to_pandas()
            .sort_values("url").reset_index(drop=True)
        )
    finally:
        ctx.target_max_block_size = old
    assert planned["url"].is_unique
    pd.testing.assert_frame_equal(planned, at_merge, rtol=0, atol=1e-12)


def test_scattered_merge_is_layout_independent(ray_session, dup_corpus):
    """merge_extracted(scattered=True) must reproduce the pipeline's
    extracted table even when span rows arrive fully shuffled (the
    combiner fast path is allowed to assume page-contiguous batches;
    the scattered path is not)."""
    import numpy as np

    from rust_paddle_ocr_ray.stages.merge import merge_extracted

    pipe = ExtractPipeline(dataclasses.replace(CLI_CONFIG, dedup_mode="at_merge"))
    spans = pipe.recognize(pipe.detect(pipe.read_pages(dup_corpus)))
    spans_df = spans.to_pandas()
    expected = (
        pipe.merge(spans).to_pandas().sort_values("url").reset_index(drop=True)
    )

    rng = np.random.RandomState(7)
    shuffled = spans_df.iloc[rng.permutation(len(spans_df))].reset_index(drop=True)
    scattered_ds = rd.from_pandas(shuffled).repartition(7)
    got = (
        merge_extracted(scattered_ds, scattered=True)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, expected)


def test_local_plan_applies_max_winners_bound(ray_session, dup_corpus):
    """plan_url_dedup_local must honor the same driver bound as the
    distributed plan (ADVICE r3): above ``max_winners`` the exact
    winners dict degrades to a bloom of dup urls, and the pipeline
    output is unchanged (dups dedup in the merge exchange instead)."""
    from rust_paddle_ocr_ray.functions.bloom import BloomFilter
    from rust_paddle_ocr_ray.stages.merge import plan_url_dedup_local

    exact_w, _ = plan_url_dedup_local(dup_corpus)
    assert len(exact_w) > 0
    bloom, ties = plan_url_dedup_local(dup_corpus, max_winners=0)
    assert isinstance(bloom, BloomFilter)
    assert ties == frozenset()
    assert bloom.contains_many(
        pd.Series(sorted(exact_w)).to_numpy(dtype=object)
    ).all()  # no false negatives on the dup urls

    cfg = dataclasses.replace(CLI_CONFIG, dedup_mode="planned", dedup_max_winners=0)
    a = (ExtractPipeline(cfg).run_paths(dup_corpus).to_pandas()
         .sort_values("url").reset_index(drop=True))
    b = _run("at_merge", dup_corpus)
    pd.testing.assert_frame_equal(a, b)


# --------------------------------------------------------------------------
# _page_aligned_slices: greedy no-overshoot cuts + strict model check
# --------------------------------------------------------------------------

def _span_table(pages: list[tuple[str, int, int]]) -> pa.Table:
    """Recognized-span-shaped table: (url, n_spans, text_bytes_per_span)."""
    import numpy as np

    cols = {k: [] for k in ("url", "warc_ts", "lang", "block_id", "start", "end",
                            "tstart", "tend", "line_start", "line_end", "tag",
                            "depth", "order", "score", "text", "confidence")}
    for url, n_spans, tb in pages:
        for i in range(n_spans):
            cols["url"].append(url)
            cols["warc_ts"].append(pd.Timestamp("2024-01-01"))
            cols["lang"].append("en")
            cols["block_id"].append(i)
            for k in ("start", "end", "tstart", "tend"):
                cols[k].append(0)
            for k in ("line_start", "line_end", "depth", "order"):
                cols[k].append(i)
            cols["tag"].append("p")
            cols["score"].append(230.0)
            cols["text"].append("x" * tb)
            cols["confidence"].append(0.9)
    t = pa.table({
        "url": pa.array(cols["url"]),
        "warc_ts": pa.array(cols["warc_ts"], pa.timestamp("us")),
        "lang": pa.array(cols["lang"]),
        "block_id": pa.array(cols["block_id"], pa.int32()),
        "start": pa.array(cols["start"], pa.int64()),
        "end": pa.array(cols["end"], pa.int64()),
        "tstart": pa.array(cols["tstart"], pa.int64()),
        "tend": pa.array(cols["tend"], pa.int64()),
        "line_start": pa.array(cols["line_start"], pa.int32()),
        "line_end": pa.array(cols["line_end"], pa.int32()),
        "tag": pa.array(cols["tag"]),
        "depth": pa.array(cols["depth"], pa.int32()),
        "order": pa.array(cols["order"], pa.int32()),
        "score": pa.array(cols["score"], pa.float32()),
        "text": pa.array(cols["text"]),
        "confidence": pa.array(cols["confidence"], pa.float64()),
    })
    return t


def _measured(tbl: pa.Table) -> int:
    import pyarrow.compute as pc

    from rust_paddle_ocr_ray.stages.recognize import FIXED_ROW_BYTES

    total = FIXED_ROW_BYTES * tbl.num_rows
    for c in ("url", "lang", "tag", "text"):
        total += int(pc.sum(pc.binary_length(tbl[c])).as_py() or 0)
    return total


def test_page_aligned_slices_greedy_no_overshoot():
    """Chunks cut BEFORE the page that would exceed the cap: every yield
    <= cap (no page-sized overshoot, the r3 bound's weak point) and cuts
    land on page boundaries."""
    from rust_paddle_ocr_ray.stages.recognize import _page_aligned_slices

    pages = [(f"u{i:02d}", 3, 300) for i in range(10)]  # ~1.2 KB/page measured
    tbl = _span_table(pages)
    per_page = _measured(tbl.slice(0, 3))
    cap = int(2.5 * per_page)
    chunks = list(_page_aligned_slices(tbl, cap, strict=True))
    assert sum(c.num_rows for c in chunks) == tbl.num_rows
    assert len(chunks) == 5  # 2 pages per chunk
    for c in chunks:
        assert _measured(c) <= cap
        urls = c["url"].to_pylist()
        # page-aligned: whole pages only (3 rows per url)
        assert all(urls.count(u) == 3 for u in set(urls))


def test_page_aligned_slices_oversized_page_strict_raises():
    """A single page exceeding the cap violates the worst-case model:
    loud error in strict (streaming) mode, solo yield otherwise."""
    from rust_paddle_ocr_ray.stages.recognize import _page_aligned_slices

    tbl = _span_table([("small", 2, 100), ("huge", 50, 2000), ("tail", 2, 100)])
    cap = 20_000  # huge page measures ~105 KB
    with pytest.raises(RuntimeError, match="streaming merge cannot guarantee"):
        list(_page_aligned_slices(tbl, cap, strict=True))
    chunks = list(_page_aligned_slices(tbl, cap, strict=False))
    assert sum(c.num_rows for c in chunks) == tbl.num_rows
    huge_chunks = [c for c in chunks if "huge" in c["url"].to_pylist()]
    assert len(huge_chunks) == 1 and set(huge_chunks[0]["url"].to_pylist()) == {"huge"}
