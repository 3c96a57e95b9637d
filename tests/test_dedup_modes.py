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
    (cap + page-overshoot <= target/2, i.e. target >= ~6x
    max_html_bytes — see stages.recognize.page_aligned_yield_cap) the
    pipeline statically selects the zero-exchange streaming finalize and
    relies on the recognizer's page-aligned bounded yields to keep block
    cuts between pages.  Verify the guarantee holds with a target small
    enough that many blocks are produced (8x a shrunken max_html_bytes),
    i.e. the streaming path really is exercised AND correct — and that
    just below the bound the pipeline refuses to stream."""
    from ray.data import DataContext

    from rust_paddle_ocr_ray.config import ExtractConfig

    cfg = dataclasses.replace(
        ExtractConfig().cli(), max_html_bytes=64 * 1024, dedup_mode="planned"
    )
    pipe = ExtractPipeline(cfg)
    ctx = DataContext.get_current()
    old = ctx.target_max_block_size
    try:
        # the old 4x threshold is no longer streaming-safe: one oversized
        # page can straddle a block slice (ADVICE r2) -> boundary routing
        ctx.target_max_block_size = 4 * cfg.max_html_bytes
        assert pipe._splits_possible()
        ctx.target_max_block_size = 8 * cfg.max_html_bytes  # above the bound
        assert not pipe._splits_possible()
        planned = pipe.run_paths(dup_corpus).to_pandas().sort_values("url").reset_index(drop=True)
        at_merge = _run("at_merge", dup_corpus)
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
