"""End-to-end golden test: the Ray Data pipeline must reproduce the
committed oracle goldens BYTE-IDENTICALLY per url (the north_rule
invariant; FIXTURES.md §3)."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


@pytest.fixture(scope="module")
def extracted_df(ray_session):
    from rust_paddle_ocr_ray.config import CLI_CONFIG
    from rust_paddle_ocr_ray.pipelines.extract import ExtractPipeline
    from rust_paddle_ocr_ray.sources.synth import generate_pages

    import ray.data as rd

    pages = rd.from_arrow(generate_pages(240, seed=42))
    pipe = ExtractPipeline(CLI_CONFIG)
    return pipe.run(pages).to_pandas().sort_values("url").reset_index(drop=True)


def test_extracted_text_byte_identical(extracted_df):
    golden = pq.read_table(os.path.join(GOLDEN_DIR, "extracted.parquet")).to_pandas()
    golden = golden.sort_values("url").reset_index(drop=True)
    assert list(extracted_df["url"]) == list(golden["url"])
    mismatches = [
        u
        for u, a, b in zip(golden["url"], extracted_df["extracted_text"], golden["extracted_text"])
        if a != b
    ]
    assert mismatches == [], f"{len(mismatches)} urls diverge from golden"
    assert (extracted_df["n_spans"].to_numpy() == golden["n_spans"].to_numpy()).all()
    assert (extracted_df["warc_ts"].to_numpy() == golden["warc_ts"].to_numpy()).all()
    assert abs(extracted_df["confidence"].to_numpy() - golden["confidence"].to_numpy()).max() < 1e-6


def test_span_rows_match_golden(ray_session):
    from rust_paddle_ocr_ray.config import CLI_CONFIG
    from rust_paddle_ocr_ray.pipelines.extract import ExtractPipeline
    from rust_paddle_ocr_ray.sources.synth import generate_pages

    import pandas as pd
    import ray.data as rd

    # dedup-free slice of the corpus so span rows align 1:1 with goldens
    golden = pq.read_table(os.path.join(GOLDEN_DIR, "spans.parquet")).to_pandas()
    pages_tbl = generate_pages(240, seed=42)
    pipe = ExtractPipeline(CLI_CONFIG)
    spans = (
        pipe.recognize(pipe.detect(rd.from_arrow(pages_tbl)))
        .to_pandas()
    )
    # keep only the max-warc_ts version per url (what the goldens hold)
    keep_ts = spans.groupby("url")["warc_ts"].transform("max")
    spans = spans[(spans["warc_ts"] == keep_ts) & (spans["block_id"] >= 0)]
    spans = spans.sort_values(["url", "order"]).reset_index(drop=True)
    golden = golden.sort_values(["url", "order"]).reset_index(drop=True)
    assert len(spans) == len(golden)
    for col in ("url", "start", "end", "tstart", "tend", "order", "tag", "text"):
        a = spans[col].to_numpy()
        b = golden[col].to_numpy()
        assert (a == b).all(), f"span column {col} diverges"
    assert abs(spans["confidence"].to_numpy() - golden["confidence"].to_numpy()).max() < 1e-6


# --------------------------------------------------------------------------
# approximate-family goldens (q17/q18/q21/q35): the engine must
# reproduce the committed independent-oracle output at the gate sf
# --------------------------------------------------------------------------

_APPROX_GOLDENS = [
    ("q17_minhash_pairs", "q17_sf0.01.parquet", ["a", "b"]),
    ("q18_simhash_pairs", "q18_sf0.01.parquet", ["a", "b", "hamming"]),
    ("q21_knn_lsh", "q21_sf0.01.parquet", ["query_id", "neighbor_id", "rank"]),
    ("q35_knn_ivf", "q35_sf0.01.parquet", ["query_id", "neighbor_id", "rank"]),
]


@pytest.mark.parametrize("name,golden_file,cols", _APPROX_GOLDENS)
def test_approx_family_matches_committed_golden(ray_session, name, golden_file, cols):
    """All four approximate pipelines are deterministic (seeded
    permutations / hyperplanes / k-means); their sf0.01 output must
    equal the committed independent-oracle golden (tests/oracle_impl:
    oracle_minhash_pairs / oracle_simhash_pairs / oracle_knn_lsh /
    oracle_knn_ivf via tools/make_goldens.make_approx_goldens)."""
    from rust_paddle_ocr_ray.pipelines.catalog import QUERIES

    def norm(df):
        df = df[cols].copy()
        for c in cols:
            df[c] = df[c].astype("int64")
        return df.sort_values(cols, kind="stable").reset_index(drop=True)

    got = norm(QUERIES[name][0]("/root/testdata/sf0.01").to_pandas())
    want = norm(pq.read_table(os.path.join(GOLDEN_DIR, golden_file)).to_pandas())
    assert got.equals(want), f"{name}: engine output diverged from the golden"
