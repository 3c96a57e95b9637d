"""Unit tests for the driver-bounded bloom filter
(functions/bloom.py) and its integration into the two dedup planning
paths (stages/merge.plan_url_dedup, pipelines/extract bloom routing)."""

from __future__ import annotations

import dataclasses
import pickle

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from rust_paddle_ocr_ray.functions.bloom import BloomFilter, member_mask


def test_bloom_no_false_negatives_strings():
    urls = np.array([f"https://s{i}.test/p/{i:07d}" for i in range(30_000)],
                    dtype=object)
    bf = BloomFilter(15_000, fp_rate=0.005)
    bf.add_many(urls[:15_000])
    mask = bf.contains_many(urls)
    assert mask[:15_000].all(), "bloom produced a false negative"
    # fp rate near nominal (generous 4x bound to stay flake-free)
    assert mask[15_000:].mean() < 0.02


def test_bloom_no_false_negatives_ints():
    rng = np.random.RandomState(7)
    ids = rng.randint(0, 1 << 62, size=30_000).astype("int64")
    bf = BloomFilter(15_000, fp_rate=0.005)
    bf.add_many(ids[:15_000])
    mask = bf.contains_many(ids)
    assert mask[:15_000].all()
    assert mask[15_000:].mean() < 0.02


def test_bloom_pickle_roundtrip_identical():
    """The filter is broadcast via ray.put (pickle): a round-tripped
    filter must answer identically — worker-side membership == driver."""
    urls = np.array([f"u{i}" for i in range(5_000)], dtype=object)
    bf = BloomFilter(5_000)
    bf.add_many(urls[::2])
    bf2 = pickle.loads(pickle.dumps(bf))
    assert (bf2.contains_many(urls) == bf.contains_many(urls)).all()
    assert bool(bf2) and bf2.n_added == bf.n_added


def test_bloom_empty_and_bool():
    bf = BloomFilter(100)
    assert not bf
    assert bf.contains_many(np.array(["x"], dtype=object)).tolist() == [False]
    assert bf.contains_many(np.array([], dtype=object)).shape == (0,)
    bf.add_many(np.array(["x"], dtype=object))
    assert bf and bf.contains_many(np.array(["x"], dtype=object)).all()


def test_member_mask_exact_and_bloom():
    s = pd.Series(["a", "b", "c"])
    assert member_mask(frozenset({"a", "c"}), s).tolist() == [True, False, True]
    bf = BloomFilter(10)
    bf.add_many(np.array(["a", "c"], dtype=object))
    m = member_mask(bf, s)
    assert m[0] and m[2]  # no false negatives


def test_plan_url_dedup_bloom_degradation(ray_session):
    """Above max_winners the planner returns a BloomFilter covering every
    dup url (no false negatives) instead of the O(dups) dict."""
    from rust_paddle_ocr_ray.stages.merge import plan_url_dedup

    n = 400
    urls = [f"https://d{i}.test" for i in range(n)]
    df = pd.DataFrame({
        "url": urls + urls[: n // 2],  # first half duplicated
        "warc_ts": pd.to_datetime(
            np.arange(n + n // 2) * 1_000_000, unit="us"
        ),
    })
    keys = rd.from_pandas(df)
    winners, ties = plan_url_dedup(keys, max_winners=10)
    assert isinstance(winners, BloomFilter)
    assert ties == frozenset()
    dup_urls = np.array(urls[: n // 2], dtype=object)
    uniq_urls = np.array(urls[n // 2:], dtype=object)
    assert winners.contains_many(dup_urls).all()
    # mostly-negative on the unique half (fp allowed, not all-positive)
    assert winners.contains_many(uniq_urls).mean() < 0.2

    # below the cap: exact dict as before
    winners2, _ = plan_url_dedup(keys, max_winners=100_000)
    assert isinstance(winners2, dict) and len(winners2) == n // 2


def test_pipeline_bloom_routing_matches_at_merge(ray_session, tmp_path):
    """dedup_max_winners=0 forces the flagship's planned path onto bloom
    routing (dups dedup in the merge exchange, unique urls stream): the
    extracted output must equal the at_merge formulation exactly."""
    import pyarrow.parquet as pq

    from rust_paddle_ocr_ray.config import CLI_CONFIG
    from rust_paddle_ocr_ray.pipelines.extract import ExtractPipeline
    from rust_paddle_ocr_ray.sources.synth import generate_pages

    path = str(tmp_path / "pages.parquet")
    pq.write_table(generate_pages(150, seed=11), path)

    bloom_cfg = dataclasses.replace(
        CLI_CONFIG, dedup_mode="planned", dedup_max_winners=0,
        plan_local_max_rows=0,  # force the distributed planner
    )
    ref_cfg = dataclasses.replace(CLI_CONFIG, dedup_mode="at_merge")

    got = (ExtractPipeline(bloom_cfg).run_paths(path).to_pandas()
           .sort_values("url").reset_index(drop=True))
    want = (ExtractPipeline(ref_cfg).run_paths(path).to_pandas()
            .sort_values("url").reset_index(drop=True))
    assert got["url"].is_unique
    pd.testing.assert_frame_equal(got, want, rtol=0, atol=1e-12)


def test_blocked_bloom_no_false_negatives_and_sane_fp():
    from rust_paddle_ocr_ray.functions.bloom import BlockedBloomFilter

    rng = np.random.default_rng(7)
    members = rng.integers(0, 2**62, size=20_000, dtype=np.int64)
    others = rng.integers(0, 2**62, size=20_000, dtype=np.int64)
    others = others[~np.isin(others, members)]
    bf = BlockedBloomFilter(len(members))
    bf.add_many(members)
    assert bf.contains_many(members).all()  # no false negatives, ever
    fp = bf.contains_many(others).mean()
    assert fp < 0.03  # sized for 0.5%; blocked skew stays well under 3%


def test_distributed_need_bloom_equals_local_build(ray_session):
    """The per-chunk OR assembly must produce the BIT-IDENTICAL bitmap a
    single-process add_many build produces, and count overflow markers."""
    import ray.data as rd

    from rust_paddle_ocr_ray.functions.bloom import BlockedBloomFilter
    from rust_paddle_ocr_ray.stages.dedup import _distributed_need_bloom

    rng = np.random.default_rng(3)
    a = rng.integers(0, 10_000, size=5_000, dtype=np.int64)
    b = rng.integers(0, 10_000, size=5_000, dtype=np.int64)
    # plant 7 overflow markers (a < 0) among the pairs
    a[:7] = -1
    cand = rd.from_pandas(pd.DataFrame({"a": a, "b": b})).repartition(8)

    capacity = 2 * len(a)
    got, n_ov = _distributed_need_bloom(cand, capacity)
    assert n_ov == 7

    want = BlockedBloomFilter(capacity)
    ids = np.unique(np.concatenate([a[7:], b[7:]]))
    want.add_many(ids)
    assert got.m == want.m and got.k == want.k
    np.testing.assert_array_equal(got.bits, want.bits)
    assert bool(got)


def test_distributed_need_bloom_multi_chunk(ray_session):
    """Force >1 chunk (tiny chunk_mb) so the range-partition identity and
    per-chunk base-bit offsets are exercised."""
    import ray.data as rd

    from rust_paddle_ocr_ray.functions.bloom import BlockedBloomFilter
    from rust_paddle_ocr_ray.stages.dedup import _distributed_need_bloom

    ids = np.arange(50_000, dtype=np.int64)
    cand = rd.from_pandas(pd.DataFrame({"a": ids, "b": ids + 1_000_000})).repartition(4)
    got, n_ov = _distributed_need_bloom(cand, 2 * len(ids), chunk_mb=0)
    assert n_ov == 0
    want = BlockedBloomFilter(2 * len(ids))
    want.add_many(np.unique(np.concatenate([ids, ids + 1_000_000])))
    np.testing.assert_array_equal(got.bits, want.bits)
