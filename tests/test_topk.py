"""grouped_topk (stages/topk.py): the semigroup combiner must agree
with the straightforward window formulation (sort + per-group head)
regardless of how rows are split into batches, including duplicate
values at the k boundary (tie columns decide deterministically) and
groups smaller than k."""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from rust_paddle_ocr_ray.stages.topk import grouped_topk


def _reference(df: pd.DataFrame, k: int) -> pd.DataFrame:
    r = df.sort_values(["source", "lang", "n_chars", "doc_id"],
                       ascending=[True, True, False, True], kind="stable")
    r = r.groupby(["source", "lang"], sort=False).head(k).copy()
    r["rnk"] = r.groupby(["source", "lang"], sort=False).cumcount() + 1
    return r.sort_values("doc_id").reset_index(drop=True)


def _make(n=4000, seed=2) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype="int64"),
        "source": rng.choice(["a", "b", "c", "hot"], n,
                             p=[0.1, 0.1, 0.05, 0.75]),  # skewed key
        "lang": rng.choice(["en", "zh"], n),
        # few distinct values -> many exact ties at the k boundary
        "n_chars": rng.randint(0, 25, n).astype("int64"),
    })


def test_matches_window_reference(ray_session):
    df = _make()
    got = (grouped_topk(rd.from_pandas(df).repartition(13),
                        ["source", "lang"], "n_chars", k=3,
                        tie_cols=["doc_id"], with_rank="rnk")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    ref = _reference(df, 3)
    pd.testing.assert_frame_equal(got[ref.columns], ref)


def test_small_groups_and_k_larger_than_group(ray_session):
    df = pd.DataFrame({
        "doc_id": np.arange(5, dtype="int64"),
        "source": ["x", "x", "y", "y", "y"],
        "lang": ["en"] * 5,
        "n_chars": np.array([5, 9, 1, 1, 1], dtype="int64"),
    })
    got = (grouped_topk(rd.from_pandas(df).repartition(3),
                        ["source", "lang"], "n_chars", k=10,
                        tie_cols=["doc_id"], with_rank="rnk")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    ref = _reference(df, 10)
    pd.testing.assert_frame_equal(got[ref.columns], ref)


def test_ascending_selects_smallest(ray_session):
    """ascending=True is the priority-sample direction: k smallest."""
    df = _make(1500, seed=4)
    got = (grouped_topk(rd.from_pandas(df).repartition(9),
                        ["source", "lang"], "n_chars", k=3,
                        tie_cols=["doc_id"], with_rank="rnk", ascending=True)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    r = df.sort_values(["source", "lang", "n_chars", "doc_id"], kind="stable")
    r = r.groupby(["source", "lang"], sort=False).head(3).copy()
    r["rnk"] = r.groupby(["source", "lang"], sort=False).cumcount() + 1
    ref = r.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[ref.columns], ref)


def test_local_partial_bounds_candidates(ray_session):
    """The per-batch partial must emit <= k rows per key per batch —
    the property that bounds a skewed group's exchange volume."""
    df = _make(2000, seed=9)
    seen = grouped_topk(rd.from_pandas(df).repartition(8),
                        ["source", "lang"], "n_chars", k=2,
                        tie_cols=["doc_id"]).to_pandas()
    counts = seen.groupby(["source", "lang"]).size()
    assert (counts <= 2).all()
