"""budget_select (stages/topk.py) vs the SQL SUM() OVER window twin —
greedy per-group selection under an integer budget, including
exact-boundary and first-row-over-budget edges."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

import ray.data as rd

from rust_paddle_ocr_ray.stages.topk import budget_select


def _duck(df: pd.DataFrame, budget: int) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("t", df)
    out = con.execute(f"""
        WITH r AS (SELECT k, i, v,
                          SUM(v) OVER (PARTITION BY k ORDER BY v DESC, i)
                            AS run
                   FROM t)
        SELECT k, i, v FROM r WHERE run <= {budget}
    """).fetchdf()
    return out.sort_values(["k", "i"]).reset_index(drop=True)


def _engine(df: pd.DataFrame, budget: int) -> pd.DataFrame:
    got = budget_select(rd.from_pandas(df), "k", "v", budget,
                        id_col="i").to_pandas()
    return (got.sort_values(["k", "i"]).reset_index(drop=True)
            [["k", "i", "v"]].astype("int64"))


def test_budget_select_matches_duckdb(ray_session):
    rng = np.random.RandomState(19)
    df = pd.DataFrame({
        "k": rng.randint(0, 14, 3000).astype("int64"),
        "i": np.arange(3000, dtype="int64"),
        "v": rng.randint(1, 500, 3000).astype("int64"),
    })
    pd.testing.assert_frame_equal(_engine(df, 2000), _duck(df, 2000))


def test_budget_select_edges(ray_session):
    """Exact-boundary fill, a first row larger than the whole budget
    (group contributes nothing), and value ties broken by id."""
    rows = [
        (1, 10, 60), (1, 11, 40),          # 60+40 == budget: both kept
        (2, 20, 150),                      # first row alone over budget
        (3, 30, 50), (3, 31, 50), (3, 32, 50),  # ties: ids 30,31 kept
    ]
    df = pd.DataFrame(rows, columns=["k", "i", "v"]).astype("int64")
    got = _engine(df, 100)
    want = _duck(df, 100)
    pd.testing.assert_frame_equal(got, want)
    assert set(got["i"]) == {10, 11, 30, 31}


def test_budget_select_histogram_equivalent(ray_session):
    """The hot-key-bounded histogram strategy must produce the exact
    scan/SQL result, including boundary ties split by id."""
    rng = np.random.RandomState(7)
    df = pd.DataFrame({
        "k": rng.randint(0, 10, 4000).astype("int64"),
        "i": np.arange(4000, dtype="int64"),
        "v": rng.randint(1, 40, 4000).astype("int64"),  # heavy value ties
    })
    got = budget_select(rd.from_pandas(df), "k", "v", 500, id_col="i",
                        strategy="histogram").to_pandas()
    got = (got.sort_values(["k", "i"]).reset_index(drop=True)
           [["k", "i", "v"]].astype("int64"))
    pd.testing.assert_frame_equal(got, _duck(df, 500))


def test_budget_select_histogram_edges(ray_session):
    """keep_all groups, first-row-over-budget groups, exact boundary."""
    rows = [
        (1, 10, 60), (1, 11, 40),
        (2, 20, 150),
        (3, 30, 50), (3, 31, 50), (3, 32, 50),
        (4, 40, 5),                       # whole group fits
    ]
    df = pd.DataFrame(rows, columns=["k", "i", "v"]).astype("int64")
    got = budget_select(rd.from_pandas(df), "k", "v", 100, id_col="i",
                        strategy="histogram").to_pandas()
    got = (got.sort_values(["k", "i"]).reset_index(drop=True)
           [["k", "i", "v"]].astype("int64"))
    pd.testing.assert_frame_equal(got, _duck(df, 100))


def test_budget_select_histogram_joinback_fallback(ray_session):
    """broadcast_max_keys=0 forces the hash-join cutoff-map fallback;
    identical result required."""
    from rust_paddle_ocr_ray.stages.topk import _budget_select_histogram

    rng = np.random.RandomState(29)
    df = pd.DataFrame({
        "k": rng.randint(0, 9, 2500).astype("int64"),
        "i": np.arange(2500, dtype="int64"),
        "v": rng.randint(1, 30, 2500).astype("int64"),
    })
    got = _budget_select_histogram(rd.from_pandas(df), "k", "v", 300,
                                   id_col="i", broadcast_max_keys=0
                                   ).to_pandas()
    got = (got.sort_values(["k", "i"]).reset_index(drop=True)
           [["k", "i", "v"]].astype("int64"))
    pd.testing.assert_frame_equal(got, _duck(df, 300))
