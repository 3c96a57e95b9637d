"""grouped_count_distinct / grouped_corr (stages/distinct.py) vs
DuckDB twins — including hot-key skew (one key owning most distinct
values must still combine correctly across pair-hash buckets) and the
zero-variance NaN edge of CORR."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

import ray.data as rd

from rust_paddle_ocr_ray.stages.distinct import (grouped_corr,
                                                 grouped_count_distinct)


def _duck(df: pd.DataFrame, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("t", df)
    return con.execute(sql).fetchdf().sort_values("k").reset_index(drop=True)


def test_count_distinct_matches_duckdb(ray_session):
    rng = np.random.RandomState(13)
    df = pd.DataFrame({
        "k": rng.randint(0, 25, 8000).astype("int64"),
        "v": rng.randint(0, 900, 8000).astype("int64"),
    })
    got = (grouped_count_distinct(rd.from_pandas(df), "k", "v")
           .to_pandas().sort_values("k").reset_index(drop=True))
    want = _duck(df, "SELECT k, COUNT(DISTINCT v) AS n_distinct FROM t"
                     " GROUP BY k")
    pd.testing.assert_frame_equal(got[["k", "n_distinct"]], want)


def test_count_distinct_hot_key_and_strings(ray_session):
    """One key holds 5000 distinct string values (spread across pair
    buckets); another holds 1 value repeated 5000 times."""
    rows = ([("hot", f"v{i}") for i in range(5000)]
            + [("cold", "same")] * 5000
            + [("mid", f"v{i % 7}") for i in range(100)])
    df = pd.DataFrame(rows, columns=["k", "v"])
    got = (grouped_count_distinct(rd.from_pandas(df), "k", "v",
                                  num_buckets=16)
           .to_pandas().sort_values("k").reset_index(drop=True))
    want = _duck(df, "SELECT k, COUNT(DISTINCT v) AS n_distinct FROM t"
                     " GROUP BY k")
    pd.testing.assert_frame_equal(got[["k", "n_distinct"]], want)


def test_corr_matches_duckdb(ray_session):
    rng = np.random.RandomState(29)
    x = rng.randint(10, 4000, 6000).astype("int64")
    df = pd.DataFrame({
        "k": rng.randint(0, 15, 6000).astype("int64"),
        "x": x,
        "y": (x // 7 + rng.randint(0, 50, 6000)).astype("int64"),
    })
    got = (grouped_corr(rd.from_pandas(df), "k", "x", "y")
           .to_pandas().sort_values("k").reset_index(drop=True))
    want = _duck(df, "SELECT k, ROUND(CORR(x, y), 6) AS corr,"
                     " COUNT(*) AS n FROM t GROUP BY k")
    pd.testing.assert_frame_equal(got[["k", "corr", "n"]], want)


def test_corr_zero_variance_is_nan(ray_session):
    """Constant x within a group -> SQL NULL / engine NaN, and a
    single-row group behaves the same."""
    df = pd.DataFrame({
        "k": [1, 1, 1, 2, 3, 3],
        "x": [5, 5, 5, 9, 1, 2],
        "y": [1, 2, 3, 4, 5, 6],
    }).astype("int64")
    got = (grouped_corr(rd.from_pandas(df), "k", "x", "y")
           .to_pandas().sort_values("k").reset_index(drop=True))
    want = _duck(df, "SELECT k, ROUND(CORR(x, y), 6) AS corr,"
                     " COUNT(*) AS n FROM t GROUP BY k")
    pd.testing.assert_frame_equal(got[["k", "corr", "n"]], want)


def test_leakage_matrix_planted(ray_session, tmp_path):
    """Planted cross-source duplicate prefixes (incl. unicode) — the
    engine's char-based slice must agree with SQL substr semantics."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rust_paddle_ocr_ray.pipelines.catalog import SQL_Q68, q68_leakage_matrix

    base = "долгий общий префикс " * 20  # > 200 chars, non-ASCII
    rows = [
        ("s1", base + "tail one"), ("s2", base + "tail two"),  # shared fp
        ("s1", "unique a"), ("s2", "unique b"), ("s3", base + "x"),
        ("s3", "короткий"), ("s1", "короткий"),                # short shared
    ]
    df = pd.DataFrame(rows, columns=["source", "text"])
    df.insert(0, "doc_id", np.arange(len(df), dtype="int64"))
    df["lang"] = "ru"
    df["n_chars"] = df["text"].str.len().astype("int64")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "documents.parquet"))

    got = (q68_leakage_matrix(str(tmp_path)).to_pandas()
           .sort_values(["src_a", "src_b"]).reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{tmp_path}/documents.parquet'")
    want = (con.execute(SQL_Q68).fetchdf()
            .sort_values(["src_a", "src_b"]).reset_index(drop=True))
    want["shared"] = want["shared"].astype("int64")
    pd.testing.assert_frame_equal(got, want)
    # prefix shared by all three; s1/s3 additionally share "короткий"
    assert len(got) == 3 and got["shared"].tolist() == [1, 2, 1]


def test_zscore_matches_duckdb(ray_session):
    from rust_paddle_ocr_ray.stages.distinct import grouped_zscore

    rng = np.random.RandomState(47)
    df = pd.DataFrame({
        "i": np.arange(5000, dtype="int64"),
        "k": rng.randint(0, 16, 5000).astype("int64"),
        "v": rng.randint(100, 9000, 5000).astype("int64"),
    })
    got = (grouped_zscore(rd.from_pandas(df), "k", "v")
           .to_pandas().sort_values("i").reset_index(drop=True)
           [["i", "k", "v", "zscore"]])
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute("""
        SELECT i, k, v,
               ROUND((v - AVG(v) OVER (PARTITION BY k))
                     / NULLIF(STDDEV_POP(v) OVER (PARTITION BY k), 0), 6)
                 AS zscore
        FROM t
    """).fetchdf().sort_values("i").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_zscore_constant_group_nan(ray_session):
    from rust_paddle_ocr_ray.stages.distinct import grouped_zscore

    df = pd.DataFrame({"i": [0, 1, 2, 3], "k": [1, 1, 2, 2],
                       "v": [7, 7, 1, 3]}).astype("int64")
    got = (grouped_zscore(rd.from_pandas(df), "k", "v")
           .to_pandas().sort_values("i").reset_index(drop=True))
    assert got["zscore"].isna().tolist() == [True, True, False, False]
    assert got.loc[2, "zscore"] == -1.0 and got.loc[3, "zscore"] == 1.0


def test_grouped_reduce_matches_pandas_reference(ray_session):
    """grouped_sum / grouped_reduce (incl. per-column how dict) must
    equal a driver-side pandas groupby regardless of block layout."""
    from rust_paddle_ocr_ray.stages.distinct import grouped_reduce, grouped_sum

    rng = np.random.RandomState(11)
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c", "hot"], 6000, p=[.1, .2, .1, .6]),
        "k2": rng.randint(0, 3, 6000).astype("int64"),
        "x": rng.randint(-50, 50, 6000).astype("int64"),
        "y": rng.randint(0, 1000, 6000).astype("int64"),
    })
    ds = rd.from_pandas(df).repartition(17)

    got = (grouped_sum(ds, ["k", "k2"], ["x", "y"], num_buckets=5)
           .to_pandas().sort_values(["k", "k2"]).reset_index(drop=True))
    want = (df.groupby(["k", "k2"], as_index=False)[["x", "y"]].sum()
            .sort_values(["k", "k2"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got[want.columns], want)

    got = (grouped_reduce(ds, "k", ["x", "y"],
                          how={"x": "min", "y": "max"}, num_buckets=3)
           .to_pandas().sort_values("k").reset_index(drop=True))
    want = (df.groupby("k", as_index=False).agg({"x": "min", "y": "max"})
            .sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(got[want.columns], want)
