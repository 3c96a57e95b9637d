"""grouped_quantile_disc (stages/quantile.py) must match DuckDB's
``quantile_disc`` exactly — rank semantics max(1, floor(q*n + 0.5)) —
including the float-repr boundary cases (q*n landing on .5 or on an
integer only up to representation error), because the q45 driver gate
hash-compares the two."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

import ray.data as rd

from rust_paddle_ocr_ray.stages.quantile import grouped_quantile_disc

QS = {"p10": 0.1, "p25": 0.25, "p50": 0.5, "p75": 0.75, "p90": 0.9, "p100": 1.0}


def _duck_twin(df: pd.DataFrame) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("t", df)
    cols = ", ".join(f"quantile_disc(v, {q})::BIGINT AS {name}"
                     for name, q in QS.items())
    out = con.execute(
        f"SELECT k, COUNT(*)::BIGINT AS n, {cols} FROM t GROUP BY k"
    ).fetchdf()
    return out.sort_values("k").reset_index(drop=True)


def _engine(df: pd.DataFrame) -> pd.DataFrame:
    got = grouped_quantile_disc(rd.from_pandas(df), "k", "v", QS).to_pandas()
    return (got.rename(columns={"k": "k"})
            .sort_values("k").reset_index(drop=True)[
                ["k", "n", *QS.keys()]])


def test_matches_duckdb_random(ray_session):
    rng = np.random.RandomState(7)
    df = pd.DataFrame({
        "k": rng.randint(0, 40, 5000).astype("int64"),
        "v": rng.randint(-100, 5000, 5000).astype("int64"),
    })
    pd.testing.assert_frame_equal(_engine(df), _duck_twin(df))


def test_matches_duckdb_boundary_group_sizes(ray_session):
    """Group sizes 1..12 hit every rank-rounding branch, including the
    q*n float hazards (0.1*10, 0.75*4, odd-n medians)."""
    rows = []
    for size in range(1, 13):
        for i in range(size):
            rows.append((size, (i * 37) % 101))
    df = pd.DataFrame(rows, columns=["k", "v"]).astype("int64")
    pd.testing.assert_frame_equal(_engine(df), _duck_twin(df))


def test_histogram_collapse_handles_heavy_ties(ray_session):
    """Many duplicate values per group (the histogram the combiner
    actually ships) — counts, not raw rows, drive the rank walk."""
    rng = np.random.RandomState(3)
    df = pd.DataFrame({
        "k": rng.randint(0, 5, 20000).astype("int64"),
        "v": rng.randint(0, 8, 20000).astype("int64"),  # 8 distinct values
    })
    pd.testing.assert_frame_equal(_engine(df), _duck_twin(df))


# ---------------------------------------------------------------------------
# grouped_percent_rank
# ---------------------------------------------------------------------------

from rust_paddle_ocr_ray.stages.quantile import grouped_percent_rank


def _duck_pct(df: pd.DataFrame) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("t", df)
    out = con.execute(
        "SELECT i, k, v, PERCENT_RANK() OVER (PARTITION BY k ORDER BY v)"
        " AS pct_rank FROM t"
    ).fetchdf()
    return out.sort_values("i").reset_index(drop=True)


def _engine_pct(df: pd.DataFrame, **kw) -> pd.DataFrame:
    got = grouped_percent_rank(rd.from_pandas(df), "k", "v", **kw).to_pandas()
    return (got.sort_values("i").reset_index(drop=True)
            [["i", "k", "v", "pct_rank"]])


def _pct_frame(seed: int, n: int, nk: int, vmax: int) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    return pd.DataFrame({
        "i": np.arange(n, dtype="int64"),
        "k": rng.randint(0, nk, n).astype("int64"),
        "v": rng.randint(-vmax, vmax, n).astype("int64"),
    })


def test_percent_rank_matches_duckdb(ray_session):
    df = _pct_frame(11, 4000, 30, 500)
    pd.testing.assert_frame_equal(_engine_pct(df), _duck_pct(df))


def test_percent_rank_ties_and_singletons(ray_session):
    """RANK tie semantics (shared rank for equal values) and the n==1
    → 0.0 special case."""
    rows = [(0, 7, 5)]  # singleton group
    i = 1
    for k in (1, 2):
        for v in (3, 3, 3, 9, 9, 20):
            rows.append((i, k, v))
            i += 1
    df = pd.DataFrame(rows, columns=["i", "k", "v"]).astype("int64")
    pd.testing.assert_frame_equal(_engine_pct(df), _duck_pct(df))


def test_percent_rank_distributed_fallback_equivalent(ray_session):
    """Forcing broadcast_max_pairs=0 exercises the hash-join fallback;
    it must produce the identical result."""
    df = _pct_frame(5, 1500, 12, 40)
    pd.testing.assert_frame_equal(
        _engine_pct(df, broadcast_max_pairs=0), _duck_pct(df))


# ---------------------------------------------------------------------------
# quantile_band_filter
# ---------------------------------------------------------------------------

from rust_paddle_ocr_ray.stages.quantile import quantile_band_filter


def _duck_band(df: pd.DataFrame, lo: float, hi: float) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("t", df)
    out = con.execute(f"""
        WITH b AS (SELECT k, quantile_disc(v, {lo}) AS lo,
                          quantile_disc(v, {hi}) AS hi FROM t GROUP BY k)
        SELECT t.i, t.k, t.v FROM t JOIN b USING (k)
        WHERE t.v BETWEEN b.lo AND b.hi
    """).fetchdf()
    return out.sort_values("i").reset_index(drop=True)


def _engine_band(df: pd.DataFrame, lo: float, hi: float, **kw) -> pd.DataFrame:
    got = quantile_band_filter(rd.from_pandas(df), "k", "v",
                               lo, hi, **kw).to_pandas()
    return (got.sort_values("i").reset_index(drop=True)[["i", "k", "v"]]
            .astype("int64"))


def test_band_filter_matches_duckdb(ray_session):
    df = _pct_frame(17, 3000, 20, 800)
    pd.testing.assert_frame_equal(_engine_band(df, 0.05, 0.95),
                                  _duck_band(df, 0.05, 0.95))


def test_band_filter_fallback_equivalent(ray_session):
    df = _pct_frame(23, 1200, 10, 300)
    pd.testing.assert_frame_equal(
        _engine_band(df, 0.1, 0.9, broadcast_max_groups=0),
        _duck_band(df, 0.1, 0.9))
