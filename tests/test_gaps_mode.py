"""keyed_gap_stats (stages/temporal.py) and grouped_mode
(stages/distinct.py) vs DuckDB twins — timestamp ties, single-event
keys, and mode tie-breaks."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

import ray.data as rd

from rust_paddle_ocr_ray.stages.distinct import grouped_mode
from rust_paddle_ocr_ray.stages.temporal import keyed_gap_stats

BRK = 1000


def _duck_gaps(df: pd.DataFrame) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("t", df)
    out = con.execute(f"""
        WITH g AS (
          SELECT k, epoch_us(ts) AS ts_us,
                 epoch_us(ts) - LAG(epoch_us(ts))
                   OVER (PARTITION BY k ORDER BY ts) AS gap
          FROM t)
        SELECT k, COUNT(*) AS n_events, MAX(ts_us) - MIN(ts_us) AS span_us,
               COALESCE(MAX(gap), 0) AS max_gap_us,
               COALESCE(SUM(CASE WHEN gap >= {BRK} THEN 1 ELSE 0 END), 0)::BIGINT
                 AS n_breaks
        FROM g GROUP BY k
    """).fetchdf()
    return out.sort_values("k").reset_index(drop=True)


def _gaps_frame(seed: int, n: int, nk: int) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    us = rng.randint(0, 50_000, n).astype("int64") * 100  # plenty of ties
    return pd.DataFrame({
        "k": rng.randint(0, nk, n).astype("int64"),
        "ts": pd.to_datetime(us, unit="us"),
    })


def test_gap_stats_matches_duckdb(ray_session):
    df = _gaps_frame(31, 4000, 18)
    got = (keyed_gap_stats(rd.from_pandas(df), "k", "ts", break_us=BRK)
           .to_pandas().sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, _duck_gaps(df))


def test_gap_stats_single_event_keys(ray_session):
    """Keys with one event: span/max_gap/breaks are all 0."""
    df = pd.DataFrame({
        "k": [1, 2, 3, 3],
        "ts": pd.to_datetime([10, 20, 30, 30], unit="us"),
    })
    got = (keyed_gap_stats(rd.from_pandas(df), "k", "ts", break_us=BRK)
           .to_pandas().sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, _duck_gaps(df))


def test_grouped_mode_tie_break_smallest(ray_session):
    """Equal counts -> smallest value wins, matching the spelled-out
    SQL twin."""
    rows = [(1, 9), (1, 9), (1, 4), (1, 4), (1, 7),  # tie 9 vs 4 -> 4
            (2, 5), (2, 5), (2, 1)]                  # clear mode 5
    df = pd.DataFrame(rows, columns=["k", "v"]).astype("int64")
    got = (grouped_mode(rd.from_pandas(df), "k", "v")
           .to_pandas().sort_values("k").reset_index(drop=True))
    want = pd.DataFrame({"k": [1, 2], "modal_value": [4, 5],
                         "modal_count": [2, 2]}).astype("int64")
    pd.testing.assert_frame_equal(got, want)


def test_grouped_mode_matches_duckdb_rule(ray_session):
    rng = np.random.RandomState(41)
    df = pd.DataFrame({
        "k": rng.randint(0, 12, 6000).astype("int64"),
        "v": rng.randint(0, 30, 6000).astype("int64"),
    })
    got = (grouped_mode(rd.from_pandas(df), "k", "v")
           .to_pandas().sort_values("k").reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute("""
        WITH c AS (SELECT k, v, COUNT(*) AS cnt FROM t GROUP BY k, v),
             m AS (SELECT k, MAX(cnt) AS mx FROM c GROUP BY k)
        SELECT c.k, MIN(c.v) AS modal_value, MAX(c.cnt) AS modal_count
        FROM c JOIN m ON c.k = m.k AND c.cnt = m.mx GROUP BY c.k
    """).fetchdf().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
