"""As-of join strategy equivalence (stages/temporal.py): the bucketed
co-partitioned ``pd.merge_asof`` path (the large-right-side plan the
broadcast variant cannot take) must agree exactly with the broadcast
searchsorted index, including tie dedup and miss (NaN) semantics; the
``asof_join`` wrapper must pick each by measured right-side row count.
Also covers sessionize with non-integer keys (ADVICE r1)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from rust_paddle_ocr_ray.stages.temporal import (
    asof_join,
    asof_join_bucketed,
    build_asof_index,
    sessionize,
)


@pytest.fixture(scope="module")
def asof_sides():
    rng = np.random.RandomState(11)
    n_left, n_right = 2000, 600
    left = pd.DataFrame(
        {
            "event_id": np.arange(n_left, dtype="int64"),
            "user_id": rng.randint(0, 80, n_left).astype("int64"),
            "ts": pd.to_datetime(rng.randint(0, 10**6, n_left), unit="s"),
        }
    )
    right = pd.DataFrame(
        {
            "o_custkey": rng.randint(0, 100, n_right).astype("int64"),
            "o_orderdate": pd.to_datetime(rng.randint(0, 10**6, n_right), unit="s"),
            "o_orderkey": np.arange(n_right, dtype="int64"),
            "o_totalprice": rng.uniform(10, 500, n_right).round(2),
        }
    )
    # plant exact (key, ts) ties in the right side (dedup semantics)
    dup = right.iloc[:20].copy()
    dup["o_orderkey"] = dup["o_orderkey"] + 10_000
    right = pd.concat([right, dup], ignore_index=True)
    # plant exact left_ts == right_ts matches
    left.loc[:10, "ts"] = right["o_orderdate"].iloc[:11].to_numpy()
    left.loc[:10, "user_id"] = right["o_custkey"].iloc[:11].to_numpy()
    return left, right


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values("event_id").reset_index(drop=True)


def test_bucketed_matches_broadcast(ray_session, asof_sides):
    import ray

    left, right = asof_sides
    payload = ["o_orderkey", "o_totalprice"]
    idx = build_asof_index(
        right.rename(columns={"o_custkey": "user_id", "o_orderdate": "ts"}),
        "user_id", "ts", payload,
    )
    from rust_paddle_ocr_ray.stages.temporal import asof_join_broadcast

    bcast = _sorted(
        asof_join_broadcast(rd.from_pandas(left), ray.put(idx), "user_id", "ts",
                            payload).to_pandas()
    )
    bucketed = _sorted(
        asof_join_bucketed(rd.from_pandas(left), rd.from_pandas(right),
                           "user_id", "ts", payload,
                           right_key_col="o_custkey", right_ts_col="o_orderdate",
                           num_buckets=16).to_pandas()
    )
    assert bcast["o_orderkey"].isna().sum() > 0  # misses exist (keys 80-99 absent)
    pd.testing.assert_frame_equal(bucketed[bcast.columns], bcast)


def test_wrapper_selects_by_right_size(ray_session, asof_sides):
    left, right = asof_sides
    payload = ["o_orderkey", "o_totalprice"]
    l_ds = rd.from_pandas(left)
    r_ds = rd.from_pandas(right)
    via_broadcast = _sorted(
        asof_join(l_ds, r_ds, "user_id", "ts", payload,
                  right_key_col="o_custkey", right_ts_col="o_orderdate",
                  broadcast_max_rows=10**9).to_pandas()
    )
    via_bucketed = _sorted(
        asof_join(l_ds, r_ds, "user_id", "ts", payload,
                  right_key_col="o_custkey", right_ts_col="o_orderdate",
                  broadcast_max_rows=0).to_pandas()
    )
    pd.testing.assert_frame_equal(via_bucketed[via_broadcast.columns], via_broadcast)


def test_sessionize_string_keys(ray_session):
    """sessionize must accept non-integer key columns (hash bucketing)
    and produce the same sessions as an integer relabeling of the keys."""
    rng = np.random.RandomState(3)
    n = 500
    keys = np.array([f"user-{k:03d}" for k in rng.randint(0, 40, n)])
    ts = pd.to_datetime(rng.randint(0, 10**5, n), unit="s")
    ids = np.arange(n, dtype="int64")
    df_s = pd.DataFrame({"event_id": ids, "who": keys, "ts": ts})
    df_i = pd.DataFrame({"event_id": ids,
                         "who": pd.factorize(keys)[0].astype("int64"), "ts": ts})
    gap = 1800 * 1_000_000
    out_s = sessionize(rd.from_pandas(df_s), "who", "ts", "event_id",
                       gap_us=gap).to_pandas()
    out_i = sessionize(rd.from_pandas(df_i), "who", "ts", "event_id",
                       gap_us=gap).to_pandas()
    a = out_s.sort_values("event_id")["session_seq"].to_numpy()
    b = out_i.sort_values("event_id")["session_seq"].to_numpy()
    assert (a == b).all()


# --------------------------------------------------------------------------
# time-sliced sessionization (hot-key bounding, VERDICT r3 #6)
# --------------------------------------------------------------------------

def _session_map(ds) -> dict:
    df = ds.to_pandas()
    return dict(zip(df["event_id"], df["session_seq"]))


@pytest.fixture(scope="module")
def hot_key_events():
    """One hot key with events spanning many slices (boundary gaps both
    within and beyond the session gap) + a few cold keys."""
    rng = np.random.RandomState(17)
    rows = []
    eid = 0
    t0 = pd.Timestamp("2024-03-01").value // 1000  # us
    # hot key 7: 4000 events, gaps drawn so sessions regularly break AND
    # regularly continue across the 1-hour slice boundaries
    t = t0
    for _ in range(4000):
        t += int(rng.choice([30, 90, 200, 4000]) * 1e6)  # 30s..66min gaps
        rows.append((eid, 7, t)); eid += 1
    for key in (1, 2, 3):
        t = t0 + key * 1_000_000
        for _ in range(50):
            t += int(rng.choice([10, 7200]) * 1e6)
            rows.append((eid, key, t)); eid += 1
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts_us"])
    df["ts"] = pd.to_datetime(df["ts_us"], unit="us")
    return df[["event_id", "user_id", "ts"]]


GAP_US = 30 * 60 * 1_000_000       # 30 min session gap
SLICE_US = 60 * 60 * 1_000_000     # 1 h slices (> gap, required)


def test_sliced_sessionize_matches_unsliced(ray_session, hot_key_events):
    ds = rd.from_pandas(hot_key_events)
    base = _session_map(sessionize(ds, "user_id", "ts", "event_id", GAP_US))
    sliced = _session_map(sessionize(ds, "user_id", "ts", "event_id", GAP_US,
                                     slice_us=SLICE_US))
    assert sliced == base
    # the hot key really is spread over many (key, slice) partitions —
    # its events can never pin a single bucket task
    ts_us = hot_key_events.loc[hot_key_events.user_id == 7, "ts"].astype(
        "datetime64[us]").astype("int64")
    assert (ts_us // SLICE_US).nunique() > 10


def test_sliced_sessionize_forced_join_path(ray_session, hot_key_events):
    """broadcast_max_slices=0 forces the hash-join offset application —
    must agree with the broadcast path bit-for-bit."""
    ds = rd.from_pandas(hot_key_events)
    a = _session_map(sessionize(ds, "user_id", "ts", "event_id", GAP_US,
                                slice_us=SLICE_US))
    b = _session_map(sessionize(ds, "user_id", "ts", "event_id", GAP_US,
                                slice_us=SLICE_US, broadcast_max_slices=0))
    assert a == b


def test_sliced_sessionize_boundary_rules(ray_session):
    """Crafted boundary cases: continue across a slice boundary when the
    gap <= session gap; break when it exceeds it; slice_us <= gap_us is
    rejected."""
    h = 3_600_000_000  # 1h slice
    rows = [
        # key 1: events at 59:30 and 60:10 (40 s gap across the boundary)
        (0, 1, int(59.5 * 60e6)), (1, 1, int(60.2 * 60e6)),
        # key 2: events at 30:00 and 95:00 (65 min gap across the boundary)
        (2, 2, 30 * 60_000_000), (3, 2, 95 * 60_000_000),
        # key 3: non-adjacent slices (0 and 3) always break
        (4, 3, 10 * 60_000_000), (5, 3, 190 * 60_000_000),
    ]
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts_us"])
    df["ts"] = pd.to_datetime(df["ts_us"], unit="us")
    ds = rd.from_pandas(df[["event_id", "user_id", "ts"]])
    got = _session_map(sessionize(ds, "user_id", "ts", "event_id",
                                  GAP_US, slice_us=h))
    assert got == {0: 1, 1: 1, 2: 1, 3: 2, 4: 1, 5: 2}
    with pytest.raises(ValueError, match="slice_us must exceed"):
        sessionize(ds, "user_id", "ts", "event_id", gap_us=2 * h, slice_us=h)


# --------------------------------------------------------------------------
# tolerance (staleness bound) — q46
# --------------------------------------------------------------------------

def _brute_asof_tolerance(left: pd.DataFrame, right: pd.DataFrame,
                          tol_us: int) -> pd.DataFrame:
    """Row-at-a-time reference: latest right row of the same key with
    right_ts <= left_ts AND left_ts - right_ts <= tol; duplicate
    (key, ts) right rows keep the greatest payload row."""
    r = right.rename(columns={"o_custkey": "user_id", "o_orderdate": "ts"}).copy()
    r["_ts"] = r["ts"].astype("int64") // 1000  # ns -> us, like _ts_us
    r = r.sort_values(["user_id", "_ts", "o_orderkey", "o_totalprice"],
                      kind="stable").drop_duplicates(["user_id", "_ts"],
                                                     keep="last")
    out_k, out_p = [], []
    for _, row in left.iterrows():
        ts = int(pd.Timestamp(row["ts"]).value // 1000)
        cand = r[(r["user_id"] == row["user_id"]) & (r["_ts"] <= ts)
                 & (ts - r["_ts"] <= tol_us)]
        if len(cand):
            best = cand.loc[cand["_ts"].idxmax()]
            out_k.append(float(best["o_orderkey"]))
            out_p.append(float(best["o_totalprice"]))
        else:
            out_k.append(np.nan)
            out_p.append(np.nan)
    res = left.copy()
    res["o_orderkey"] = out_k
    res["o_totalprice"] = out_p
    return res


def test_tolerance_both_paths_match_bruteforce(ray_session, asof_sides):
    left, right = asof_sides
    payload = ["o_orderkey", "o_totalprice"]
    tol = 40_000 * 10**6  # 40k seconds: some matches survive, some drop
    ref = _sorted(_brute_asof_tolerance(left, right, tol))
    via_broadcast = _sorted(
        asof_join(rd.from_pandas(left), rd.from_pandas(right), "user_id", "ts",
                  payload, right_key_col="o_custkey", right_ts_col="o_orderdate",
                  broadcast_max_rows=10**9, tolerance_us=tol).to_pandas()
    )
    via_bucketed = _sorted(
        asof_join(rd.from_pandas(left), rd.from_pandas(right), "user_id", "ts",
                  payload, right_key_col="o_custkey", right_ts_col="o_orderdate",
                  broadcast_max_rows=0, tolerance_us=tol).to_pandas()
    )
    # the bound must actually bite vs the unbounded join
    unbounded = _sorted(
        asof_join(rd.from_pandas(left), rd.from_pandas(right), "user_id", "ts",
                  payload, right_key_col="o_custkey", right_ts_col="o_orderdate",
                  broadcast_max_rows=10**9).to_pandas()
    )
    assert via_broadcast["o_orderkey"].isna().sum() > unbounded["o_orderkey"].isna().sum()
    cols = ["event_id", "user_id", "o_orderkey", "o_totalprice"]
    pd.testing.assert_frame_equal(via_broadcast[cols], ref[cols])
    pd.testing.assert_frame_equal(via_bucketed[cols], ref[cols])


def test_tolerance_keeps_exact_boundary(ray_session):
    """left_ts - right_ts == tolerance is a HIT (<=, matching the SQL
    twin's INTERVAL comparison) on both paths."""
    left = pd.DataFrame({"event_id": np.array([0, 1], dtype="int64"),
                         "user_id": np.array([7, 7], dtype="int64"),
                         "ts": pd.to_datetime([1000, 2001], unit="s")})
    right = pd.DataFrame({"o_custkey": np.array([7], dtype="int64"),
                          "o_orderdate": pd.to_datetime([0], unit="s"),
                          "o_orderkey": np.array([42], dtype="int64"),
                          "o_totalprice": np.array([9.5])})
    tol = 1000 * 10**6
    for cap in (10**9, 0):
        got = _sorted(
            asof_join(rd.from_pandas(left), rd.from_pandas(right), "user_id",
                      "ts", ["o_orderkey", "o_totalprice"],
                      right_key_col="o_custkey", right_ts_col="o_orderdate",
                      broadcast_max_rows=cap, tolerance_us=tol).to_pandas()
        )
        assert got["o_orderkey"].tolist()[0] == 42.0      # exactly at tol
        assert np.isnan(got["o_orderkey"].tolist()[1])    # 1 us past tol
