"""range_join_agg equivalence: the bucketed one-exchange implementation
must match a brute-force pandas interval join on a planted corpus,
including window-boundary semantics (ts_r == ts_l excluded, ts_r ==
ts_l + delta included, matches that cross the time-window partition
boundary) and zero-match left rows."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

DELTA = 1_000_000  # 1 s in us


def brute_force(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for _, lr in left.iterrows():
        m = right[
            (right.user_id == lr.user_id)
            & (right.ts_us > lr.ts_us)
            & (right.ts_us <= lr.ts_us + DELTA)
        ]
        rows.append(
            {"event_id": lr.event_id, "n_matches": len(m),
             # np.round, matching the operator (float-repr ties like
             # 1.685 differ from decimal round; real doubles never land
             # exactly on .xx5, see q02/q07)
             "sum_value": float(np.round(m.value.sum(), 2))}
        )
    return pd.DataFrame(rows).sort_values("event_id").reset_index(drop=True)


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.RandomState(7)
    n = 400
    ev = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype="int64"),
            "user_id": rng.randint(0, 12, n).astype("int64"),  # hot keys
            "ts_us": rng.randint(0, 20 * DELTA, n).astype("int64"),
            "value": np.round(rng.rand(n) * 10, 3),
        }
    )
    # planted boundary pairs on one user: exact-ts pair (excluded) and
    # exact ts + DELTA pair (included), straddling a window boundary
    extra = pd.DataFrame(
        {
            "event_id": [1000, 1001, 1002, 1003, 1004],
            "user_id": [99, 99, 99, 99, 98],
            "ts_us": [5 * DELTA - 1, 5 * DELTA - 1, 6 * DELTA - 1, 7 * DELTA - 1, 0],
            "value": [1.0, 2.0, 3.0, 4.0, 5.0],
        }
    )
    ev = pd.concat([ev, extra], ignore_index=True)
    ev["ts"] = pd.to_datetime(ev["ts_us"], unit="us")
    return ev


@pytest.mark.parametrize("num_buckets", [1, 7, 64])
def test_range_join_matches_brute_force(ray_session, corpus, num_buckets):
    from rust_paddle_ocr_ray.stages.temporal import range_join_agg

    left = corpus[corpus.event_id % 3 == 0]
    out = (
        range_join_agg(
            rd.from_pandas(corpus[["event_id", "user_id", "ts", "value"]].iloc[
                corpus.index[corpus.event_id % 3 == 0]
            ]),
            rd.from_pandas(corpus[["event_id", "user_id", "ts", "value"]]),
            key_col="user_id", ts_col="ts", id_col="event_id",
            delta_us=DELTA, value_col="value", num_buckets=num_buckets,
        )
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    expect = brute_force(left, corpus)
    assert len(out) == len(expect)
    assert (out.event_id.to_numpy() == expect.event_id.to_numpy()).all()
    assert (out.n_matches.to_numpy() == expect.n_matches.to_numpy()).all()
    assert np.allclose(out.sum_value.to_numpy(), expect.sum_value.to_numpy(), atol=1e-6)


def test_range_join_boundary_semantics(ray_session, corpus):
    from rust_paddle_ocr_ray.stages.temporal import range_join_agg

    out = (
        range_join_agg(
            rd.from_pandas(corpus[["event_id", "user_id", "ts", "value"]]),
            rd.from_pandas(corpus[["event_id", "user_id", "ts", "value"]]),
            key_col="user_id", ts_col="ts", id_col="event_id",
            delta_us=DELTA, value_col="value",
        )
        .to_pandas()
        .set_index("event_id")
    )
    # 1000/1001 share an exact ts -> do NOT match each other; both match
    # 1002 (next window, within delta since 6*DELTA-1 <= 5*DELTA-1 + DELTA)
    assert out.loc[1000].n_matches == 1 and out.loc[1001].n_matches == 1
    assert out.loc[1000].sum_value == 3.0
    # 1002 matches 1003 exactly at ts + DELTA (inclusive upper bound)
    assert out.loc[1002].n_matches == 1 and out.loc[1002].sum_value == 4.0
    # 1003 and the lone user-98 row have zero matches but are present
    assert out.loc[1003].n_matches == 0 and out.loc[1003].sum_value == 0.0
    assert out.loc[1004].n_matches == 0
