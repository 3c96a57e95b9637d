"""funnel_counts (stages/temporal.py): the bucketed min-merge must
implement the strict ordered-funnel semantics — stage i+1 only at an
event strictly after the instant stage i was reached, each stage at its
earliest qualifying event — and agree with a per-user Python walk
regardless of bucket count."""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from rust_paddle_ocr_ray.stages.temporal import funnel_counts

STAGES = ["signup", "view", "click", "purchase"]


def _reference(df: pd.DataFrame) -> pd.DataFrame:
    reached = np.zeros(len(STAGES), dtype=np.int64)
    for _, g in df.groupby("user_id"):
        g = g.sort_values("ts", kind="stable")
        t = None
        for i, s in enumerate(STAGES):
            q = g[(g.event_type == s) & ((g.ts > t) if t is not None else True)]
            if q.empty:
                break
            t = q.ts.min()
            reached[i] += 1
    return pd.DataFrame({"stage": np.arange(1, 5, dtype="int64"),
                         "event_type": STAGES, "users": reached})


def _run(df: pd.DataFrame, buckets: int) -> pd.DataFrame:
    out = funnel_counts(rd.from_pandas(df).repartition(4), "user_id", "ts",
                        "event_type", STAGES, num_buckets=buckets)
    return out.to_pandas().sort_values("stage").reset_index(drop=True)


def _mk(rows):
    return pd.DataFrame(rows, columns=["user_id", "ts", "event_type"]).assign(
        ts=lambda d: pd.to_datetime(d.ts, unit="s"),
        user_id=lambda d: d.user_id.astype("int64"),
    )


def test_strict_ordering_and_earliest_event(ray_session):
    df = _mk([
        # user 0: full funnel in order
        (0, 10, "signup"), (0, 20, "view"), (0, 30, "click"), (0, 40, "purchase"),
        # user 1: view BEFORE signup -> stalls at signup
        (1, 20, "view"), (1, 30, "signup"),
        # user 2: same-instant view does NOT count (strict >)
        (2, 10, "signup"), (2, 10, "view"),
        # user 3: EARLIEST signup (10) gates: view@5 misses, view@60 counts
        (3, 10, "signup"), (3, 5, "view"), (3, 50, "signup"), (3, 60, "view"),
        # user 4: noise types ignored
        (4, 1, "error"), (4, 2, "signup"), (4, 3, "view"),
    ])
    got = _run(df, buckets=3)
    ref = _reference(df)
    pd.testing.assert_frame_equal(got, ref)
    assert got.users.tolist() == [5, 3, 1, 1]


def test_random_corpus_and_bucket_invariance(ray_session):
    rng = np.random.RandomState(7)
    n = 3000
    df = _mk(list(zip(
        rng.randint(0, 150, n),
        rng.randint(0, 10_000, n),
        rng.choice(STAGES + ["error"], n),
    )))
    ref = _reference(df)
    for buckets in (1, 17):
        pd.testing.assert_frame_equal(_run(df, buckets), ref)
