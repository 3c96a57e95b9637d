"""hash_join anti/semi modes (stages/join.py) and keyed_running_sum
(stages/temporal.py): both must agree with straightforward pandas
formulations on int and string keys, across block layouts."""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from rust_paddle_ocr_ray.stages.join import hash_join
from rust_paddle_ocr_ray.stages.temporal import keyed_running_sum


def test_anti_and_semi_join(ray_session):
    rng = np.random.RandomState(8)
    left = pd.DataFrame({"k": np.arange(300, dtype="int64"),
                         "payload": rng.randint(0, 99, 300).astype("int64")})
    right = pd.DataFrame({"k": rng.choice(np.arange(0, 300, 2), 400)
                          .astype("int64")})
    lds = rd.from_pandas(left).repartition(7)
    rds = rd.from_pandas(right).repartition(5)

    got_anti = (hash_join(lds, rds, on="k", how="anti").to_pandas()
                .sort_values("k").reset_index(drop=True))
    ref_anti = (left[~left.k.isin(right.k)].sort_values("k")
                .reset_index(drop=True))
    pd.testing.assert_frame_equal(got_anti[["k", "payload"]],
                                  ref_anti, check_dtype=False)

    got_semi = (hash_join(lds, rds, on="k", how="semi").to_pandas()
                .sort_values("k").reset_index(drop=True))
    ref_semi = (left[left.k.isin(right.k)].sort_values("k")
                .reset_index(drop=True))
    pd.testing.assert_frame_equal(got_semi[["k", "payload"]],
                                  ref_semi, check_dtype=False)


def test_anti_join_string_keys(ray_session):
    left = pd.DataFrame({"k": [f"u{i}" for i in range(40)]})
    right = pd.DataFrame({"k": [f"u{i}" for i in range(0, 40, 3)]})
    got = (hash_join(rd.from_pandas(left).repartition(3),
                     rd.from_pandas(right).repartition(2),
                     on="k", how="anti").to_pandas())
    assert sorted(got.k) == sorted(set(left.k) - set(right.k))


def test_keyed_running_sum(ray_session):
    rng = np.random.RandomState(12)
    n = 2500
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype="int64"),
        "user_id": rng.randint(0, 60, n).astype("int64"),
        "ts": pd.to_datetime(rng.randint(0, 50_000, n), unit="s"),
        "v": rng.randint(-500, 500, n).astype("int64"),
    })
    got = (keyed_running_sum(rd.from_pandas(df).repartition(9),
                             "user_id", "ts", "event_id", "v")
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    r = df.sort_values(["user_id", "ts", "event_id"], kind="stable").copy()
    r["run"] = r.groupby("user_id", sort=False)["v"].cumsum()
    ref = r.sort_values("event_id")[["event_id", "run"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["event_id", "run"]], ref)
