"""salted_hash_join (stages/join.py) vs a DuckDB inner-join twin —
forced hot keys, the measured pre-pass, and the no-hot-keys degenerate
case must all produce identical row multisets."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

import ray.data as rd

from rust_paddle_ocr_ray.stages.join import salted_hash_join


def _duck(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("l", l)
    con.register("r", r)
    out = con.execute(
        "SELECT l.k, l.a, r.b FROM l JOIN r ON l.k = r.k").fetchdf()
    return (out.sort_values(["k", "a", "b"]).reset_index(drop=True)
            .astype("int64"))


def _frames(seed: int):
    rng = np.random.RandomState(seed)
    # key 7 is pathologically hot on the left
    keys = np.concatenate([rng.randint(0, 40, 2000),
                           np.full(3000, 7)]).astype("int64")
    l = pd.DataFrame({"k": keys, "a": np.arange(len(keys), dtype="int64")})
    r = pd.DataFrame({"k": np.arange(0, 40, dtype="int64")})
    r = pd.concat([r, r.assign(k=r["k"])]).reset_index(drop=True)  # dup rows
    r["b"] = np.arange(len(r), dtype="int64")
    return l, r


def _engine(l, r, **kw) -> pd.DataFrame:
    got = salted_hash_join(rd.from_pandas(l), rd.from_pandas(r), on="k",
                           **kw).to_pandas()
    return (got[["k", "a", "b"]].sort_values(["k", "a", "b"])
            .reset_index(drop=True).astype("int64"))


def test_salted_join_forced_hot_keys(ray_session):
    l, r = _frames(3)
    got = _engine(l, r, salts=4, hot_keys={7})
    pd.testing.assert_frame_equal(got, _duck(l, r))


def test_salted_join_measured_pre_pass(ray_session):
    """hot_threshold_rows=500 makes only key 7 hot via the measured
    pre-pass; result must equal the plain join."""
    l, r = _frames(11)
    got = _engine(l, r, salts=4, hot_threshold_rows=500)
    pd.testing.assert_frame_equal(got, _duck(l, r))


def test_salted_join_no_hot_keys(ray_session):
    """Empty hot set -> degenerates to a plain bucketed join."""
    l, r = _frames(19)
    got = _engine(l, r, salts=4, hot_keys=set())
    pd.testing.assert_frame_equal(got, _duck(l, r))


def test_salted_join_hot_rows_spread_tasks(ray_session):
    """The point of salting: the hot key's LEFT rows land in `salts`
    distinct exchange buckets, while a cold key stays in one; the hot
    key's RIGHT rows are replicated into every salted bucket."""
    l, r = _frames(23)
    tagged = salted_hash_join(rd.from_pandas(l), rd.from_pandas(r), on="k",
                              salts=4, hot_keys={7}, num_buckets=8,
                              _return_tagged=True).to_pandas()
    hot_l = tagged[(tagged["k"] == 7) & (tagged["__side"] == 0)]
    hot_r = tagged[(tagged["k"] == 7) & (tagged["__side"] == 1)]
    cold_l = tagged[(tagged["k"] == 8) & (tagged["__side"] == 0)]
    assert hot_l["__bucket"].nunique() == 4
    assert set(hot_r["__bucket"].unique()) == set(hot_l["__bucket"].unique())
    assert len(hot_r) == 4 * (r["k"] == 7).sum()  # replicated per salt
    assert cold_l["__bucket"].nunique() == 1


def _powerlaw_frame(seed: int) -> pd.DataFrame:
    """Planted power-law fact: key 0 has 20k rows (hot), keys 1..200
    have ~50 each (cold) — a clean two-decade gap around the planted
    threshold so the 3-sigma sampled bound separates them."""
    rng = np.random.RandomState(seed)
    keys = np.concatenate([np.full(20_000, 0),
                           np.repeat(np.arange(1, 201), 50)]).astype("int64")
    rng.shuffle(keys)
    return pd.DataFrame({"k": keys, "a": np.arange(len(keys), dtype="int64")})


def test_hot_key_prepass_sample_equals_exact(ray_session):
    """VERDICT r4 item 6: the seeded row-sample estimate mode flags the
    same hot set as the exact full-scan pre-pass on a planted power-law
    key (p*T = 0.3*5000 = 1500 >> 100, rel. sigma ~2.6%)."""
    from rust_paddle_ocr_ray.stages.join import measure_hot_keys

    l = _powerlaw_frame(29)
    ds = rd.from_pandas(l)
    exact = measure_hot_keys(ds, "k", hot_threshold_rows=5_000, mode="exact")
    sampled = measure_hot_keys(ds, "k", hot_threshold_rows=5_000,
                               mode="sample", sample_rate=0.3, seed=41)
    assert exact == {0}
    assert sampled == exact


def test_salted_join_sampled_pre_pass(ray_session):
    """End-to-end: hot_prepass='sample' joins identically to DuckDB
    (the pre-pass mode can only affect perf, never the row multiset)."""
    l, r = _frames(31)
    got = _engine(l, r, salts=4, hot_threshold_rows=500,
                  hot_prepass="sample", hot_sample_rate=0.5,
                  hot_sample_seed=13)
    pd.testing.assert_frame_equal(got, _duck(l, r))
