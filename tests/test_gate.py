"""Curated driver gate (pipelines/gate.py): invariants + melt parity.

The driver records at most 50 correctness rows; the gate must stay at
EXACTLY 50 entries and cover every catalog query either as a single or
as a composite member, and the pandas melt must be bit-identical to
the DuckDB melt generated from the same spec (no Ray needed here).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from rust_paddle_ocr_ray.pipelines.catalog import QUERIES
from rust_paddle_ocr_ray.pipelines.gate import (
    COMPOSITES,
    GATE_QUERIES,
    MELT_SPECS,
    SINGLES,
    melt_df,
    melt_sql,
)


def test_gate_is_exactly_50_and_covers_catalog():
    assert len(GATE_QUERIES) == 50
    folded = {m for ms in COMPOSITES.values() for m in ms}
    assert folded | set(SINGLES) == set(QUERIES)
    assert not folded & set(SINGLES)
    # every folded member has a melt spec and a SQL twin
    for qn in folded:
        assert qn in MELT_SPECS
        assert QUERIES[qn][1] is not None
    # every gate entry carries a twin (driver hash check applies to all)
    assert all(sql is not None for _fn, sql in GATE_QUERIES.values())


def test_melt_parity_pandas_vs_duckdb():
    df = pd.DataFrame(
        {
            "name": ["a", None, "c", "d"],
            "cnt": pd.array([3, -7, None, 2**40], dtype="Int64"),
            "flag": [True, False, True, False],
            "ts": pd.to_datetime(
                ["2024-01-02 03:04:05.123456", "1999-12-31 23:59:59.000000", None,
                 "2026-08-18 00:00:00.000000"]
            ),
            "score": [1.5, np.nan, -2.25, 1e12],
            "ratio": [0.0, 0.5, None, -0.125],
        }
    )
    spec = [("name", "s"), ("cnt", "i"), ("flag", "b"), ("ts", "ts"),
            ("score", "f"), ("ratio", "f")]
    con = duckdb.connect()
    con.register("t", df)
    got_sql = con.execute(melt_sql("p1", "SELECT * FROM t", spec)).fetchdf()
    got_py = melt_df("p1", df, spec)
    key = ["part", "k", "metric", "v"]
    a = got_py[key].sort_values(key).reset_index(drop=True)
    b = got_sql[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    # two value columns -> two rows per input row
    assert len(a) == 2 * len(df)


def test_melt_no_value_columns_emits_row_marker():
    df = pd.DataFrame({"k1": ["x", "y"], "k2": [1, 2]})
    spec = [("k1", "s"), ("k2", "i")]
    out = melt_df("p", df, spec)
    assert list(out["metric"].unique()) == ["_row"]
    assert (out["v"] == 1.0).all()
    con = duckdb.connect()
    con.register("t2", df)
    got = con.execute(melt_sql("p", "SELECT * FROM t2", spec)).fetchdf()
    assert sorted(got["k"]) == sorted(out["k"])


def test_melt_preserves_row_identity_exactly():
    # integer keys are melted as exact strings, not doubles: two rows
    # that differ only beyond 2**53 must stay distinguishable
    big = 2**60
    df = pd.DataFrame({"id": [big, big + 1]})
    out = melt_df("p", df, [("id", "i")])
    assert set(out["k"]) == {str(big), str(big + 1)}


def test_melt_parity_hypothesis_sweep():
    """Randomized frames x specs: the pandas melt and the DuckDB melt
    generated from the same declarative spec must agree row-for-row."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    kind_vals = {
        "s": st.one_of(st.none(), st.sampled_from(["", "a", "B b", "x|y", "0"])),
        "i": st.one_of(st.none(), st.integers(-(2**62), 2**62)),
        "b": st.one_of(st.none(), st.booleans()),
        "ts": st.one_of(st.none(), st.integers(0, 2**41).map(
            lambda us: pd.Timestamp(1970, 1, 1) + pd.Timedelta(microseconds=us))),
        "f": st.one_of(st.none(), st.sampled_from(
            [0.0, -0.5, 1.5e12, float("nan"), -2.25, 3.141592653589793])),
    }

    @st.composite
    def frame_and_spec(draw):
        kinds = draw(st.lists(st.sampled_from("sibtf"), min_size=1, max_size=4))
        spec = []
        cols = {}
        n = draw(st.integers(0, 6))
        for ci, kd in enumerate(kinds):
            kd = {"t": "ts"}.get(kd, kd)
            name = f"c{ci}"
            spec.append((name, kd))
            cols[name] = draw(st.lists(kind_vals[kd], min_size=n, max_size=n))
        return pd.DataFrame(cols, columns=[c for c, _ in spec]), spec

    @settings(max_examples=60, deadline=None)
    @given(frame_and_spec())
    def run(fs):
        df, spec = fs
        # pandas object columns of None/bool etc. are fine for melt_df;
        # DuckDB needs typed columns — cast via explicit dtypes
        typed = df.copy()
        for c, kd in spec:
            if kd == "i":
                typed[c] = pd.array(typed[c], dtype="Int64")
            elif kd == "b":
                typed[c] = pd.array(typed[c], dtype="boolean")
            elif kd == "f":
                typed[c] = pd.array(typed[c], dtype="Float64")
            elif kd == "ts":
                typed[c] = pd.to_datetime(typed[c])
        con = duckdb.connect()
        con.register("t", typed)
        got_sql = con.execute(melt_sql("p", "SELECT * FROM t", spec)).fetchdf()
        got_py = melt_df("p", df, spec)
        key = ["part", "k", "metric", "v"]
        a = got_py[key].sort_values(key).reset_index(drop=True)
        b = got_sql[key].sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)

    run()
