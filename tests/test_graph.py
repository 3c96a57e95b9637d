"""Iterative graph scoring (stages/graph.link_rank): a planted tiny
graph verified against a plain-Python reference loop, BOTH execution
shapes (broadcast rank map vs distributed hash-join rounds) proven to
produce identical tables, and the catalog query q90 hash-checked
against its unrolled-CTE DuckDB twin (the driver gate re-proves that
at sf0.01)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from rust_paddle_ocr_ray.stages.graph import PPB, link_rank


def _reference(edges, node_ids, n, iters=5, out_degree=3, d=85):
    """Plain-Python reference of the integer-ppb iteration."""
    base = (100 - d) * (PPB // n) // 100
    rank = {v: PPB // n for v in node_ids}
    for _ in range(iters):
        inflow = {v: 0 for v in node_ids}
        for s, t in edges:
            inflow[t] = inflow.get(t, 0) + rank[s] // out_degree
        rank = {v: base + d * inflow.get(v, 0) // 100 for v in node_ids}
    return rank


def _planted(n=23, seed=3):
    rng = np.random.default_rng(seed)
    node_ids = list(range(n))
    edges = [(s, int(rng.integers(0, n)))
             for s in node_ids for _ in range(3)]
    return node_ids, edges


@pytest.mark.parametrize("mode", ["broadcast", "distributed"])
def test_link_rank_matches_reference(ray_session, mode):
    node_ids, edges = _planted()
    n = len(node_ids)
    e = rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
    nd = rd.from_pandas(pd.DataFrame({"node": node_ids}))
    cap = 0 if mode == "distributed" else 10 ** 9
    got = link_rank(e, nd, n_nodes=n, iters=5,
                    broadcast_max_nodes=cap).to_pandas()
    want = _reference(edges, node_ids, n)
    got = got.sort_values("node").reset_index(drop=True)
    assert len(got) == n
    assert got["rank_ppb"].dtype == np.int64
    for _, row in got.iterrows():
        assert int(row.rank_ppb) == want[int(row.node)], row.node


def test_link_rank_modes_identical(ray_session):
    """The broadcast and distributed shapes are the SAME operator:
    identical output tables on the same input."""
    node_ids, edges = _planted(n=17, seed=9)
    n = len(node_ids)
    outs = []
    for cap in (10 ** 9, 0):
        e = rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
        nd = rd.from_pandas(pd.DataFrame({"node": node_ids}))
        outs.append(link_rank(e, nd, n_nodes=n, iters=4,
                              broadcast_max_nodes=cap)
                    .to_pandas().sort_values("node")
                    .reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_link_rank_no_inlink_nodes_keep_base(ray_session):
    """A node nothing links to must keep exactly the base rank."""
    node_ids = [0, 1, 2]
    edges = [(0, 1), (1, 0), (2, 0)]  # out_degree=1; node 2 has no in
    e = rd.from_pandas(pd.DataFrame(edges, columns=["src", "dst"]))
    nd = rd.from_pandas(pd.DataFrame({"node": node_ids}))
    got = link_rank(e, nd, n_nodes=3, iters=3, out_degree=1,
                    broadcast_max_nodes=0).to_pandas()
    base = 15 * (PPB // 3) // 100
    assert int(got.set_index("node").loc[2, "rank_ppb"]) == base


def test_q90_vs_duckdb_twin(ray_session):
    """Catalog q90 against its unrolled-CTE twin at sf0.001 (the
    driver gate re-proves sf0.01 through the g10 composite)."""
    import duckdb

    from rust_paddle_ocr_ray.pipelines.catalog import SQL_Q90, q90_link_rank

    sf = "/root/testdata/sf0.001"
    got = q90_link_rank(sf).to_pandas().sort_values("node").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')")
    want = con.execute(SQL_Q90).df().sort_values("node").reset_index(drop=True)
    assert len(got) == len(want)
    np.testing.assert_array_equal(got["node"].to_numpy(dtype="int64"),
                                  want["node"].to_numpy(dtype="int64"))
    np.testing.assert_array_equal(
        got["rank_ppb"].to_numpy(dtype="int64"),
        want["rank_ppb"].to_numpy(dtype="int64"))
