"""connected_components (stages/cluster.py): planted-truth clusters,
broadcast == distributed equivalence, multi-hop propagation, and the
convergence-cap over-segmentation contract."""

from __future__ import annotations

import pandas as pd
import pytest

import ray.data as rd

from rust_paddle_ocr_ray.stages.cluster import connected_components


def _run(pairs, node_ids, strategy, **kw) -> dict:
    pairs_ds = rd.from_pandas(pd.DataFrame(pairs, columns=["a", "b"])) if pairs \
        else rd.from_pandas(pd.DataFrame({"a": pd.Series(dtype="int64"),
                                          "b": pd.Series(dtype="int64")}))
    nodes_ds = rd.from_pandas(pd.DataFrame({"doc_id": node_ids}))
    out = connected_components(pairs_ds, nodes_ds, strategy=strategy, **kw).to_pandas()
    return dict(zip(out["doc_id"], out["cluster_id"]))


#: two triangles sharing nothing + a 4-hop chain + singletons; the chain
#: needs multiple propagation rounds (diameter 4)
PAIRS = [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23), (23, 24)]
NODES = [1, 2, 3, 10, 11, 20, 21, 22, 23, 24, 99, 100]
EXPECTED = {1: 1, 2: 1, 3: 1, 10: 10, 11: 10,
            20: 20, 21: 20, 22: 20, 23: 20, 24: 20, 99: 99, 100: 100}


@pytest.mark.parametrize("strategy", ["broadcast", "distributed"])
def test_planted_clusters(ray_session, strategy):
    assert _run(PAIRS, NODES, strategy) == EXPECTED


def test_auto_selects_broadcast_under_cap(ray_session):
    assert _run(PAIRS, NODES, None) == EXPECTED


def test_empty_pairs_all_singletons(ray_session):
    assert _run([], [5, 7], "broadcast") == {5: 5, 7: 7}
    assert _run([], [5, 7], "distributed") == {5: 5, 7: 7}


def test_convergence_cap_oversegments_but_completes(ray_session):
    # chain 0-1-2-...-9: diameter 9 > max_iters=2 -> valid over-segmentation
    # (every label is SOME component member >= the true min, never crosses
    # components), and ids still cover all nodes
    chain = [(i, i + 1) for i in range(9)]
    got = _run(chain, list(range(10)), "distributed", max_iters=2)
    assert set(got) == set(range(10))
    assert all(v <= k for k, v in got.items())
    full = _run(chain, list(range(10)), "distributed", max_iters=16)
    assert full == {i: 0 for i in range(10)}


def test_broadcast_assign_preserves_int64_above_2e53(ray_session):
    """The broadcast assign path must never route ids through float64
    (ADVICE r3): ids >= 2^53 would silently corrupt.  Mapped AND
    unmapped huge ids must come back bit-exact."""
    base = 1 << 62
    pairs = [(base + 1, base + 3)]
    nodes = [base + 1, base + 3, base + 5]  # +5 is an unmapped singleton
    got = _run(pairs, nodes, "broadcast")
    assert got == {base + 1: base + 1, base + 3: base + 1, base + 5: base + 5}
