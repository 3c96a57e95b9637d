"""Integer-exact distributed k-means (stages/kmeans.py, catalog q92).

The closed-form check replays Lloyd rounds with a plain-Python loop
(same pinned rules: micro-unit floor quantization, exact integer
distances, lowest-cid tie-break, toward-zero division, keep-on-empty);
the combine-path check demands bit-identical driver vs exchange
output; the twin check runs the unrolled CTE over the same frame.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from rust_paddle_ocr_ray.stages.kmeans import (
    SCALE,
    _quantize,
    _trunc_div,
    kmeans_quantized,
)


def _frame(vecs: np.ndarray) -> pd.DataFrame:
    return pd.DataFrame({
        "vec_id": np.arange(len(vecs), dtype="int64"),
        "embedding": [np.asarray(v, dtype="float32") for v in vecs],
    })


def _reference(vecs: np.ndarray, init: np.ndarray,
               iters: int) -> pd.DataFrame:
    """Plain-Python Lloyd replay of the pinned rules."""
    x = np.floor(vecs.astype("float64") * SCALE).astype("int64")
    cents = init.copy()
    k, dim = cents.shape
    counts = [0] * k
    for _ in range(iters):
        assign = []
        for row in x:
            best, bd = None, None
            for cid in range(k):
                d = int(((row - cents[cid]) ** 2).sum())
                if bd is None or d < bd:
                    best, bd = cid, d
            assign.append(best)
        counts = [assign.count(c) for c in range(k)]
        new = cents.copy()
        for cid in range(k):
            if counts[cid]:
                s = x[np.array(assign) == cid].sum(axis=0)
                new[cid] = [int(math.copysign(abs(int(v)) // counts[cid], v))
                            if v else 0 for v in s]
        cents = new
    return pd.DataFrame({
        "cid": np.repeat(np.arange(k, dtype="int64"), dim),
        "n_members": np.repeat(np.array(counts, dtype="int64"), dim),
        "dim": np.tile(np.arange(dim, dtype="int64"), k),
        "cval": cents.ravel(),
    })


def test_closed_form_tiny(ray_session):
    rng = np.random.RandomState(5)
    vecs = np.concatenate([rng.normal(0.3, 0.05, (12, 4)),
                           rng.normal(-0.3, 0.05, (13, 4))]).astype("float32")
    df = _frame(vecs)
    init = _quantize(df["embedding"].iloc[:2], SCALE)
    got = kmeans_quantized(rd.from_pandas(df), init, iters=3)
    want = _reference(np.stack(df["embedding"].to_numpy()), init, 3)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want, check_dtype=False)
    # two planted blobs, two centroids: every vector lands somewhere
    assert got.groupby("cid")["n_members"].first().sum() == len(df)


def test_empty_cluster_keeps_centroid(ray_session):
    """A centroid far outside the data attracts nobody and must stay
    put (the pinned keep-on-empty rule)."""
    vecs = np.full((10, 3), 0.2, dtype="float32")
    df = _frame(vecs)
    far = np.array([[10 * SCALE] * 3], dtype="int64")
    init = np.concatenate([_quantize(df["embedding"].iloc[:1], SCALE), far])
    got = kmeans_quantized(rd.from_pandas(df), init, iters=2)
    c1 = got[got["cid"] == 1]
    assert (c1["cval"].to_numpy() == 10 * SCALE).all()
    assert (c1["n_members"] == 0).all()


def test_tie_breaks_to_lowest_cid(ray_session):
    """A vector equidistant from two centroids joins the lower cid on
    BOTH engines (np.argmin first-index == ROW_NUMBER (dist, cid))."""
    df = _frame(np.array([[0.0, 0.0]], dtype="float32"))
    init = np.array([[SCALE, 0], [-SCALE, 0]], dtype="int64")
    got = kmeans_quantized(rd.from_pandas(df), init, iters=1)
    sizes = got.groupby("cid")["n_members"].first()
    assert sizes[0] == 1 and sizes[1] == 0


def test_trunc_div_matches_duckdb_semantics():
    import duckdb

    s = np.array([-7, 7, -9, 9, 0], dtype="int64")
    n = np.array([2, 2, 4, 4, 3], dtype="int64")
    want = [duckdb.sql(f"SELECT {a} // {b}").fetchone()[0]
            for a, b in zip(s, n)]
    assert _trunc_div(s, n).tolist() == want


def test_combine_paths_bit_identical(ray_session):
    rng = np.random.RandomState(9)
    df = _frame(rng.uniform(-0.5, 0.5, (80, 6)).astype("float32"))
    init = _quantize(df["embedding"].iloc[:4], SCALE)
    a = kmeans_quantized(rd.from_pandas(df), init, iters=3,
                         combine="driver")
    b = kmeans_quantized(rd.from_pandas(df), init, iters=3,
                         combine="exchange")
    pd.testing.assert_frame_equal(a.reset_index(drop=True),
                                  b.reset_index(drop=True))


def test_matches_duckdb_twin(ray_session):
    import duckdb

    from rust_paddle_ocr_ray.pipelines.catalog import _q92_sql

    rng = np.random.RandomState(3)
    df = _frame(rng.uniform(-0.5, 0.5, (50, 5)).astype("float32"))
    emb = pd.DataFrame({
        "vec_id": df["vec_id"],
        "embedding": [list(map(float, v)) for v in df["embedding"]],
    })
    con = duckdb.connect()
    con.register("embeddings", emb)
    want = (con.execute(_q92_sql(k=3, iters=2)).fetchdf()
            .sort_values(["cid", "dim"]).reset_index(drop=True)
            .astype("int64"))
    init = _quantize(df["embedding"].iloc[:3], SCALE)
    got = (kmeans_quantized(rd.from_pandas(df), init, iters=2)
           .sort_values(["cid", "dim"]).reset_index(drop=True)
           [want.columns.tolist()].astype("int64"))
    pd.testing.assert_frame_equal(got, want)
