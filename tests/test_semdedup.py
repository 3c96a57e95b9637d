"""SemDeDup (stages/semdedup.py, catalog q98).

``_pair_removed`` is checked against a brute-force exact-rational
oracle (Fraction cosine² vs τ² — no floats at all); the end-to-end
stage is checked against a plain-Python Lloyd + pair-scan replay.
"""

from __future__ import annotations

import random
from fractions import Fraction

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from rust_paddle_ocr_ray.stages.kmeans import SCALE, _assign, _quantize
from rust_paddle_ocr_ray.stages.semdedup import (
    TAU_DEN,
    TAU_NUM,
    _pair_removed,
    semdedup,
)


def _oracle_removed(x: np.ndarray, num: int, den: int) -> list[bool]:
    m = len(x)
    removed = [False] * m
    for i in range(m):
        for j in range(i):
            d = int(np.dot(x[i], x[j]))
            if d <= 0:
                continue
            n_i = int(np.dot(x[i], x[i]))
            n_j = int(np.dot(x[j], x[j]))
            if Fraction(d * d, n_i * n_j) >= Fraction(num, den):
                removed[i] = True
                break
    return removed


def test_pair_removed_matches_exact_rational_oracle():
    rng = np.random.default_rng(42)
    for trial in range(30):
        m = rng.integers(2, 12)
        x = rng.integers(-400_000, 400_000, size=(m, 8)).astype("int64")
        # plant an exact duplicate and a near-duplicate sometimes
        if trial % 3 == 0 and m >= 4:
            x[1] = x[0]
            x[3] = x[2] + rng.integers(-10, 10, size=8)
        got = _pair_removed(x, TAU_NUM, TAU_DEN)
        want = _oracle_removed(x, TAU_NUM, TAU_DEN)
        assert got.tolist() == want


def test_exact_duplicate_removes_higher_id_only():
    x = np.array([[100, 200, 300], [100, 200, 300], [-100, 50, 9]],
                 dtype="int64")
    got = _pair_removed(x, TAU_NUM, TAU_DEN)
    assert got.tolist() == [False, True, False]


def test_boundary_is_inclusive():
    # cos² EXACTLY τ² must remove (>= rule).  With τ² = 1/2:
    # u=(3,4), v=u+u⊥=(-1,7) ⇒ dot=25, |u|²=25, |v|²=50 and
    # dot²·2 = 1250 = 1·25·50 — exact equality, float would waffle.
    x = np.array([[3, 4], [-1, 7]], dtype="int64")
    assert _pair_removed(x, 1, 2).tolist() == [False, True]
    # one ulp under the boundary must keep: τ² = 1/2 + ε via 501/1000
    assert _pair_removed(x, 501, 1000).tolist() == [False, False]


def test_stage_matches_plain_python_replay(ray_session):
    rng = np.random.default_rng(7)
    n, dim, k, iters = 60, 6, 3, 2
    emb = rng.normal(size=(n, dim)).astype("float32")
    emb[11] = emb[10]           # exact semantic duplicate
    emb[25] = emb[24] * 1.001   # near duplicate
    df = pd.DataFrame({"vec_id": np.arange(n, dtype="int64"),
                       "embedding": list(emb)})

    init = _quantize(df["embedding"][:k], SCALE)
    out = (semdedup(rd.from_pandas(df), init, iters=iters)
           .to_pandas().sort_values("vec_id").reset_index(drop=True))

    # plain replay: Lloyd with the same pinned rules
    x = _quantize(df["embedding"], SCALE)
    c = init.copy()
    for _ in range(iters):
        a = _assign(x, c)
        for cid in range(k):
            mem = x[a == cid]
            if len(mem):
                s = mem.sum(axis=0)
                c[cid] = np.sign(s) * (np.abs(s) // len(mem))
    a = _assign(x, c)
    want_removed = np.zeros(n, dtype=bool)
    for cid in range(k):
        ids = np.flatnonzero(a == cid)
        rem = _oracle_removed(x[ids], TAU_NUM, TAU_DEN)
        want_removed[ids] = rem

    assert out["cid"].to_numpy().tolist() == a.tolist()
    assert out["removed"].to_numpy().astype(bool).tolist() == want_removed.tolist()
    assert out.loc[11, "removed"] == 1      # planted exact dup goes
    assert 0 < out["removed"].sum() < n     # nontrivial both ways


def test_max_cluster_raises(ray_session):
    rng = np.random.default_rng(1)
    emb = rng.normal(size=(12, 4)).astype("float32")
    df = pd.DataFrame({"vec_id": np.arange(12, dtype="int64"),
                       "embedding": list(emb)})
    init = _quantize(df["embedding"][:2], SCALE)
    with pytest.raises(Exception, match="max_cluster"):
        semdedup(rd.from_pandas(df), init, iters=1,
                 max_cluster=3).to_pandas()


def test_assign_with_distance_matches_replay(ray_session):
    from rust_paddle_ocr_ray.stages.kmeans import assign_with_distance

    rng = np.random.default_rng(3)
    emb = rng.normal(size=(40, 5)).astype("float32")
    df = pd.DataFrame({"vec_id": np.arange(40, dtype="int64"),
                       "embedding": list(emb)})
    c = _quantize(df["embedding"][:4], SCALE)
    out = (assign_with_distance(rd.from_pandas(df), c)
           .to_pandas().sort_values("vec_id").reset_index(drop=True))
    x = _quantize(df["embedding"], SCALE)
    a = _assign(x, c)
    d2 = ((x * x).sum(axis=1)[:, None] - 2 * (x @ c.T)
          + (c * c).sum(axis=1)[None, :])
    assert out["cid"].tolist() == a.tolist()
    assert out["dist"].tolist() == d2[np.arange(len(a)), a].tolist()


def test_pair_removed_chunked_equals_unchunked():
    rng = np.random.default_rng(9)
    x = rng.integers(-300_000, 300_000, size=(37, 6)).astype("int64")
    x[5] = x[2]
    x[30] = x[7]
    full = _pair_removed(x, TAU_NUM, TAU_DEN, chunk=1024)
    for chunk in (1, 2, 7, 36, 37):
        assert _pair_removed(x, TAU_NUM, TAU_DEN, chunk=chunk).tolist() \
            == full.tolist(), chunk
