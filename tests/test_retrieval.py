"""BM25 lexical retrieval (stages/retrieval.py, catalog q95).

The closed-form check recomputes the pinned integer-exact formula
(idf_ubits * 22*T*tf // (10*T*tf + 3*T + 9*N*dl)) with a plain-Python
dict loop over a tiny hand-auditable corpus; further checks pin the
tie order, the local-top-k partial exactness across many small blocks,
and the big-number exact path (idf*22*T*tf overflowing int64 must fall
back to Python ints without changing any in-range answer).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import ray.data as rd

from rust_paddle_ocr_ray.stages.retrieval import UNIT, bm25_topk, idf_ubits

DOCS = pd.DataFrame({
    "doc_id": [0, 1, 2, 3, 4, 5],
    "text": [
        "the cat sat on the mat",
        "the cat ate the cat food",
        "dog park dog dog",
        "",                          # empty: length 0, never matches
        "CAT and DOG",               # lowercasing folds
        "mat mat mat mat",
    ],
})

QUERIES = {1: ["cat", "mat"], 2: ["dog"], 3: ["unicorn"]}


def _reference(df: pd.DataFrame, queries: dict[int, list[str]],
               k: int) -> pd.DataFrame:
    """Plain-Python oracle: exact-integer BM25 with the pinned order."""
    toks = {r.doc_id: str(r.text).lower().split() for r in df.itertuples()}
    n = len(df)
    t = sum(len(ws) for ws in toks.values())
    rows = []
    for q, terms in sorted(queries.items()):
        scored = []
        for d, ws in toks.items():
            dl = len(ws)
            s = 0
            hit = False
            for term in sorted(set(terms)):
                tf = ws.count(term)
                if tf == 0:
                    continue
                dfreq = sum(1 for w2 in toks.values() if term in w2)
                idf = math.floor(
                    math.log2(1.0 + (n - dfreq + 0.5) / (dfreq + 0.5)) * UNIT)
                s += idf * 22 * t * tf // (10 * t * tf + 3 * t + 9 * n * dl)
                hit = True
            if hit:
                scored.append((s, d))
        scored.sort(key=lambda sd: (-sd[0], sd[1]))
        for rank, (s, d) in enumerate(scored[:k], 1):
            rows.append({"query_id": q, "rank": rank, "doc_id": d,
                         "score_ubits": s})
    if not rows:
        return pd.DataFrame({c: pd.Series([], dtype="int64")
                             for c in ("query_id", "rank", "doc_id",
                                       "score_ubits")})
    return pd.DataFrame(rows).astype("int64")


def _run(df: pd.DataFrame, queries, k=10, **kw) -> pd.DataFrame:
    out = bm25_topk(rd.from_pandas(df), queries, k=k, **kw)
    return (out.sort_values(["query_id", "rank"])
            .reset_index(drop=True).astype("int64"))


def test_closed_form_tiny_corpus():
    got = _run(DOCS, QUERIES)
    want = _reference(DOCS, QUERIES, 10)
    pd.testing.assert_frame_equal(got, want)
    # the absent term yields no rows at all for query 3
    assert not (got["query_id"] == 3).any()
    # doc 3 (empty) never appears
    assert not (got["doc_id"] == 3).any()


def test_tie_order_and_k_cut():
    # four identical single-term docs: scores tie, doc_id ascending wins
    df = pd.DataFrame({"doc_id": [9, 4, 7, 1],
                       "text": ["x y", "x y", "x y", "x y"]})
    got = _run(df, {0: ["x"]}, k=3)
    assert got["doc_id"].tolist() == [1, 4, 7]
    assert got["rank"].tolist() == [1, 2, 3]
    assert got["score_ubits"].nunique() == 1


def test_local_topk_partial_exact_across_blocks():
    """Many 1-row blocks: per-batch local top-k must still reproduce
    the global oracle exactly (the partial is exact under the pinned
    total order)."""
    rng = np.random.default_rng(7)
    words = ["alpha", "beta", "gamma", "delta", "pad"]
    df = pd.DataFrame({
        "doc_id": np.arange(40, dtype="int64"),
        "text": [" ".join(rng.choice(words, size=rng.integers(1, 12)))
                 for _ in range(40)],
    })
    queries = {5: ["alpha", "gamma"], 6: ["delta"]}
    ds = rd.from_pandas(df).repartition(20)
    got = (bm25_topk(ds, queries, k=4)
           .sort_values(["query_id", "rank"]).reset_index(drop=True)
           .astype("int64"))
    want = _reference(df, queries, 4)
    pd.testing.assert_frame_equal(got, want)


def test_int64_overflow_falls_back_to_exact_ints():
    """Force idf*22*T*tf past 2^63: repeat one term enough that the
    fast-path guard trips; answers must equal the plain-Python oracle
    (which always uses exact ints)."""
    # T ~ 1e6 tokens, tf ~ 1e6, idf ~ 6.8e5 -> idf*22*T*tf ~ 1.5e19 > 2^63
    big = "needle " * 1_000_000 + "hay"
    df = pd.DataFrame({"doc_id": [0, 1, 2],
                       "text": [big, "needle in hay", "hay only here"]})
    q = {1: ["needle"]}
    got = _run(df, q, k=3)
    want = _reference(df, q, 3)
    pd.testing.assert_frame_equal(got, want)
    # sanity: the guard really trips for this input
    n, t = 3, len(big.split()) + 3 + 3
    idf = idf_ubits(n, 2)
    assert idf * 22 * t * 1_000_000 >= (1 << 63) - 1


def test_empty_inputs():
    empty = pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                          "text": pd.Series([], dtype=object)})
    assert len(bm25_topk(rd.from_pandas(DOCS), {})) == 0
    assert len(bm25_topk(
        rd.from_pandas(empty.assign(text=empty.text.astype(str))),
        {1: ["cat"]})) == 0
