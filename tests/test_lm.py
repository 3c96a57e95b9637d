"""Bigram-LM perplexity scoring (stages/lm.py, catalog q91).

The closed-form check recomputes the pinned integer micro-bits LUT
with a plain-Python dict loop over a tiny hand-auditable corpus; the
path-equivalence check forces the distributed (bucket-join) path and
demands bit-identical output to the broadcast path.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from rust_paddle_ocr_ray.stages.lm import UNIT, bigram_lm_score

DOCS = pd.DataFrame({
    "doc_id": [0, 1, 2, 3, 4],
    "text": [
        "the cat sat on the mat",
        "the cat ate",
        "one",                      # single token: no bigram, dropped
        "",                         # empty: dropped
        "THE CAT sat",              # lowercasing folds into doc-0 stats
    ],
})


def _reference_scores(df: pd.DataFrame) -> pd.DataFrame:
    """Plain-Python oracle: count, smooth, floor-quantize, sum."""
    toks = {r.doc_id: str(r.text).lower().split() for r in df.itertuples()}
    big: dict[tuple[str, str], int] = {}
    vocab = set()
    for ws in toks.values():
        vocab.update(ws)
        for a, b in zip(ws, ws[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    c1: dict[str, int] = {}
    for (a, _b), c in big.items():
        c1[a] = c1.get(a, 0) + c
    v = len(vocab)
    lut = {k: math.floor(math.log2((c1[k[0]] + v) / (c + 1)) * UNIT)
           for k, c in big.items()}
    rows = []
    for d, ws in toks.items():
        pairs = list(zip(ws, ws[1:]))
        if not pairs:
            continue
        s = sum(lut[p] for p in pairs)
        rows.append({"doc_id": d, "n_bigrams": len(pairs),
                     "score_ubits": s, "avg_ubits": s // len(pairs)})
    return (pd.DataFrame(rows).sort_values("doc_id")
            .reset_index(drop=True).astype("int64"))


def _run(df: pd.DataFrame, **kw) -> pd.DataFrame:
    out = bigram_lm_score(rd.from_pandas(df), **kw).to_pandas()
    return (out.sort_values("doc_id").reset_index(drop=True)
            [["doc_id", "n_bigrams", "score_ubits", "avg_ubits"]]
            .astype("int64"))


def test_closed_form_tiny_corpus(ray_session):
    got = _run(DOCS)
    want = _reference_scores(DOCS)
    pd.testing.assert_frame_equal(got, want)
    # sub-2-token docs are absent, not zero-rows
    assert set(got["doc_id"]) == {0, 1, 4}


def test_costs_non_negative_and_repeat_penalty(ray_session):
    """Smoothed costs are >= 0, and a doc made of the corpus's most
    common bigram scores cheaper per bigram than a rare-bigram doc."""
    df = pd.DataFrame({
        "doc_id": range(4),
        "text": ["a b a b a b a b", "a b a b", "c d", "x y"],
    })
    got = _run(df)
    assert (got["score_ubits"] >= 0).all()
    common = got.set_index("doc_id").loc[1, "avg_ubits"]
    rare = got.set_index("doc_id").loc[3, "avg_ubits"]
    assert common < rare


def test_distributed_path_bit_identical(ray_session):
    """broadcast_max_bigrams=0 forces the bucket-join scale path; the
    output must match the broadcast path exactly (same LUT, same
    integer sums) including dtypes."""
    rng = np.random.RandomState(11)
    words = np.array(["w%d" % i for i in range(40)])
    df = pd.DataFrame({
        "doc_id": np.arange(60),
        "text": [" ".join(rng.choice(words, rng.randint(0, 30)))
                 for _ in range(60)],
    })
    a = _run(df)
    b = _run(df, broadcast_max_bigrams=0)
    pd.testing.assert_frame_equal(a, b)
    # raw dtypes too: the scale path must not leak hash_join's
    # nullable Int64 key dtype into the driver-hashed output
    raw = bigram_lm_score(rd.from_pandas(df),
                          broadcast_max_bigrams=0).to_pandas()
    assert str(raw["doc_id"].dtype) == "int64"


def test_matches_duckdb_twin(ray_session):
    """The catalog query's SQL twin over the same frame agrees."""
    import duckdb

    from rust_paddle_ocr_ray.pipelines.catalog import SQL_Q91

    con = duckdb.connect()
    con.register("documents", DOCS)
    want = (con.execute(SQL_Q91).fetchdf()
            .sort_values("doc_id").reset_index(drop=True).astype("int64"))
    got = _run(DOCS)[want.columns.tolist()]
    pd.testing.assert_frame_equal(got, want)
