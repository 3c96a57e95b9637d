"""duplicate_ngram_stats (stages/dedup.py): the distributed two-exchange
form must agree with a straightforward set-of-gram-strings reference on
every edge the SQL twin encodes — short docs (whole-doc gram), empty /
whitespace-only docs (zero grams, fraction 0), within-doc repeats (never
duplication on their own), and cross-doc shared runs — regardless of
block layout."""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from rust_paddle_ocr_ray.stages.dedup import duplicate_ngram_stats


def _grams(text: str, k: int = 3) -> set[str]:
    words = text.lower().split()
    if not words:
        return set()
    if len(words) < k:
        return {" ".join(words)}
    return {" ".join(words[i:i + k]) for i in range(len(words) - k + 1)}


def _reference(df: pd.DataFrame, k: int = 3) -> pd.DataFrame:
    per_doc = {i: _grams(t, k) for i, t in zip(df.doc_id, df.text)}
    from collections import Counter

    counts = Counter(g for s in per_doc.values() for g in s)
    rows = []
    for i, s in per_doc.items():
        n, nd = len(s), sum(1 for g in s if counts[g] > 1)
        rows.append((i, n, nd, nd / n if n else 0.0))
    return (pd.DataFrame(rows, columns=["doc_id", "n_grams", "n_dup", "dup_fraction"])
            .sort_values("doc_id").reset_index(drop=True))


def _run(df: pd.DataFrame, blocks: int = 7) -> pd.DataFrame:
    out = duplicate_ngram_stats(rd.from_pandas(df).repartition(blocks),
                                "text", "doc_id", k=3)
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


def test_matches_reference_on_planted_corpus(ray_session):
    rng = np.random.RandomState(5)
    vocab = [f"w{i}" for i in range(40)]
    boiler = "quick brown fox jumps over the lazy dog tonight"
    texts = []
    for i in range(120):
        body = " ".join(rng.choice(vocab, rng.randint(3, 30)))
        # ~1/3 of docs share the boilerplate run -> real cross-doc dup grams
        texts.append(body + " " + boiler if i % 3 == 0 else body)
    df = pd.DataFrame({"doc_id": np.arange(120, dtype="int64"), "text": texts})
    got = _run(df)
    pd.testing.assert_frame_equal(got[["doc_id", "n_grams", "n_dup", "dup_fraction"]],
                                  _reference(df))
    assert (got.loc[got.doc_id % 3 == 0, "n_dup"] > 0).all()


def test_edge_docs(ray_session):
    df = pd.DataFrame({
        "doc_id": np.arange(7, dtype="int64"),
        "text": [
            "",                       # zero grams
            "   \t  ",                # whitespace-only: zero grams
            "one two",                # < k words: whole-doc gram
            "one two",                # same whole-doc gram -> both dup
            "a b c a b c a b c",      # within-doc repeat, shared nowhere
            "unique run of words x",  # no duplication at all
            "solo",                   # single word, unique
        ],
    })
    got = _run(df, blocks=3)
    ref = _reference(df)
    pd.testing.assert_frame_equal(got[ref.columns], ref)
    # the whole-doc-gram pair is fully covered, the rest not at all
    assert got.set_index("doc_id").loc[2, "dup_fraction"] == 1.0
    assert got.set_index("doc_id").loc[3, "dup_fraction"] == 1.0
    assert got.set_index("doc_id").loc[4, "n_dup"] == 0
    assert got.set_index("doc_id").loc[0, ["n_grams", "dup_fraction"]].tolist() == [0, 0.0]


def test_block_layout_invariance(ray_session):
    rng = np.random.RandomState(11)
    vocab = [f"t{i}" for i in range(15)]
    df = pd.DataFrame({
        "doc_id": np.arange(60, dtype="int64"),
        "text": [" ".join(rng.choice(vocab, rng.randint(1, 12))) for _ in range(60)],
    })
    a = _run(df, blocks=1)
    b = _run(df, blocks=13)
    pd.testing.assert_frame_equal(a, b)
