"""Behavioral tests for the dedup + similarity operator family
(stages/dedup.py, stages/similarity.py) with PLANTED ground truth —
these back the rows-only catalog entries (q17/q18/q19/q21) that have no
SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from rust_paddle_ocr_ray.stages.dedup import (
    exact_dedup,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from rust_paddle_ocr_ray.stages.similarity import knn_bruteforce, knn_lsh

WORDS = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "lambda mu nu xi omicron pi rho sigma tau upsilon").split()


def _doc(rng: np.random.RandomState, n: int = 60) -> str:
    return " ".join(rng.choice(WORDS) for _ in range(n))


@pytest.fixture(scope="module")
def planted_docs():
    """100 random docs + 5 planted near-dup pairs (small edits) + 2 exact
    dup pairs."""
    rng = np.random.RandomState(0)
    texts = [_doc(rng) for _ in range(100)]
    truth_near = []
    for k in range(5):
        base = texts[k * 10]
        words = base.split()
        words[3] = "EDITED"  # one-word edit -> jaccard >> 0.7
        texts.append(" ".join(words))
        truth_near.append((k * 10, 100 + k))
    truth_exact = []
    for k in range(2):
        texts.append(texts[k * 7 + 1])
        truth_exact.append((k * 7 + 1, 105 + k))
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    return df, truth_near, truth_exact


def test_exact_dedup_planted(ray_session, planted_docs):
    df, _, truth_exact = planted_docs
    from rust_paddle_ocr_ray.stages.dedup import add_md5

    ds = add_md5(rd.from_pandas(df), "text")
    kept = exact_dedup(ds, ["content_md5"], "doc_id").to_pandas()
    assert len(kept) == len(df) - len(truth_exact)
    kept_ids = set(kept["doc_id"])
    for orig, dup in truth_exact:
        assert orig in kept_ids and dup not in kept_ids


def test_minhash_finds_planted_near_dups(ray_session, planted_docs):
    df, truth_near, truth_exact = planted_docs
    ds = rd.from_pandas(df)
    pairs = minhash_dedup_pairs(ds, "text", "doc_id", threshold=0.7, k=3).to_pandas()
    found = set(map(tuple, pairs[["a", "b"]].to_numpy().tolist()))
    for a, b in truth_near:
        assert (a, b) in found, f"planted near-dup ({a},{b}) missed"
    for a, b in truth_exact:
        assert (a, b) in found
    # verified pairs really are similar
    assert (pairs["jaccard"] >= 0.7).all()


def test_minhash_scale_path_matches_broadcast(ray_session, planted_docs):
    """The bucketed join-back verify (forced via broadcast_max_docs=0 —
    the >20k-candidate scale path) must agree exactly with the default
    broadcast-shingle verify."""
    df, _, _ = planted_docs
    ds = rd.from_pandas(df)
    small = (minhash_dedup_pairs(ds, "text", "doc_id", threshold=0.7, k=3)
             .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    big = (minhash_dedup_pairs(ds, "text", "doc_id", threshold=0.7, k=3,
                               broadcast_max_docs=0)
           .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(small, big)
    assert len(small) > 0


def test_minhash_bloom_id_filter_matches_exact(ray_session, planted_docs):
    """max_driver_ids=0 forces the candidate-id semi-join filter onto the
    bloom path (O(bits) driver) with the fully distributed verify — the
    output must equal the exact-set path bit for bit (bloom false
    positives only shingle extra docs; they cannot add or drop pairs)."""
    df, _, _ = planted_docs
    ds = rd.from_pandas(df)
    exact = (minhash_dedup_pairs(ds, "text", "doc_id", threshold=0.7, k=3)
             .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    bloom = (minhash_dedup_pairs(ds, "text", "doc_id", threshold=0.7, k=3,
                                 max_driver_ids=0)
             .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(exact, bloom)
    assert len(exact) > 0


def test_minhash_overflow_buckets_dropped(ray_session, planted_docs):
    """max_bucket=1 forces every multi-doc LSH bucket into the overflow
    marker path: the run must complete cleanly (empty typed Dataset),
    exercising the no-candidates branch."""
    df, _, _ = planted_docs
    ds = rd.from_pandas(df)
    pairs = minhash_dedup_pairs(ds, "text", "doc_id", threshold=0.7, k=3,
                                max_bucket=1).to_pandas()
    assert len(pairs) == 0
    # Ray drops column metadata on fully-empty datasets; when columns
    # survive they must be the declared pair schema
    assert list(pairs.columns) in ([], ["a", "b", "jaccard"])


def test_simhash_finds_exact_dups(ray_session, planted_docs):
    df, _, truth_exact = planted_docs
    ds = rd.from_pandas(df)
    res = simhash_pairs(ds, "text", "doc_id", max_hamming=3).to_pandas()
    found = set(map(tuple, res[["a", "b"]].to_numpy().tolist()))
    for a, b in truth_exact:
        assert (a, b) in found
    assert (res["hamming"] <= 3).all()


def test_ngram_jaccard_bucketed(ray_session, planted_docs):
    df, truth_near, _ = planted_docs
    df = df.copy()
    df["bucket"] = 0  # single bucket: exact quadratic verify
    ds = rd.from_pandas(df)
    out = ngram_jaccard_pairs(ds, "text", "doc_id", ["bucket"], threshold=0.7, k=3).to_pandas()
    found = set(map(tuple, out[["a", "b"]].to_numpy().tolist()))
    for a, b in truth_near:
        assert (a, b) in found


@pytest.fixture(scope="module")
def embeddings():
    rng = np.random.RandomState(1)
    mat = rng.standard_normal((300, 16))
    return pd.DataFrame({"vec_id": np.arange(300), "embedding": list(mat)})


def test_knn_bruteforce_matches_numpy(ray_session, embeddings):
    ds = rd.from_pandas(embeddings)
    q = {"ids": np.array([0, 1]), "mat": np.stack(embeddings["embedding"][:2])}
    out = knn_bruteforce(ds, q, "vec_id", "embedding", k=5).to_pandas()
    mat = np.stack(embeddings["embedding"])
    matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    for qid in (0, 1):
        sims = matn @ matn[qid]
        sims[qid] = -np.inf
        expect = set(np.argsort(-sims, kind="stable")[:5].tolist())
        got = set(out[out["query_id"] == qid]["neighbor_id"])
        assert got == expect


def test_knn_ivf_recall_vs_bruteforce(ray_session, embeddings):
    """The IVF path (coarse quantizer + nprobe cell scan) must recover
    most of the exact top-k when probing a reasonable share of cells."""
    from rust_paddle_ocr_ray.stages.similarity import knn_ivf

    ds = rd.from_pandas(embeddings)
    q = {"ids": np.array([0, 1, 2]), "mat": np.stack(embeddings["embedding"][:3])}
    exact = knn_bruteforce(ds, q, "vec_id", "embedding", k=5).to_pandas()
    approx = knn_ivf(ds, q, "vec_id", "embedding", k=5, nlist=8, nprobe=3).to_pandas()
    hits = total = 0
    for qid in (0, 1, 2):
        e = set(exact[exact["query_id"] == qid]["neighbor_id"])
        a = set(approx[approx["query_id"] == qid]["neighbor_id"])
        hits += len(e & a)
        total += len(e)
    assert hits / total >= 0.5, f"IVF recall too low: {hits}/{total}"
    # probing ALL cells must reproduce the exact result
    full = knn_ivf(ds, q, "vec_id", "embedding", k=5, nlist=8, nprobe=8).to_pandas()
    for qid in (0, 1, 2):
        e = set(exact[exact["query_id"] == qid]["neighbor_id"])
        f = set(full[full["query_id"] == qid]["neighbor_id"])
        assert f == e


def test_knn_lsh_recall_vs_bruteforce(ray_session, embeddings):
    """The bucketed ANN must achieve decent recall of the exact top-k on
    its own bucket's candidates (few bits -> large buckets -> recall)."""
    ds = rd.from_pandas(embeddings)
    q = {"ids": np.array([0, 1, 2]), "mat": np.stack(embeddings["embedding"][:3])}
    exact = knn_bruteforce(ds, q, "vec_id", "embedding", k=5).to_pandas()
    approx = knn_lsh(ds, q, "vec_id", "embedding", k=5, dim=16, bits=4).to_pandas()
    hits = total = 0
    for qid in (0, 1, 2):
        e = set(exact[exact["query_id"] == qid]["neighbor_id"])
        a = set(approx[approx["query_id"] == qid]["neighbor_id"])
        hits += len(e & a)
        total += len(e)
    assert hits / total >= 0.4, f"LSH recall too low: {hits}/{total}"
