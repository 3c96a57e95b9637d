"""Deduplication operators for the training-data pipeline (first-class
components alongside the extraction engine; SURVEY.md §2.7 D3 plus the
scale family: exact, MinHash+LSH, SimHash, n-gram Jaccard).

Scale shape of each:

- exact:     hash column in map_batches (vectorized) -> ONE shuffle on
             the hash -> per-group first.  Never shuffles content.
- MinHash:   signatures per batch (stateful actor holds permutation
             params) -> explode to (band, key) rows -> groupby bucket
             -> candidate pairs (bucket size capped -> bounded skew)
             -> Jaccard verify inside the group.  Shuffles only
             (band, key, id, sig) rows, never documents.
- SimHash:   64-bit signature, banded into 4x16-bit keys, Hamming
             verify per bucket.
"""

from __future__ import annotations

import hashlib
from itertools import combinations

import numpy as np
import pandas as pd

from ..functions.hashing import (
    hamming64,
    jaccard,
    minhash_params,
    minhash_signature,
    simhash64,
    stable_hash64,
    word_shingles,
)

# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------

def add_md5(ds, col: str, out: str = "content_md5"):
    """Vectorized content-hash column (the dedup key)."""

    def _h(batch: pd.DataFrame) -> pd.DataFrame:
        batch[out] = batch[col].map(lambda s: hashlib.md5(str(s).encode()).hexdigest())
        return batch

    return ds.map_batches(_h, batch_format="pandas")


def exact_dedup(ds, hash_cols: list[str], id_col: str):
    """Keep the min-``id_col`` row per hash group (hash-partitioned shuffle
    + per-group first; the D3 pattern).  Returns the surviving rows."""

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_col, kind="stable").head(1)

    return ds.groupby(hash_cols).map_groups(first, batch_format="pandas")


# --------------------------------------------------------------------------
# MinHash + LSH near-dup
# --------------------------------------------------------------------------

class MinHasher:
    """Actor-pool stage: permutation params built once per actor (ST2
    pattern); emits one (id, band, key, shingle-count) row per band."""

    def __init__(self, text_col: str, id_col: str, num_perm: int = 128,
                 bands: int = 16, k: int = 3, seed: int = 1):
        self.text_col = text_col
        self.id_col = id_col
        self.bands = bands
        self.k = k
        self.a, self.b = minhash_params(num_perm, seed)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        rows_per_band = self.a.shape[0] // self.bands
        ids, bands_out, keys = [], [], []
        for doc_id, text in zip(batch[self.id_col], batch[self.text_col]):
            sh = word_shingles(str(text), self.k)
            sig = minhash_signature(sh, self.a, self.b)
            for bi in range(self.bands):
                chunk = sig[bi * rows_per_band : (bi + 1) * rows_per_band]
                ids.append(doc_id)
                bands_out.append(bi)
                keys.append(hashlib.md5(chunk.tobytes()).hexdigest()[:16])
        return pd.DataFrame({"doc_id": ids, "band": bands_out, "key": keys})


def minhash_candidate_pairs(band_rows, max_bucket: int = 200):
    """groupby (band, key) -> unordered candidate id pairs (deduped later).
    Buckets larger than ``max_bucket`` are dropped (degenerate content —
    logged via the ``overflow`` marker rows)."""

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(g["doc_id"].tolist()))
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": []})
        if len(ids) > max_bucket:
            return pd.DataFrame({"a": [-1], "b": [len(ids)]})  # overflow marker
        a, b = zip(*combinations(ids, 2))
        return pd.DataFrame({"a": list(a), "b": list(b)})

    return band_rows.groupby(["band", "key"]).map_groups(pairs, batch_format="pandas")


def minhash_dedup_pairs(docs, text_col: str, id_col: str, threshold: float = 0.7,
                        num_perm: int = 128, bands: int = 16, k: int = 3,
                        concurrency=None, max_bucket: int = 200):
    """Full near-dup pipeline -> verified pairs (a, b, jaccard >= threshold).

    Candidate generation shuffles only signature rows; verification
    re-reads the two texts via a broadcast lookup when the doc set is
    small, else joins back by id.  Here (library implementation) we
    verify inside a second pass keyed on the candidate's smaller id,
    with texts shipped through a broadcast map for ids that appear in
    candidates only — candidate sets are tiny relative to the corpus.
    """
    import ray
    import ray.data  # noqa: F401

    band_rows = docs.map_batches(
        MinHasher,
        fn_constructor_kwargs={
            "text_col": text_col, "id_col": id_col,
            "num_perm": num_perm, "bands": bands, "k": k,
        },
        batch_format="pandas",
        concurrency=concurrency or (1, 4),
    )
    cand = minhash_candidate_pairs(band_rows, max_bucket=max_bucket).to_pandas()
    cand = cand[cand["a"] >= 0].drop_duplicates()
    if cand.empty:
        return pd.DataFrame({"a": [], "b": [], "jaccard": []})

    need = sorted(set(cand["a"]) | set(cand["b"]))
    need_set = set(need)

    def pick(batch: pd.DataFrame) -> pd.DataFrame:
        m = batch[batch[id_col].isin(need_set)]
        return m[[id_col, text_col]]

    texts = docs.map_batches(pick, batch_format="pandas").to_pandas()
    lookup = dict(zip(texts[id_col], texts[text_col]))
    sh = {i: word_shingles(str(lookup[i]), k) for i in need if i in lookup}
    out = []
    for a, b in zip(cand["a"], cand["b"]):
        if a in sh and b in sh:
            j = jaccard(sh[a], sh[b])
            if j >= threshold:
                out.append((a, b, j))
    return pd.DataFrame(out, columns=["a", "b", "jaccard"])


# --------------------------------------------------------------------------
# SimHash near-dup
# --------------------------------------------------------------------------

def add_simhash(ds, text_col: str, out: str = "simhash"):
    def _sh(batch: pd.DataFrame) -> pd.DataFrame:
        batch[out] = batch[text_col].map(lambda s: np.uint64(simhash64(str(s))))
        return batch

    return ds.map_batches(_sh, batch_format="pandas")


def simhash_pairs(docs, text_col: str, id_col: str, max_hamming: int = 3,
                  max_bucket: int = 500):
    """Banded SimHash: 4 x 16-bit keys -> bucket groupby -> Hamming verify.
    Any pair within Hamming distance 3 shares at least one of 4 bands."""
    with_sig = add_simhash(docs, text_col)

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        rows = {"doc_id": [], "band": [], "key": [], "sig": []}
        for doc_id, sig in zip(batch[id_col], batch["simhash"]):
            s = int(sig)
            for bi in range(4):
                rows["doc_id"].append(doc_id)
                rows["band"].append(bi)
                rows["key"].append((s >> (16 * bi)) & 0xFFFF)
                rows["sig"].append(np.uint64(s))
        return pd.DataFrame(rows)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        rows = sorted(set(zip(g["doc_id"].tolist(), (int(x) for x in g["sig"]))))
        if len(rows) < 2 or len(rows) > max_bucket:
            return pd.DataFrame({"a": [], "b": [], "hamming": []})
        out = []
        for (ia, sa), (ib, sb) in combinations(rows, 2):
            h = hamming64(sa, sb)
            if h <= max_hamming:
                out.append((ia, ib, h))
        return pd.DataFrame(out, columns=["a", "b", "hamming"])

    cand = with_sig.map_batches(explode, batch_format="pandas")
    res = cand.groupby(["band", "key"]).map_groups(pairs, batch_format="pandas").to_pandas()
    return res.drop_duplicates(subset=["a", "b"]).reset_index(drop=True)


# --------------------------------------------------------------------------
# n-gram Jaccard within explicit buckets
# --------------------------------------------------------------------------

def ngram_jaccard_pairs(docs, text_col: str, id_col: str, bucket_cols: list[str],
                        threshold: float = 0.5, k: int = 3, max_bucket: int = 200):
    """Exact word-k-gram Jaccard for all pairs inside pre-bucketed groups
    (the quadratic verify, bounded by bucket size)."""

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2 or len(g) > max_bucket:
            return pd.DataFrame({"a": [], "b": [], "jaccard": []})
        items = sorted(zip(g[id_col].tolist(), g[text_col].tolist()))
        sh = [(i, word_shingles(str(t), k)) for i, t in items]
        out = []
        for (ia, sa), (ib, sb) in combinations(sh, 2):
            j = jaccard(sa, sb)
            if j >= threshold:
                out.append((ia, ib, j))
        return pd.DataFrame(out, columns=["a", "b", "jaccard"])

    return docs.groupby(bucket_cols).map_groups(pairs, batch_format="pandas")
