"""DSIR — Data Selection via Importance Resampling (Xie et al.,
NeurIPS 2023): score every raw document by how much it "looks like"
a pinned target distribution, using hashed n-gram features.  This is
the targeted-curation pass large pipelines run to upsample
target-domain-like data out of a web crawl before mixing.

Shape (the q91 bigram-LM recipe, applied to a FIXED feature space):

1. **Count**: each word hashes into one of ``n_buckets`` feature
   buckets (pinned rule below).  One streaming pass emits per-batch
   ``(bucket, ct, cr)`` partials — ``ct`` counts occurrences inside
   TARGET documents, ``cr`` over the whole corpus — combined through
   ONE :func:`~.distinct.grouped_sum` whose key space is the FIXED
   bucket count, so the exchange is O(buckets × blocks) slim int
   rows and documents never shuffle.
2. **Weight LUT**: per bucket, the add-one-smoothed log importance
   ratio in integer micro-bits::

       ubits[b] = floor(log2( ((ct_b + 1) * (Tr + B))
                            / ((cr_b + 1) * (Tt + B)) ) * 10**6)

   with Tt/Tr the target/raw token totals and B = ``n_buckets``.
   The LUT is a plain int64 numpy array of length B — KBs — computed
   once on the driver and broadcast via ``ray.put``.
3. **Score**: a single ZERO-exchange ``map_batches`` pass — a
   document's words live in its own row, so per-batch sums are
   final.  Output one row per document (wordless documents score 0),
   ``dsir_ubits = Σ ubits[bucket(word)]`` — an order-free INTEGER
   sum that hash-matches the DuckDB twin exactly.

Exactness contract:

- the word→bucket hash is a polynomial over the word's first
  ``HASH_CHARS`` code points, ``Σ ord(c_j)·257^(HASH_CHARS-j)
  mod 2^61 mod B`` — the q32 rolling-fingerprint arithmetic, fully
  replayable in SQL with an 8-row powers VALUES table (code points
  and DuckDB ``unicode(substr(...))`` agree for any plane);
- the ONLY float is one ``log2`` per bucket (B of them), taken of a
  ratio of two integer products each exactly representable in
  float64 — guarded by an explicit ``< 2**53`` check (at 100 TB the
  guard trips and the caller must switch to the documented
  log-difference form, trading the last ulp for range; the gate
  scales stay exact);
- floor on a possibly-negative value: ``np.floor`` and DuckDB
  ``floor`` both round toward −∞, so negative weights agree.

No reference analog (rust-paddle-ocr has no corpus statistics); the
operator exists for the training-data catalog (SURVEY §2.5+).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

#: fixed feature-space size — the hashed-n-gram bucket count
N_BUCKETS = 1024

#: how many leading code points of a word enter the hash (pinned so
#: the SQL twin is a fixed 8-term sum, not a per-length unroll)
HASH_CHARS = 8

_MOD = 1 << 61
_POWS = [pow(257, HASH_CHARS - j, _MOD) for j in range(1, HASH_CHARS + 1)]

#: micro-bits per bit — the integer scale of the pinned LUT
UNIT = 1_000_000

#: largest integer float64 represents exactly — the count-product
#: guard bound (module docstring)
_EXACT_F64 = 1 << 53


def word_bucket(word: str, n_buckets: int = N_BUCKETS) -> int:
    """The pinned word→bucket hash (see module docstring)."""
    h = 0
    for j, ch in enumerate(word[:HASH_CHARS]):
        h += ord(ch) * _POWS[j]
    return (h % _MOD) % n_buckets


def _doc_buckets(b: pd.DataFrame, id_col: str, text_col: str,
                 n_buckets: int) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized (doc_row_pos, bucket) arrays for one batch's word
    occurrences: factorize the exploded tokens so the Python hash loop
    runs once per DISTINCT word (vocabulary-sized, the q93 rule), then
    gather per occurrence."""
    toks = b[text_col].str.lower().str.split()
    e = toks.explode().dropna()
    if len(e) == 0:
        return np.empty(0, dtype="int64"), np.empty(0, dtype="int64")
    idx = e.index.to_numpy()
    pos = pd.Series(np.arange(len(b)), index=b.index)
    rows = pos.loc[idx].to_numpy()
    codes, uniq = pd.factorize(e.to_numpy(dtype=object))
    hb = np.fromiter((word_bucket(w, n_buckets) for w in uniq),
                     dtype="int64", count=len(uniq))
    return rows, hb[codes]


def dsir_scores(docs, id_col: str = "doc_id", text_col: str = "text",
                target_col: str = "lang", target_value: str = "en",
                n_buckets: int = N_BUCKETS):
    """Score every document's DSIR importance weight against the
    target subset ``docs[target_col] == target_value``.

    Returns a Dataset of ``(id_col, n_words, dsir_ubits)`` int64 rows,
    one per input document (wordless documents present with zeros)."""
    import ray

    from .distinct import grouped_sum
    from .merge import _get_broadcast

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        rows, buckets = _doc_buckets(b, id_col, text_col, n_buckets)
        if len(buckets) == 0:
            return pd.DataFrame({"bucket": pd.Series([], dtype="int64"),
                                 "ct": pd.Series([], dtype="int64"),
                                 "cr": pd.Series([], dtype="int64")})
        is_t = (b[target_col].to_numpy() == target_value)[rows]
        df = pd.DataFrame({"bucket": buckets, "ct": is_t.astype("int64"),
                           "cr": np.int64(1)})
        return (df.groupby("bucket", sort=False)[["ct", "cr"]]
                .sum().reset_index())

    cnt = grouped_sum(docs.map_batches(partial, batch_format="pandas"),
                      "bucket", ["ct", "cr"], num_buckets=4).to_pandas()

    ct = np.zeros(n_buckets, dtype="int64")
    cr = np.zeros(n_buckets, dtype="int64")
    ct[cnt["bucket"].to_numpy()] = cnt["ct"].to_numpy()
    cr[cnt["bucket"].to_numpy()] = cnt["cr"].to_numpy()
    tt = int(ct.sum())
    tr = int(cr.sum())

    # guard FIRST, in Python ints (arbitrary precision): the int64
    # products below could wrap past 2^63 before an int64-side check
    # ever saw them, silently bypassing the guard they implement
    if ((int(ct.max(initial=0)) + 1) * (tr + n_buckets) >= _EXACT_F64
            or (int(cr.max(initial=0)) + 1) * (tt + n_buckets) >= _EXACT_F64):
        # the exact-in-float64 product guard (module docstring); the
        # log-difference fallback is deliberately NOT silent
        raise ValueError("dsir count products exceed exact float64 range; "
                         "use the log-difference form (tolerance-checked)")
    num = (ct + 1) * (tr + n_buckets)
    den = (cr + 1) * (tt + n_buckets)
    lut = np.floor(
        np.log2(num.astype("float64") / den.astype("float64")) * UNIT
    ).astype("int64")
    ref = ray.put(lut)

    def score(b: pd.DataFrame) -> pd.DataFrame:
        m = _get_broadcast(ref)
        rows, buckets = _doc_buckets(b, id_col, text_col, n_buckets)
        nw = np.zeros(len(b), dtype="int64")
        ub = np.zeros(len(b), dtype="int64")
        if len(buckets):
            np.add.at(nw, rows, 1)
            np.add.at(ub, rows, m[buckets])
        # a document's words all live in its own row: per-batch sums
        # are FINAL — no exchange follows
        return pd.DataFrame({id_col: b[id_col].to_numpy(),
                             "n_words": nw, "dsir_ubits": ub})

    return docs.map_batches(score, batch_format="pandas")
