"""Distributed bigram language-model quality scoring — the CCNet-style
"train a cheap LM on the corpus, score every document's perplexity"
pass (Wenzek et al. 2020) that large-scale training-data pipelines run
between dedup and mixing.  Two phases over one Ray Dataset:

1. **Train**: per-batch (w1, w2, cnt) bigram partials (unigram totals
   ride the same exchange as ``w2=''`` rows, the q77 idiom) combine
   through ONE coarse-bucket :func:`~.distinct.grouped_sum` — the
   documents never shuffle, only vocabulary-sized count rows.
2. **Score**: every in-corpus bigram gets a PINNED integer cost in
   micro-bits, ``ubits = floor(log2((c1 + V) / (c12 + 1)) * 10^6)``
   (add-one-smoothed conditional, V = distinct-token count) — the LUT
   is computed ONCE per distinct bigram, so per-document scores are
   INTEGER sums: order-free, exact, engine-independent.  The only
   float in the whole operator is one ``log2`` per distinct bigram
   (both engines take log2 of the SAME correctly-rounded double; a
   1-ulp libm disagreement flips ``floor`` only within ~1e-10 of an
   integer boundary — negligible, and exact power-of-two ratios are
   exactly representable on both sides).

Scale shape (the measured-choice pattern of stages/dedup.py):

- **broadcast path** (model rows ≤ ``broadcast_max_bigrams``): the
  combined bigram table collects once on the driver, the int64 LUT
  broadcasts via ``ray.put``, and scoring is a SINGLE zero-exchange
  ``map_batches`` pass — a document's bigrams live entirely inside
  its own row, so per-batch groupby(doc) partials are already FINAL.
- **distributed path** (above the cap): the LUT stays a Dataset
  (one slim ``w1`` grouped_sum for the left-context totals + one
  hash_join back), documents explode to slim ``(doc, w1·w2)`` key
  rows that bucket-join the LUT, and ONE data-aware-bucketed
  grouped_sum reassembles per-doc sums.  Text never shuffles; the
  widest exchange carries 3-column int/string rows.

No reference analog (rust-paddle-ocr has no corpus statistics); the
operator exists for the training-data catalog (SURVEY §2.5+).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

#: above this many distinct bigrams the LUT stops broadcasting and the
#: scoring join goes through the bucket exchange (same posture as
#: dedup.broadcast_max_docs: measured-small models ship once, big
#: models stay distributed)
BROADCAST_MAX_BIGRAMS = 2_000_000

#: micro-bits per bit — the integer scale of the pinned LUT
UNIT = 1_000_000

#: separator for the composite (w1, w2) join key in the distributed
#: path; '\x00' never appears in whitespace-split tokens
_SEP = "\x00"


def _bigram_partial(b: pd.DataFrame, text_col: str) -> pd.DataFrame:
    """(w1, w2, cnt) bigram counts for one batch, with corpus unigram
    counts riding as ``w2=''`` rows (q77's exchange-sharing idiom —
    '' is unreachable as a real token under whitespace splitting)."""
    toks = b[text_col].str.lower().str.split()
    e = toks.explode().dropna()
    idx = e.index.to_numpy()
    w = e.to_numpy(dtype=object)
    uni = pd.Series(w).value_counts()
    frames = [pd.DataFrame({
        "w1": uni.index.to_numpy(dtype=object),
        "w2": "",
        "cnt": uni.to_numpy(dtype="int64"),
    })]
    if len(w) > 1:
        same = idx[:-1] == idx[1:]
        if same.any():
            bg = pd.DataFrame({"w1": w[:-1][same], "w2": w[1:][same]})
            g = bg.groupby(["w1", "w2"], sort=False).size()
            gi = g.index.to_frame(index=False)
            gi["cnt"] = g.to_numpy(dtype="int64")
            frames.append(gi)
    return pd.concat(frames, ignore_index=True)


def _lut_ubits(c12: np.ndarray, c1: np.ndarray, v: int) -> np.ndarray:
    """The pinned integer bigram cost: floor(log2((c1+V)/(c12+1))·UNIT).

    Non-negative by construction (c1 ≥ c12 and V ≥ 1 imply the ratio
    is ≥ 1), so floor division semantics agree across engines."""
    num = (c1.astype("int64") + np.int64(v)).astype("float64")
    den = (c12.astype("int64") + np.int64(1)).astype("float64")
    return np.floor(np.log2(num / den) * UNIT).astype("int64")


def _doc_bigrams(b: pd.DataFrame, id_col: str,
                 text_col: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Vectorized (doc_ids, w1, w2) arrays of one batch's consecutive
    same-document token pairs."""
    toks = b[text_col].str.lower().str.split()
    e = toks.explode().dropna()
    idx = e.index.to_numpy()
    w = e.to_numpy(dtype=object)
    if len(w) < 2:
        z = np.empty(0, dtype=object)
        return np.empty(0, dtype="int64"), z, z
    same = idx[:-1] == idx[1:]
    # explode keeps original row labels in idx; map them to positions
    # so the take below is valid for any batch index
    pos = pd.Series(np.arange(len(b)), index=b.index)
    docs = b[id_col].to_numpy()[pos.loc[idx[:-1][same]].to_numpy()]
    return docs, w[:-1][same], w[1:][same]


def bigram_lm_score(docs, id_col: str = "doc_id", text_col: str = "text",
                    broadcast_max_bigrams: int = BROADCAST_MAX_BIGRAMS,
                    num_buckets: int | None = None):
    """Train an add-one-smoothed bigram LM on ``docs[text_col]`` and
    score every document's total/average cost in integer micro-bits.

    Returns a Dataset of ``(id_col, n_bigrams, score_ubits,
    avg_ubits)`` — one row per document with ≥ 1 bigram (sub-2-token
    documents have no perplexity and are dropped, matching the SQL
    join semantics).  ``avg_ubits = score_ubits // n_bigrams``
    (floor division; costs are non-negative so this is plain
    truncation on both engines)."""
    import ray

    from .distinct import grouped_sum
    from .merge import _get_broadcast

    hist = grouped_sum(
        docs.map_batches(lambda b: _bigram_partial(b, text_col),
                         batch_format="pandas"),
        ["w1", "w2"], ["cnt"], num_buckets=8,
    ).materialize()  # train once; V-count, path probe and scoring share it
    v = hist.filter(expr="w2 == ''").count()
    big = hist.filter(expr="w2 != ''")
    n_bigrams = big.count()

    if n_bigrams <= broadcast_max_bigrams:
        # ---- broadcast path: LUT ships once, scoring is zero-exchange
        bdf = big.to_pandas()
        c1 = bdf.groupby("w1")["cnt"].transform("sum").to_numpy()
        lut = pd.Series(
            _lut_ubits(bdf["cnt"].to_numpy(), c1, v),
            index=bdf["w1"].astype(str) + _SEP + bdf["w2"].astype(str),
        )
        ref = ray.put(lut)

        def score(b: pd.DataFrame) -> pd.DataFrame:
            m = _get_broadcast(ref)
            d, w1, w2 = _doc_bigrams(b, id_col, text_col)
            if len(d) == 0:
                return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                                     "n_bigrams": pd.Series([], dtype="int64"),
                                     "score_ubits": pd.Series([], dtype="int64"),
                                     "avg_ubits": pd.Series([], dtype="int64")})
            keys = pd.Series(w1, dtype=str) + _SEP + pd.Series(w2, dtype=str)
            # every scored bigram was trained on this corpus: present by
            # construction (reindex would silently NaN a contract bug)
            ubits = m.loc[keys.to_numpy()].to_numpy(dtype="int64")
            out = (pd.DataFrame({id_col: d, "u": ubits})
                   .groupby(id_col, sort=False)["u"]
                   .agg(n_bigrams="size", score_ubits="sum").reset_index())
            # a document's bigrams all live in its own row, so these
            # per-batch sums are FINAL — no exchange follows
            out["n_bigrams"] = out["n_bigrams"].astype("int64")
            out["score_ubits"] = out["score_ubits"].astype("int64")
            out["avg_ubits"] = out["score_ubits"] // out["n_bigrams"]
            return out

        return docs.map_batches(score, batch_format="pandas")

    # ---- distributed path: LUT stays a Dataset, one bucket join
    from ..sizing import data_aware_buckets
    from .join import hash_join

    c1_ds = grouped_sum(
        big.map_batches(
            lambda b: b[["w1", "cnt"]].rename(columns={"cnt": "c1"}),
            batch_format="pandas"),
        "w1", ["c1"], num_buckets=8)

    def key_big(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "bkey": b["w1"].astype(str) + _SEP + b["w2"].astype(str),
            "w1": b["w1"], "c12": b["cnt"].astype("int64")})

    lut_ds = hash_join(big.map_batches(key_big, batch_format="pandas"),
                       c1_ds, on="w1", rows_hint=2 * n_bigrams)

    def finish_lut(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "bkey": b["bkey"],
            "ubits": _lut_ubits(b["c12"].to_numpy(), b["c1"].to_numpy(), v)})

    lut_ds = lut_ds.map_batches(finish_lut, batch_format="pandas")

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        d, w1, w2 = _doc_bigrams(b, id_col, text_col)
        return pd.DataFrame({
            id_col: pd.Series(d),
            "bkey": pd.Series(w1, dtype=str) + _SEP + pd.Series(w2, dtype=str),
        })

    pairs = docs.map_batches(explode, batch_format="pandas")
    rows_hint = None
    try:
        rows_hint = docs._meta_count()
    except Exception:
        pass
    joined = hash_join(pairs, lut_ds, on="bkey",
                       rows_hint=None if rows_hint is None
                       else 40 * rows_hint + n_bigrams)

    def pre(b: pd.DataFrame) -> pd.DataFrame:
        out = (b.groupby(id_col, sort=False)["ubits"]
               .agg(n_bigrams="size", score_ubits="sum").reset_index())
        out["n_bigrams"] = out["n_bigrams"].astype("int64")
        out["score_ubits"] = out["score_ubits"].astype("int64")
        return out

    sums = grouped_sum(
        joined.map_batches(pre, batch_format="pandas"),
        id_col, ["n_bigrams", "score_ubits"],
        num_buckets=num_buckets
        if num_buckets is not None else data_aware_buckets(rows_hint))

    def fin(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        if str(b[id_col].dtype) == "Int64":
            # hash_join widens keys to the nullable dtype; inner-join
            # output has no NAs, so restore the plain int64 of the
            # broadcast path
            b[id_col] = b[id_col].astype("int64")
        b["avg_ubits"] = b["score_ubits"] // b["n_bigrams"]
        return b

    return sums.map_batches(fin, batch_format="pandas")
