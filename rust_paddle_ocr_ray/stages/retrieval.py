"""Distributed BM25 lexical retrieval — score every document in the
corpus against a small set of term queries and keep the top-k per
query (Robertson & Zaragoza 2009, the Okapi BM25 weighting).  This is
the lexical half of the decontamination / targeted-curation loop: at
100 TB a pipeline retrieves the corpus documents most similar to a
benchmark prompt (so they can be dropped, audited or up-weighted), and
BM25 is the standard first-stage retriever in front of the embedding
rerank the ANN family (q20/q21/q35) already covers.

Shape — two streaming passes over the documents, zero wide exchange:

1. **Stats pass**: per-batch partials of ``(term, df)`` restricted to
   the query vocabulary, with the corpus totals riding the same
   exchange as sentinel rows (``''`` = doc count, ``'\\x01'`` = token
   count — both unreachable under whitespace splitting, the q77/q91
   idiom).  ONE vocabulary-sized :func:`~.distinct.grouped_sum`
   combines them; the result (|query vocab| + 2 rows) collects on the
   driver.
2. **Score pass**: the per-term ``(query_id, idf)`` table broadcasts
   via ``ray.put``; each batch tokenizes its own documents, counts
   query-vocab term frequencies, scores each (query, doc) pair and
   keeps its LOCAL top-k per query — a correct partial for a global
   top-k under the pinned total order — so the combine moves at most
   ``batches x queries x k`` slim rows.

Integer-exact arithmetic (the catalog's hash-gate discipline): with
the pinned constants ``k1 = 6/5`` and ``b = 3/4``, the tf saturation
term is exactly rational once ``avgdl`` is kept as the pair (T, N)
rather than a rounded quotient::

    tf*(k1+1) / (tf + k1*(1-b) + k1*b*dl*N/T)
      = 22*T*tf / (10*T*tf + 3*T + 9*dl*N)        (all integers)

so each per-term contribution is the floor division

    score_t = idf_ubits * 22*T*tf // (10*T*tf + 3*T + 9*dl*N)

and per-document scores are order-free integer sums.  The only float
is ONE ``log2`` per distinct query term on the driver —
``idf_ubits = floor(log2(1 + (N - df + 0.5)/(df + 0.5)) * 10^6)``,
the Lucene positive-idf form (always > 0, so floor division is plain
truncation on both engines) — the same accepted quantization as
q91's bigram LUT.  Products stay inside int64 whenever
``max_idf * 22 * T * max_tf < 2^63`` (checked per batch against the
measured maxima); above the bound — the honest 100-TB posture, where
T ~ 10^11 — the SAME formula evaluates through exact Python ints over
the matched (doc, term) pairs (vocabulary-bounded per document, never
corpus-shaped).  The DuckDB twin runs the identical expression in
HUGEINT.

Ties are pinned: rank by (score desc, doc_id asc); per-batch local
top-k uses the same order, so partial top-k is exact.

No reference analog (rust-paddle-ocr has no retrieval); the operator
exists for the training-data catalog (SURVEY §2.5+).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

#: micro-bits per bit — the integer idf scale (shared with stages/lm.py)
UNIT = 1_000_000

#: sentinel "terms" carrying the corpus totals through the df exchange
#: ('' and '\x01' are unreachable under whitespace splitting)
_N_DOCS = ""
_SUM_DL = "\x01"

_OUT_COLS = ("query_id", "rank", "doc_id", "score_ubits")


def _empty_out() -> pd.DataFrame:
    return pd.DataFrame({c: pd.Series([], dtype="int64") for c in _OUT_COLS})


def _stats_partial(b: pd.DataFrame, text_col: str, vocab: frozenset)\
        -> pd.DataFrame:
    """One batch's (term, cnt) partial: df over the query vocabulary
    plus the two sentinel total rows."""
    toks = b[text_col].str.lower().str.split()
    lens = toks.map(len, na_action="ignore").fillna(0).astype("int64")
    terms = [_N_DOCS, _SUM_DL]
    cnts = [np.int64(len(b)), lens.to_numpy().sum()]
    e = toks.explode().dropna()
    if len(e):
        m = pd.DataFrame({"pos": e.index, "tok": e.to_numpy(dtype=object)})
        m = m[m["tok"].isin(vocab)]
        if len(m):
            df = m.drop_duplicates().groupby("tok", sort=False).size()
            terms.extend(df.index.to_numpy(dtype=object))
            cnts.extend(df.to_numpy(dtype="int64"))
    return pd.DataFrame({"term": pd.Series(terms, dtype=object),
                         "cnt": pd.Series(cnts, dtype="int64")})


def idf_ubits(n_docs: int, df: int) -> int:
    """The pinned positive idf: floor(log2(1 + (N-df+.5)/(df+.5))·10⁶).

    Lucene's +1 form — strictly positive even at df == N, so every
    downstream floor division runs on non-negative integers and
    truncation == floor on both engines."""
    return math.floor(
        math.log2(1.0 + (n_docs - df + 0.5) / (df + 0.5)) * UNIT)


def _score_batch(b: pd.DataFrame, id_col: str, text_col: str,
                 qtab: pd.DataFrame, vocab: frozenset,
                 n_docs: int, sum_dl: int, k: int) -> pd.DataFrame:
    """Score one batch against every query and keep the LOCAL top-k
    per query under the pinned (score desc, doc_id asc) order."""
    toks = b[text_col].str.lower().str.split()
    dl = toks.map(len, na_action="ignore").fillna(0).astype("int64").to_numpy()
    e = toks.explode().dropna()
    if not len(e):
        return _empty_out()
    pos = pd.Series(np.arange(len(b)), index=b.index)
    m = pd.DataFrame({"p": pos.loc[e.index].to_numpy(),
                      "term": e.to_numpy(dtype=object)})
    m = m[m["term"].isin(vocab)]
    if not len(m):
        return _empty_out()
    tf = (m.groupby(["p", "term"], sort=False).size()
          .rename("tf").reset_index())
    rows = tf.merge(qtab, on="term")  # -> p, term, tf, query_id, idf
    if not len(rows):
        return _empty_out()
    p = rows["p"].to_numpy()
    tfv = rows["tf"].to_numpy(dtype="int64")
    idf = rows["idf"].to_numpy(dtype="int64")
    dlv = dl[p]
    # int64 fast path iff the largest numerator provably fits
    t_i, n_i = int(sum_dl), int(n_docs)
    if int(idf.max()) * 22 * t_i * int(tfv.max()) < (1 << 63) - 1:
        num = idf * (22 * t_i) * tfv
        den = (10 * t_i) * tfv + 3 * t_i + 9 * n_i * dlv
        contrib = num // den
    else:
        # exact Python ints: matched pairs only (vocabulary-bounded
        # per document — never a corpus-sized Python loop)
        contrib = np.fromiter(
            (int(i) * 22 * t_i * int(t) // (10 * t_i * int(t)
                                            + 3 * t_i + 9 * n_i * int(d))
             for i, t, d in zip(idf, tfv, dlv)),
            dtype="int64", count=len(rows))
    sc = (pd.DataFrame({"query_id": rows["query_id"].to_numpy(),
                        "p": p, "s": contrib})
          .groupby(["query_id", "p"], sort=False)["s"].sum().reset_index())
    sc["doc_id"] = b[id_col].to_numpy()[sc["p"].to_numpy()]
    sc = sc.sort_values(["query_id", "s", "doc_id"],
                        ascending=[True, False, True])
    top = sc.groupby("query_id", sort=False).head(k)
    return pd.DataFrame({
        "query_id": top["query_id"].astype("int64").to_numpy(),
        "doc_id": top["doc_id"].astype("int64").to_numpy(),
        "score_ubits": top["s"].astype("int64").to_numpy(),
    })


def bm25_topk(docs, query_terms: dict[int, list[str]],
              id_col: str = "doc_id", text_col: str = "text",
              k: int = 10) -> pd.DataFrame:
    """BM25 top-``k`` documents per query over ``docs[text_col]``.

    ``query_terms`` maps query_id -> its term list (a term appearing
    twice in a query contributes once — BM25's standard bag-of-query
    simplification for short queries; callers pass distinct terms).
    Returns a pandas DataFrame ``(query_id, rank, doc_id,
    score_ubits)`` — only documents sharing >= 1 term with the query
    appear (score 0 rows carry no retrieval signal), ranked by the
    pinned (score desc, doc_id asc) order, rank 1-based."""
    import ray

    from .distinct import grouped_sum
    from .merge import _get_broadcast

    qsets = {int(q): sorted(set(ts)) for q, ts in query_terms.items()}
    vocab = frozenset(t for ts in qsets.values() for t in ts)
    if not vocab:
        return _empty_out()

    stats = grouped_sum(
        docs.map_batches(lambda b: _stats_partial(b, text_col, vocab),
                         batch_format="pandas"),
        "term", ["cnt"], num_buckets=4,
    ).to_pandas()  # |vocab| + 2 rows — vocabulary-sized by construction
    if stats.empty or "term" not in stats.columns:  # zero input blocks
        return _empty_out()
    cnt = dict(zip(stats["term"], stats["cnt"].astype("int64")))
    n_docs = int(cnt.pop(_N_DOCS, 0))
    sum_dl = int(cnt.pop(_SUM_DL, 0))
    if n_docs == 0 or sum_dl == 0:
        return _empty_out()

    qtab = pd.DataFrame(
        [(q, t, idf_ubits(n_docs, int(cnt.get(t, 0))))
         for q, ts in sorted(qsets.items()) for t in ts if cnt.get(t, 0)],
        columns=["query_id", "term", "idf"],
    )
    if not len(qtab):
        return _empty_out()
    ref = ray.put((qtab, vocab))

    def score(b: pd.DataFrame) -> pd.DataFrame:
        qt, vc = _get_broadcast(ref)
        return _score_batch(b, id_col, text_col, qt, vc, n_docs, sum_dl, k)

    cand = docs.map_batches(score, batch_format="pandas").to_pandas()
    # <= batches x queries x k candidate rows — small by construction
    if not len(cand):
        return _empty_out()
    cand = cand.sort_values(["query_id", "score_ubits", "doc_id"],
                            ascending=[True, False, True])
    out = cand.groupby("query_id", sort=False).head(k).reset_index(drop=True)
    out["rank"] = out.groupby("query_id", sort=False).cumcount() + 1
    out = out[list(_OUT_COLS)]
    return out.astype({c: "int64" for c in _OUT_COLS})
