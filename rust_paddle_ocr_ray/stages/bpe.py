"""Distributed BPE tokenizer training — the "train the tokenizer on
the corpus" pass of an LLM data pipeline, expressed Ray-Data-first.

The classical scalability device makes this tractable at 100 TB: BPE
trains on the WORD HISTOGRAM, not the corpus — so after one streaming
word-count pass (per-batch ``value_counts`` partials → one
vocabulary-sized :func:`~.distinct.grouped_sum`), corpus size never
enters the merge loop again.  Each merge round is one ``map_batches``
pass over the (symbols, count) histogram Dataset:

- per-batch adjacent-pair counts weighted by word count (a Python
  loop, but over VOCABULARY-sized rows — the corpus-sized hot-path
  rule does not apply; the same loop is how reference trainers work);
- the pair partials combine on the driver (pair space is
  vocabulary-sized — the link_rank DRIVER_COMBINE rule: an exchange
  would be pure fixed cost);
- the winning pair (max count, ties to the lexicographically smallest
  (left, right)) broadcasts into the next round's left-greedy apply
  pass, and the re-segmented histogram re-materializes so lineage
  stays one stage deep across rounds.

Pinned rules (shared verbatim with tests/oracle_impl.oracle_bpe_train,
the independent reference that generates the committed q93 goldens):
words = ``text.lower().split()``; initial symbols = characters;
overlapping pair occurrences each count ('aaa' has ('a','a') twice);
apply is a single left-greedy scan ('aaa' + ('a','a') → ['aa', 'a']);
training stops early when no adjacent pair remains.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _count_pairs(b: pd.DataFrame) -> pd.DataFrame:
    acc: dict[tuple[str, str], int] = {}
    for syms, c in zip(b["syms"].to_numpy(), b["cnt"].to_numpy()):
        c = int(c)
        for i in range(len(syms) - 1):
            k = (syms[i], syms[i + 1])
            acc[k] = acc.get(k, 0) + c
    if not acc:
        return pd.DataFrame({"l": pd.Series([], dtype=object),
                             "r": pd.Series([], dtype=object),
                             "n": pd.Series([], dtype="int64")})
    keys = list(acc)
    return pd.DataFrame({"l": [k[0] for k in keys],
                         "r": [k[1] for k in keys],
                         "n": np.fromiter(acc.values(), dtype="int64",
                                          count=len(acc))})


def _apply_merge(syms, left: str, right: str, merged: str):
    res, i, n = [], 0, len(syms)
    while i < n:
        if i < n - 1 and syms[i] == left and syms[i + 1] == right:
            res.append(merged)
            i += 2
        else:
            res.append(syms[i])
            i += 1
    return res


def _train(docs, text_col: str, merges: int):
    """The shared training loop: returns (merge rows, final
    segmentation Dataset of (word, syms, cnt))."""
    from .distinct import grouped_sum

    def wc(b: pd.DataFrame) -> pd.DataFrame:
        vc = (b[text_col].str.lower().str.split()
              .explode().dropna().value_counts())
        return pd.DataFrame({"word": vc.index.to_numpy(dtype=object),
                             "cnt": vc.to_numpy(dtype="int64")})

    hist = grouped_sum(docs.map_batches(wc, batch_format="pandas"),
                       "word", ["cnt"], num_buckets=8)

    def init_syms(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"word": b["word"],
                             "syms": [list(w) for w in b["word"]],
                             "cnt": b["cnt"].astype("int64")})

    seg = hist.map_batches(init_syms, batch_format="pandas").materialize()

    rows: list[tuple[int, str, str, int]] = []
    for rank in range(1, merges + 1):
        p = seg.map_batches(_count_pairs,
                            batch_format="pandas").to_pandas()
        if p.empty:
            break
        comb = (p.groupby(["l", "r"], as_index=False)["n"].sum()
                .sort_values(["n", "l", "r"],
                             ascending=[False, True, True], kind="stable"))
        best = comb.iloc[0]
        left, right, n = str(best["l"]), str(best["r"]), int(best["n"])
        rows.append((rank, left, right, n))
        merged = left + right

        def apply(b: pd.DataFrame, _l=left, _r=right,
                  _m=merged) -> pd.DataFrame:
            return pd.DataFrame({
                "word": b["word"],
                "syms": [_apply_merge(s, _l, _r, _m)
                         for s in b["syms"].to_numpy()],
                "cnt": b["cnt"],
            })

        seg = seg.map_batches(apply, batch_format="pandas").materialize()
    return rows, seg


def bpe_train(docs, text_col: str = "text",
              merges: int = 10) -> pd.DataFrame:
    """Learn ``merges`` BPE merges from ``docs[text_col]``.

    Returns a DataFrame of ``(merge_rank, lhs, rhs, pair_count)``
    rows in learning order (possibly fewer than ``merges`` when the
    histogram runs out of adjacent pairs)."""
    rows, _seg = _train(docs, text_col, merges)
    return pd.DataFrame({
        "merge_rank": pd.Series([r[0] for r in rows], dtype="int64"),
        "lhs": pd.Series([r[1] for r in rows], dtype=object),
        "rhs": pd.Series([r[2] for r in rows], dtype=object),
        "pair_count": pd.Series([r[3] for r in rows], dtype="int64"),
    })


def bpe_encode_counts(docs, id_col: str = "doc_id",
                      text_col: str = "text", merges: int = 10):
    """Train ``merges`` BPE merges, then encode the whole corpus —
    the train→apply tokenizer loop (q94).

    The apply side never touches per-document strings: training
    already segmented every DISTINCT word, so the per-word token
    count is a vocabulary-sized LUT that broadcasts once via
    ``ray.put``; the scoring pass is a single zero-exchange
    ``map_batches`` (explode words → LUT map → per-doc sum — a doc's
    words live in its own row, so per-batch sums are final, the q91
    shape).  Returns a Dataset of ``(id_col, n_words,
    n_bpe_tokens)`` — one row per document, zero counts for
    wordless documents."""
    import ray

    from .merge import _get_broadcast

    _rows, seg = _train(docs, text_col, merges)
    lens = seg.map_batches(
        lambda b: pd.DataFrame({
            "word": b["word"],
            "n": np.fromiter((len(s) for s in b["syms"].to_numpy()),
                             dtype="int64", count=len(b))}),
        batch_format="pandas").to_pandas()
    lut = lens.set_index("word")["n"]
    ref = ray.put(lut)

    def score(b: pd.DataFrame) -> pd.DataFrame:
        m = _get_broadcast(ref)
        toks = b[text_col].str.lower().str.split()
        e = toks.explode().dropna()
        # trained on this corpus: every word is in the LUT
        n_tok = e.map(m).astype("int64").groupby(level=0).sum()
        n_w = e.groupby(level=0).size()
        out = pd.DataFrame({id_col: b[id_col].astype("int64")},
                           index=b.index)
        out["n_words"] = n_w.reindex(b.index, fill_value=0).astype("int64")
        out["n_bpe_tokens"] = n_tok.reindex(b.index,
                                            fill_value=0).astype("int64")
        return out.reset_index(drop=True)

    return docs.map_batches(score, batch_format="pandas")
