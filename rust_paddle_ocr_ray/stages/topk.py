"""Scale-safe per-group top-k (the combiner form).

``groupby(key).map_groups(head)`` (catalog q09) is correct but ships
EVERY row of every group through the exchange and pays Python dispatch
per distinct key.  This stage exploits that top-k is a semigroup: the
top-k of a union is the top-k of the per-part top-ks.  Each batch is
reduced to at most k candidate rows per key it contains (vectorized
sort + groupby-cumcount mask — no per-key Python), so the ONE
coarse-bucket exchange carries O(k * keys_in_batch) rows instead of
the corpus, and skewed groups are bounded by construction: a key with
10^9 rows still contributes <= k rows per input block.

Ordering is (value desc, then ``tie_cols`` asc) — deterministic for
the driver's hash compare.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def grouped_topk(ds, key_cols: list[str], value_col: str, k: int,
                 tie_cols: list[str] | None = None,
                 num_buckets: int = 64, with_rank: str | None = None,
                 ascending: bool = False):
    """Top ``k`` rows per ``key_cols`` group by ``value_col`` desc
    (``ascending=True`` selects the k SMALLEST instead — the
    priority-sample direction; ties broken by ``tie_cols`` asc either
    way).  Optionally emits a 1-based ``with_rank`` int64 column."""
    tie_cols = tie_cols or []
    sort_cols = [*key_cols, value_col, *tie_cols]
    ascending = [True] * len(key_cols) + [ascending] + [True] * len(tie_cols)

    def local_topk(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(sort_cols, ascending=ascending, kind="stable")
        keep = b.groupby(key_cols, sort=False).cumcount() < k
        out = b[keep].copy()
        out["_kb"] = (
            pd.util.hash_pandas_object(out[key_cols], index=False).to_numpy()
            % num_buckets
        ).astype("int32")
        return out

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(sort_cols, ascending=ascending, kind="stable")
        ranks = g.groupby(key_cols, sort=False).cumcount()
        out = g[ranks < k].drop(columns=["_kb"])
        if with_rank is not None:
            out = out.copy()
            out[with_rank] = (ranks[ranks < k] + 1).to_numpy(dtype="int64")
        return out

    return (ds.map_batches(local_topk, batch_format="pandas")
            .groupby("_kb")
            .map_groups(final_topk, batch_format="pandas"))


def budget_select(ds, key_col: str, value_col: str, budget: int,
                  id_col: str, num_buckets: int | None = None):
    """Greedy per-group selection under an integer budget: order each
    group by (``value_col`` desc, ``id_col`` asc) and keep rows while
    the running sum of ``value_col`` stays <= ``budget`` — the
    token-budget corpus-mixing step (take the largest/highest-quality
    documents of each source until its token allowance is spent).

    Integer running sums are order-exact, so the kept set compares
    bit-for-bit with a SQL ``SUM() OVER`` window twin.

    Partitioning assumption (the sessionize contract): all rows of one
    key meet in one bucket task — greedy selection is a sequential
    scan per key.  The exchange ships only (key, id, value); a key's
    share of the stream is bounded by the documents-per-key skew, not
    the corpus."""
    from ..sizing import data_aware_buckets, estimate_rows

    from .join import _key_bucket

    buckets = num_buckets or data_aware_buckets(estimate_rows(ds))

    def bucketize(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            key_col: b[key_col].to_numpy(),
            id_col: b[id_col].to_numpy(dtype="int64"),
            "_v": b[value_col].to_numpy(dtype="int64"),
        })
        out["bucket"] = _key_bucket(out[key_col], buckets)
        return out

    def scan(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, "_v", id_col],
                          ascending=[True, False, True], kind="stable")
        run = g.groupby(key_col, sort=False)["_v"].cumsum()
        keep = g[run.to_numpy() <= budget]
        return pd.DataFrame({
            key_col: keep[key_col].to_numpy(),
            id_col: keep[id_col].to_numpy(),
            value_col: keep["_v"].to_numpy(),
        })

    return (ds.map_batches(bucketize, batch_format="pandas")
            .groupby("bucket").map_groups(scan, batch_format="pandas"))
