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
import pyarrow as pa


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
                  id_col: str, num_buckets: int | None = None,
                  strategy: str = "auto", scan_max_rows: int = 5_000_000):
    """Greedy per-group selection under an integer budget: order each
    group by (``value_col`` desc, ``id_col`` asc) and keep rows while
    the running sum of ``value_col`` stays <= ``budget`` — the
    token-budget corpus-mixing step (take the largest/highest-quality
    documents of each source until its token allowance is spent).

    Integer running sums are order-exact, so the kept set compares
    bit-for-bit with a SQL ``SUM() OVER`` window twin.

    Two equivalent execution shapes (``strategy``):

    - ``"scan"`` — ONE key-bucket exchange of slim (key, id, value)
      rows, vectorized sorted cumsum per bucket.  All rows of one key
      meet in one task (the sessionize contract) — simplest, and the
      cheapest at small scale, but a key owning 10^9 rows pins a task.
    - ``"histogram"`` — the hot-key-bounded form: per-batch
      (key, value)→count partials collapse the corpus to distinct
      pairs; ONE slim exchange derives each key's CUTOFF value and the
      boundary capacity (how many rows of exactly the cutoff value
      still fit); rows above the cutoff are kept by a zero-exchange
      map-side filter, and only the boundary rows (value == cutoff —
      one distinct value per key) take a mini key-bucket exchange to
      pick the smallest ids.  Requires strictly positive values (the
      greedy walk is ill-defined at 0; falls back to scan otherwise).
    - ``"auto"`` — measured choice: histogram above ``scan_max_rows``
      estimated input rows, scan below (the slim-exchange savings beat
      the 2 extra operator latencies only when the corpus is large).
    """
    from ..sizing import data_aware_buckets, estimate_rows

    from .join import _key_bucket

    if strategy == "auto":
        est = estimate_rows(ds)
        strategy = "histogram" if (est is not None and est > scan_max_rows) \
            else "scan"
    if strategy == "histogram":
        return _budget_select_histogram(ds, key_col, value_col, budget,
                                        id_col, num_buckets)

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


def _budget_select_histogram(ds, key_col: str, value_col: str, budget: int,
                             id_col: str, num_buckets: int | None = None,
                             broadcast_max_keys: int = 2_000_000):
    """Hot-key-bounded budget selection (see :func:`budget_select`).

    The cutoff map has one row per key: ``(key, cutoff, n_boundary,
    keep_all)`` where rows with value > cutoff are all kept, exactly
    ``n_boundary`` rows of value == cutoff fit (the scan keeps the
    smallest ids among them — ties on value break by id asc), and
    ``keep_all`` marks keys whose whole group fits the budget."""
    import ray

    from ..sizing import data_aware_buckets, estimate_rows
    from .join import _key_bucket
    from .merge import _get_broadcast

    buckets = num_buckets or data_aware_buckets(estimate_rows(ds))

    def hist_partial(b: pd.DataFrame) -> pd.DataFrame:
        v = b[value_col].to_numpy(dtype="int64")
        if len(v) and v.min() <= 0:
            raise ValueError("budget_select histogram strategy requires "
                             "strictly positive values")
        vc = (pd.DataFrame({key_col: b[key_col], "_v": v})
              .groupby([key_col, "_v"], sort=False).size())
        out = vc.index.to_frame(index=False)
        out["_cnt"] = vc.to_numpy(dtype="int64")
        out["_hb"] = (
            pd.util.hash_pandas_object(out[key_col], index=False).to_numpy()
            % buckets
        ).astype("int32")
        return out

    def cutoffs(g: pd.DataFrame) -> pa.Table:
        h = (g.groupby([key_col, "_v"], sort=False)["_cnt"].sum()
             .reset_index()
             .sort_values([key_col, "_v"], ascending=[True, False],
                          kind="stable"))
        keys = h[key_col].to_numpy()
        vals = h["_v"].to_numpy(dtype="int64")
        cnts = h["_cnt"].to_numpy(dtype="int64")
        starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
        ends = np.r_[starts[1:], len(keys)]
        csum = np.cumsum(vals * cnts)
        base = np.where(starts > 0, csum[starts - 1], 0)
        grp = np.repeat(np.arange(len(starts)), ends - starts)
        prefix = csum - base[grp]             # running total within key
        over = prefix > budget
        # first over-budget distinct value per key (len(key) if none)
        out_k, out_cut, out_nb, out_all = [], [], [], []
        first_over = np.full(len(starts), -1, dtype="int64")
        idx_over = np.flatnonzero(over)
        if len(idx_over):
            # first True per segment: minimum over-index within [s, e)
            seg = grp[idx_over]
            firsts = np.full(len(starts), np.iinfo(np.int64).max)
            np.minimum.at(firsts, seg, idx_over)
            first_over = np.where(firsts == np.iinfo(np.int64).max, -1, firsts)
        for gi, (s, e) in enumerate(zip(starts, ends)):
            fo = first_over[gi]
            if fo < 0:
                out_k.append(keys[s]); out_cut.append(int(vals[e - 1]))
                out_nb.append(int(cnts[e - 1])); out_all.append(True)
            else:
                rem = budget - (int(prefix[fo - 1]) if fo > s else 0)
                out_k.append(keys[s]); out_cut.append(int(vals[fo]))
                out_nb.append(max(0, rem // int(vals[fo])))
                out_all.append(False)
        return pa.table({
            key_col: pa.array(out_k),
            "_cut": pa.array(out_cut, type=pa.int64()),
            "_nb": pa.array(out_nb, type=pa.int64()),
            "_all": pa.array(out_all, type=pa.bool_()),
        })

    cut_map = (ds.map_batches(hist_partial, batch_format="pandas")
               .groupby("_hb").map_groups(cutoffs, batch_format="pandas")
               .materialize())
    n_keys = cut_map.count()

    def slim(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            key_col: b[key_col].to_numpy(),
            id_col: b[id_col].to_numpy(dtype="int64"),
            value_col: b[value_col].to_numpy(dtype="int64"),
        })

    slim_ds = ds.map_batches(slim, batch_format="pandas")

    if n_keys <= broadcast_max_keys:
        ref = ray.put(cut_map.to_pandas())

        def annotate(b: pd.DataFrame) -> pd.DataFrame:
            return b.merge(_get_broadcast(ref), on=key_col, how="left")

        annotated = slim_ds.map_batches(annotate, batch_format="pandas")
    else:
        # key domain too large to broadcast: hash-join the cutoff map
        # back (the grouped_percent_rank fallback pattern)
        from .join import hash_join

        annotated = hash_join(slim_ds, cut_map, on=key_col)

        def fix_dtypes(b: pd.DataFrame) -> pd.DataFrame:
            for c in (id_col, value_col, "_cut", "_nb"):
                b[c] = b[c].astype("int64")
            b["_all"] = b["_all"].astype(bool)
            return b

        annotated = annotated.map_batches(fix_dtypes, batch_format="pandas")

    out_cols = [key_col, id_col, value_col]

    def keep_above(b: pd.DataFrame) -> pd.DataFrame:
        v = b[value_col].to_numpy(dtype="int64")
        keep = b["_all"].to_numpy() | (v > b["_cut"].to_numpy())
        return b.loc[keep, out_cols]

    def boundary_only(b: pd.DataFrame) -> pd.DataFrame:
        v = b[value_col].to_numpy(dtype="int64")
        mask = (~b["_all"].to_numpy()) & (v == b["_cut"].to_numpy()) \
            & (b["_nb"].to_numpy() > 0)
        out = b.loc[mask, out_cols + ["_nb"]].copy()
        out["bucket"] = _key_bucket(out[key_col], buckets)
        return out

    def pick_boundary(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key_col, id_col], kind="stable")
        rank = g.groupby(key_col, sort=False).cumcount().to_numpy()
        keep = g[rank < g["_nb"].to_numpy(dtype="int64")]
        return keep[out_cols]

    kept_above = annotated.map_batches(keep_above, batch_format="pandas")
    kept_boundary = (annotated.map_batches(boundary_only,
                                           batch_format="pandas")
                     .groupby("bucket")
                     .map_groups(pick_boundary, batch_format="pandas"))
    return kept_above.union(kept_boundary)
