"""Exact per-group discrete quantiles over a distributed column.

Ray Data has no native quantile aggregate, and the exact (non-sketch)
form needs every value of a group visible to one task.  The scale shape
here collapses the corpus FIRST: a per-batch ``(key, value) -> count``
pre-aggregation inside ``map_batches`` reduces each block to its
distinct (key, value) pairs — the only thing that ever shuffles — then
ONE coarse-bucket exchange (``hash(key) % num_buckets``, never the
unbounded key itself) re-aggregates the histogram and walks each key's
sorted value counts with a vectorized cumsum + searchsorted.  At 100 TB
the exchange carries distinct-(key, value) pairs, not rows; for a
bounded-domain value column (lengths, scores, counts) that is orders of
magnitude smaller than the corpus and independent of key skew.

Quantile semantics match DuckDB's ``quantile_disc``: the element at
1-based rank ``max(1, ceil(q*n))`` computed in EXACT RATIONAL
arithmetic — q is a decimal fraction, not a float, so 0.1*10 is
exactly 1 while float math says 1.0000000000000002 (verified against
DuckDB 1.0 on n in {2..13, 120, 124, 125, 5000-ish random}; see
tests/test_quantile.py).  The rank is therefore computed as an integer
ceil-division ``-(-n*num // den)`` from ``Fraction(str(q))``.
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np
import pandas as pd
import pyarrow as pa


def grouped_quantile_disc(ds, key_col: str, val_col: str,
                          quantiles: dict[str, float],
                          num_buckets: int = 64):
    """Per-``key_col`` discrete quantiles of integer ``val_col``.

    Returns a Dataset with ``key_col``, ``n`` (group row count, int64)
    and one int64 column per entry of ``quantiles`` (name -> q).
    """
    q_items = [(name, Fraction(str(q))) for name, q in sorted(quantiles.items())]

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vc = b.groupby([key_col, val_col], sort=False).size()
        out = vc.index.to_frame(index=False)
        out["cnt"] = vc.to_numpy(dtype="int64")
        out["_qb"] = (
            pd.util.hash_pandas_object(out[key_col], index=False).to_numpy()
            % num_buckets
        ).astype("int32")
        return out

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # re-aggregate the partial histograms, then walk each key's
        # sorted histogram once (vectorized over ALL keys in the bucket)
        h = g.groupby([key_col, val_col], sort=True)["cnt"].sum().reset_index()
        keys = h[key_col].to_numpy()
        vals = h[val_col].to_numpy(dtype="int64")
        cnts = h["cnt"].to_numpy(dtype="int64")
        starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
        ends = np.r_[starts[1:], len(keys)]
        csum = np.cumsum(cnts)
        base = np.where(starts > 0, csum[starts - 1], 0)
        totals = csum[ends - 1] - base
        out = {key_col: keys[starts], "n": totals}
        for name, q in q_items:
            num, den = q.numerator, q.denominator
            rank = np.maximum(1, -(-(totals * num) // den)).astype("int64")
            pos = np.searchsorted(csum, base + rank, side="left")
            out[name] = vals[pos]
        return pd.DataFrame(out)

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("_qb")
            .map_groups(per_bucket, batch_format="pandas"))


def grouped_percent_rank(ds, key_col: str, val_col: str,
                         out_col: str = "pct_rank",
                         num_buckets: int = 64,
                         broadcast_max_pairs: int = 2_000_000):
    """Per-group PERCENT_RANK of integer ``val_col``: the window
    ``(rank - 1) / (n - 1)`` with RANK tie semantics (all rows of one
    value share the rank of its first row; single-row groups score 0.0),
    matching DuckDB/ANSI ``PERCENT_RANK() OVER (PARTITION BY key ORDER
    BY val)``.

    Scale shape: the same histogram collapse as
    :func:`grouped_quantile_disc` — the corpus never shuffles; ONE
    coarse-bucket exchange of distinct (key, value) pairs builds a slim
    RANK MAP (key, value, rank, n).  The map is joined back by a
    MEASURED broadcast (materialized + counted first — distinct pairs
    of a bounded-domain value column, orders of magnitude below the
    corpus) with a distributed hash-join fallback above
    ``broadcast_max_pairs``."""
    import ray

    from .join import hash_join
    from .merge import _get_broadcast

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vc = b.groupby([key_col, val_col], sort=False).size()
        out = vc.index.to_frame(index=False)
        out["cnt"] = vc.to_numpy(dtype="int64")
        out["_qb"] = (
            pd.util.hash_pandas_object(out[key_col], index=False).to_numpy()
            % num_buckets
        ).astype("int32")
        return out

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        h = g.groupby([key_col, val_col], sort=True)["cnt"].sum().reset_index()
        keys = h[key_col].to_numpy()
        cnts = h["cnt"].to_numpy(dtype="int64")
        starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
        ends = np.r_[starts[1:], len(keys)]
        csum = np.cumsum(cnts)
        base_per_key = np.where(starts > 0, csum[starts - 1], 0)
        totals = csum[ends - 1] - base_per_key
        grp = np.repeat(np.arange(len(starts)), ends - starts)
        # rank of each distinct value = 1 + rows before it WITHIN its key
        before = np.r_[0, csum[:-1]] - base_per_key[grp]
        # Arrow out: empty exchange partitions of object-dtype pandas
        # blocks break Ray's block-size estimator.
        return pa.Table.from_pydict({
            key_col: keys,
            val_col: h[val_col].to_numpy(dtype="int64"),
            "rank": (before + 1).astype("int64"),
            "n": totals[grp].astype("int64"),
        })

    rank_map = (ds.map_batches(partial, batch_format="pandas")
                .groupby("_qb").map_groups(rank_bucket, batch_format="pandas")
                .materialize())
    n_pairs = rank_map.count()

    def _pct(rank: np.ndarray, n: np.ndarray) -> np.ndarray:
        return np.where(n > 1, (rank - 1) / np.maximum(n - 1, 1), 0.0)

    if n_pairs <= broadcast_max_pairs:
        lut = rank_map.to_pandas()  # slim (key, val, rank, n) frame
        ref = ray.put(lut)

        def apply(b: pd.DataFrame) -> pd.DataFrame:
            m = _get_broadcast(ref)
            # vectorized hash join against the broadcast map (left order
            # preserved; every row hits — the map is complete)
            j = b.merge(m, on=[key_col, val_col], how="left")
            j[out_col] = _pct(j["rank"].to_numpy(dtype="int64"),
                              j["n"].to_numpy(dtype="int64"))
            return j.drop(columns=["rank", "n"])

        return ds.map_batches(apply, batch_format="pandas")

    # distributed fallback: synthesized single join key, slim right side
    in_schema = ds.schema()
    int_cols = [n for n, t in zip(in_schema.names, in_schema.types)
                if "int" in str(t)]

    def add_jk(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["_jk"] = (b[key_col].astype(str) + "|"
                    + b[val_col].astype("int64").astype(str))
        return b

    right = rank_map.map_batches(add_jk, batch_format="pandas").select_columns(
        ["_jk", "rank", "n"])
    joined = hash_join(ds.map_batches(add_jk, batch_format="pandas"), right,
                       on="_jk")

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b[out_col] = _pct(b["rank"].to_numpy(dtype="int64"),
                          b["n"].to_numpy(dtype="int64"))
        b = b.drop(columns=["_jk", "rank", "n"])
        # hash_join emits nullable dtypes (outer-join NA support); an
        # inner join against the complete rank map never produces NAs,
        # so restore the input's plain int dtypes.
        for c in int_cols:
            if c in b.columns:
                b[c] = b[c].astype("int64")
        return b

    return joined.map_batches(finish, batch_format="pandas")


def quantile_band_filter(ds, key_col: str, val_col: str,
                         lo_q: float = 0.05, hi_q: float = 0.95,
                         num_buckets: int = 64,
                         broadcast_max_groups: int = 2_000_000):
    """Per-group outlier trim: keep rows whose ``val_col`` lies within
    the group's ``[quantile(lo_q), quantile(hi_q)]`` band (quantile_disc
    rank semantics, both ends inclusive) — the length/score trimming
    pass a curation pipeline runs before training-data export.

    Scale shape: :func:`grouped_quantile_disc` builds the band map (one
    row per group — the corpus itself never shuffles), then the map is
    joined back by a MEASURED broadcast with a distributed hash-join
    fallback above ``broadcast_max_groups`` groups."""
    import ray

    from .join import hash_join
    from .merge import _get_broadcast

    bands = grouped_quantile_disc(ds, key_col, val_col,
                                  {"_lo": lo_q, "_hi": hi_q},
                                  num_buckets=num_buckets).materialize()
    n_groups = bands.count()

    if n_groups <= broadcast_max_groups:
        lut = bands.select_columns([key_col, "_lo", "_hi"]).to_pandas()
        ref = ray.put(lut)

        def apply(b: pd.DataFrame) -> pd.DataFrame:
            m = _get_broadcast(ref)
            j = b.merge(m, on=key_col, how="left")  # vectorized lookup
            v = j[val_col].to_numpy(dtype="int64")
            lo = j["_lo"].to_numpy(dtype="int64")
            hi = j["_hi"].to_numpy(dtype="int64")
            return b[(v >= lo) & (v <= hi)]

        return ds.map_batches(apply, batch_format="pandas")

    slim = bands.select_columns([key_col, "_lo", "_hi"])
    joined = hash_join(ds, slim, on=key_col)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        v = b[val_col].to_numpy(dtype="int64")
        lo = b["_lo"].to_numpy(dtype="int64")
        hi = b["_hi"].to_numpy(dtype="int64")
        out = b[(v >= lo) & (v <= hi)].drop(columns=["_lo", "_hi"])
        return out

    return joined.map_batches(finish, batch_format="pandas")
