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
