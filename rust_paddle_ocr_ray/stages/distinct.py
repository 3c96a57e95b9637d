"""Exact per-group COUNT(DISTINCT value) over a distributed column.

Ray Data's built-in aggregates have no distinct-count; the exact form
needs each distinct (key, value) pair counted exactly once.  Scale
shape (same family as stages/quantile.py): collapse FIRST — a
per-batch ``drop_duplicates(key, value)`` inside ``map_batches``
reduces every block to its distinct pairs, which is the ONLY thing
that ever shuffles.  The exchange buckets on the hash of the PAIR
(not the key), so a hot key's distinct values spread across buckets —
each bucket counts its share of pairs and a final vocabulary-sized
``groupby(key).sum`` combines them.  No single task ever holds one
key's full value set; memory per task is bounded by
|distinct pairs| / num_buckets regardless of key skew.

At 100 TB the exchange carries distinct (key, value) pairs only; for
id-like value columns that is still large but embarrassingly bucketed
— raise ``num_buckets`` with data size (callers can pass a
data-aware count from sizing.data_aware_buckets).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def grouped_sum(ds, key_col: str | list[str], sum_cols: list[str],
                num_buckets: int = 16):
    """Coarse-bucket SUM combine for ALREADY-SLIM partial rows — the
    drop-in for ``groupby(key).aggregate(Sum...)`` when the key space
    is vocabulary-sized.

    Why not Ray's Aggregate: the sort-based reduce pays a fixed merge
    cost per (map block × reduce partition) slice (~25 ms measured);
    with 64 input blocks × 64 reduce partitions that is ~100 s of cpu
    for kilobytes of partials.  One hash-bucket exchange + a vectorized
    pandas sum per bucket measured 6× faster end-to-end (1.7 s vs 10 s,
    sf0.1 event pivot, 32 cpus).

    Partitioning assumption: rows are per-batch PRE-AGGREGATED
    partials, so a bucket holds ≈ |keys|/num_buckets × blocks rows —
    keep ``num_buckets`` small (tasks have fixed overhead) but raise it
    if |keys| grows past a few hundred thousand.  Sum columns must be
    integer-valued or documented exact-in-float64 (pandas sums per
    bucket in row order, Ray Sum in block order — bit-identical only
    when every partial is exact)."""
    return grouped_reduce(ds, key_col, sum_cols, how="sum",
                          num_buckets=num_buckets)


def grouped_reduce(ds, key_col: str | list[str], cols: list[str],
                   how: str | dict = "sum", num_buckets: int = 16):
    """The coarse-bucket combine behind :func:`grouped_sum`, for any
    semigroup pandas reduction — same rationale and partitioning
    assumption.  ``how`` is one reduction name (``sum``/``min``/``max``)
    for all of ``cols``, or a per-column dict (each entry must still be
    a semigroup so partial-of-partials equals the whole)."""
    keys = [key_col] if isinstance(key_col, str) else list(key_col)
    spec = {c: how for c in cols} if isinstance(how, str) else dict(how)

    def combine(b: pd.DataFrame) -> pd.DataFrame:
        return (b.groupby(keys, sort=False)[list(spec)].agg(spec)
                .reset_index())

    def bucketize(b: pd.DataFrame) -> pd.DataFrame:
        g = combine(b)
        g["_sb"] = (
            pd.util.hash_pandas_object(g[keys], index=False).to_numpy()
            % num_buckets
        ).astype("int32")
        return g

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        return pa.Table.from_pandas(combine(g), preserve_index=False)

    return (ds.map_batches(bucketize, batch_format="pandas")
            .groupby("_sb").map_groups(per_bucket, batch_format="pandas"))


def grouped_count_distinct(ds, key_col: str | list[str], val_col: str,
                           out_col: str = "n_distinct",
                           num_buckets: int = 64):
    """COUNT(DISTINCT ``val_col``) GROUP BY ``key_col`` — exact.
    ``key_col`` may be a list for composite grouping keys."""
    keys = [key_col] if isinstance(key_col, str) else list(key_col)
    cols = keys + [val_col]

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        out = b[cols].drop_duplicates()
        out = out.reset_index(drop=True)
        out["_db"] = (
            pd.util.hash_pandas_object(out, index=False).to_numpy()
            % num_buckets
        ).astype("int32")
        return out

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        d = g[cols].drop_duplicates()
        vc = d.groupby(keys, sort=False).size()
        idx = vc.index.to_frame(index=False)
        # Arrow out: empty exchange partitions of object-dtype pandas
        # blocks break Ray's block-size estimator.
        cols_out = {k: idx[k].to_numpy() for k in keys}
        cols_out["_cnt"] = vc.to_numpy(dtype="int64")
        return pa.Table.from_pydict(cols_out)

    slim = (ds.map_batches(partial, batch_format="pandas")
            .groupby("_db").map_groups(per_bucket, batch_format="pandas"))
    out = grouped_sum(slim, keys, ["_cnt"])

    def cast(b: pd.DataFrame) -> pd.DataFrame:
        b[out_col] = b["_cnt"].astype("int64")
        return b.drop(columns=["_cnt"])

    return out.map_batches(cast, batch_format="pandas")


def grouped_corr(ds, key_col: str, x_col: str, y_col: str,
                 out_col: str = "corr", decimals: int = 6):
    """Per-group Pearson correlation of two numeric columns via the
    classic sum-combiner semigroup: each batch contributes
    ``(n, Σx, Σy, Σxy, Σx², Σy²)`` partials, a vocabulary-sized
    ``groupby(key).sum`` merges them, and the closed form
    ``(nΣxy − ΣxΣy) / sqrt((nΣx² − (Σx)²)(nΣy² − (Σy)²))`` finalizes.
    The corpus never shuffles — only 6 doubles per (block, key).

    For integer-valued inputs every partial sum is exact in float64 up
    to 2**53, so the only rounding is the final expression; results are
    rounded to ``decimals`` to be comparable with an independent
    streaming implementation (e.g. DuckDB's one-pass CORR).  A
    zero-variance group yields NaN (SQL NULL).

    Contract note (ADVICE r4): the float64 partials routed through
    ``grouped_sum`` are only ulp-stable when inputs are NOT
    integer-valued — float addition order differs between the pandas
    row-order here and any other engine's block order.  Callers of
    grouped_corr / grouped_zscore on non-integer inputs rely on the
    accepted round-``decimals`` output tolerance to absorb that, which
    is why both finalize with ``np.round`` rather than raw floats."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        x = b[x_col].to_numpy(dtype="float64")
        y = b[y_col].to_numpy(dtype="float64")
        g = pd.DataFrame({key_col: b[key_col], "_n": 1.0, "_sx": x, "_sy": y,
                          "_sxy": x * y, "_sxx": x * x, "_syy": y * y})
        return g.groupby(key_col, sort=False).sum().reset_index()

    agg = grouped_sum(ds.map_batches(partial, batch_format="pandas"),
                      key_col, ["_n", "_sx", "_sy", "_sxy", "_sxx", "_syy"])

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        n = b["_n"].to_numpy()
        sx, sy = b["_sx"].to_numpy(), b["_sy"].to_numpy()
        sxy, sxx, syy = (b["_sxy"].to_numpy(), b["_sxx"].to_numpy(),
                         b["_syy"].to_numpy())
        var = (n * sxx - sx * sx) * (n * syy - sy * sy)
        with np.errstate(invalid="ignore", divide="ignore"):
            r = np.where(var > 0, (n * sxy - sx * sy) / np.sqrt(var), np.nan)
        out = b[[key_col]].copy()
        out[out_col] = np.round(r, decimals)
        out["n"] = n.astype("int64")
        return out

    return agg.map_batches(finalize, batch_format="pandas")


def grouped_mode(ds, key_col: str, val_col: str,
                 out_col: str = "modal_value",
                 num_buckets: int = 64):
    """Deterministic per-group MODE: the most frequent ``val_col``
    value, ties broken by the SMALLEST value (SQL ``mode()`` leaves
    tie-break unspecified, so the twin must spell out the same rule).

    Same histogram-collapse scale shape as grouped_quantile_disc: only
    distinct (key, value, count) partials shuffle, bucketed by key
    hash; the argmax inside each bucket is one sort + first-row-per-key
    — no Python loop."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vc = b.groupby([key_col, val_col], sort=False).size()
        out = vc.index.to_frame(index=False)
        out["cnt"] = vc.to_numpy(dtype="int64")
        out["_mb"] = (
            pd.util.hash_pandas_object(out[key_col], index=False).to_numpy()
            % num_buckets
        ).astype("int32")
        return out

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        h = g.groupby([key_col, val_col], sort=False)["cnt"].sum().reset_index()
        h = h.sort_values([key_col, "cnt", val_col],
                          ascending=[True, False, True], kind="stable")
        top = h.drop_duplicates(key_col, keep="first")
        return pa.Table.from_pydict({
            key_col: top[key_col].to_numpy(),
            out_col: top[val_col].to_numpy(),
            "modal_count": top["cnt"].to_numpy(dtype="int64"),
        })

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("_mb").map_groups(per_bucket, batch_format="pandas"))


def grouped_zscore(ds, key_col: str, val_col: str,
                   out_col: str = "zscore", decimals: int = 6):
    """Per-group z-score normalization of an integer column — the
    feature-scaling pass before mixing quality signals across strata:
    ``(x - mean) / stddev_pop`` within each group.

    Scale shape: the (n, Σx, Σx²) sum-combiner semigroup builds a
    vocabulary-sized moment map (the corpus never shuffles), broadcast
    back via a per-batch vectorized merge.  Integer inputs keep the
    sums exact in float64; the z expression is the only rounding, cut
    to ``decimals`` for cross-engine comparison.  A zero-variance
    group yields NaN (guard the SQL twin the same way).  On
    non-integer inputs the float partials through ``grouped_sum`` are
    only ulp-stable across addition orders — the round-``decimals``
    output tolerance is what absorbs that (see grouped_corr's
    contract note)."""
    import ray

    from .merge import _get_broadcast

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        x = b[val_col].to_numpy(dtype="float64")
        g = pd.DataFrame({key_col: b[key_col], "_n": 1.0, "_sx": x,
                          "_sxx": x * x})
        return g.groupby(key_col, sort=False).sum().reset_index()

    moments = grouped_sum(ds.map_batches(partial, batch_format="pandas"),
                          key_col, ["_n", "_sx", "_sxx"]).to_pandas()
    n = moments["_n"].to_numpy()
    sx = moments["_sx"].to_numpy()
    sxx = moments["_sxx"].to_numpy()
    moments["_mean"] = sx / n
    # (n*Σx² - (Σx)²)/n² keeps the subtraction between EXACT integer
    # sums (vs the cancelling E[x²]-E[x]² float form)
    with np.errstate(invalid="ignore"):
        moments["_std"] = np.sqrt(np.maximum(n * sxx - sx * sx, 0.0)) / n
    lut = moments[[key_col, "_mean", "_std"]]
    ref = ray.put(lut)

    def apply(b: pd.DataFrame) -> pd.DataFrame:
        m = _get_broadcast(ref)
        j = b.merge(m, on=key_col, how="left")
        x = j[val_col].to_numpy(dtype="float64")
        std = j["_std"].to_numpy()
        with np.errstate(invalid="ignore", divide="ignore"):
            z = np.where(std > 0, (x - j["_mean"].to_numpy()) / std, np.nan)
        j[out_col] = np.round(z, decimals)
        return j.drop(columns=["_mean", "_std"])

    return ds.map_batches(apply, batch_format="pandas")
