"""Joins: native hash-partitioned join + the portable explicit fallback.

``native_join`` wraps ``Dataset.join`` (hash-partitioned on the key;
available in this Ray release).  ``hash_join`` is the version-proof
pattern from the Ray Data playbook: bucket both sides on
``key % num_buckets``, tag, union, ONE ``groupby(bucket)`` shuffle,
pandas-merge inside each group.  Hot keys can be pre-salted by the
caller into finer buckets.

Partitioning assumption (documented per SURVEY.md custom-operator
rule): a single bucket's rows from both sides fit in one task's heap —
pick ``num_buckets`` so (|L| + |R|) / B stays at a few hundred MB.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa


def _key_bucket(values: pd.Series, num_buckets: int) -> np.ndarray:
    """Deterministic key -> bucket for any dtype: integer keys take the
    cheap modulo; everything else goes through ``pd.util.hash_array``
    (SipHash, fixed key — stable across processes/nodes).  Shared by the
    bucket-exchange operators (hash_join, sessionize, bucketed as-of)."""
    if pd.api.types.is_integer_dtype(values):
        return (values.to_numpy(dtype="int64") % num_buckets).astype("int32")
    h = pd.util.hash_array(values.to_numpy(dtype=object)) % num_buckets
    return h.astype("int32")


def _strip_schema_metadata(b: pa.Table) -> pa.Table:
    """Parquet-read schemas carry file metadata (e.g. the b'pandas' blob);
    ``pa.Schema.__hash__`` raises on any metadata dict, which makes Ray's
    hash-shuffle schema dedup log a warning per aggregator.  Metadata is
    meaningless past the read, so drop it before the exchange."""
    return b.replace_schema_metadata(None) if b.schema.metadata else b


def native_join(left, right, on: str, join_type: str = "inner",
                num_partitions: int | None = None,
                rows_per_partition: int = 1_000_000,
                rows_hint: int | None = None,
                right_on: str | None = None):
    """Hash-partitioned ``Dataset.join``.  ``num_partitions=None`` derives
    the partition count from a metadata-only row estimate of both sides:
    every partition is an AGGREGATOR ACTOR, so a small join should not
    pay width actor spawns (measured: a ~750k-row sf0.1 join is 2-3x
    slower with 32 aggregators than with a handful), while a large join
    scales up to the cluster width minus read headroom — asking for more
    actors than cpus starves the upstream read tasks (reproduced hang at
    16 partitions on a 4-cpu session).  When the inputs carry no
    metadata count (post-map lineage), falls back to the width cap.  At
    real scale per-partition rows = total/width can still be large —
    pass an explicit ``num_partitions`` when one partition's reduce
    exceeds a task heap.  ``rows_hint`` lets a caller that renamed /
    mapped its inputs (which drops the metadata count) pass the
    pre-transform estimate instead."""
    from ..sizing import cluster_cpus, estimate_rows

    if num_partitions is None:
        width = max(2, cluster_cpus() - 2)
        rows = rows_hint if rows_hint is not None else estimate_rows(left, right)
        if rows is not None:
            num_partitions = min(width, max(2, -(-rows // rows_per_partition)))
        else:
            num_partitions = width
    left = left.map_batches(_strip_schema_metadata, batch_format="pyarrow",
                            zero_copy_batch=True)
    right = right.map_batches(_strip_schema_metadata, batch_format="pyarrow",
                              zero_copy_batch=True)
    return left.join(right, join_type=join_type, num_partitions=num_partitions,
                     on=(on,),
                     right_on=(right_on,) if right_on is not None else None)


def _nullable_dtype(t) -> str:
    if not isinstance(t, pa.DataType):
        # pandas-backed datasets report numpy dtypes / python classes
        s = str(t)
        if "int" in s:
            return "Int64"
        if "float" in s:
            return "Float64"
        if "datetime" in s:
            return "datetime64[ns]"
        if "bool" in s:
            return "boolean"
        return "object"
    if pa.types.is_integer(t):
        return "Int64"
    if pa.types.is_floating(t):
        return "Float64"
    if pa.types.is_timestamp(t):
        return "datetime64[ns]"
    if pa.types.is_boolean(t):
        return "boolean"
    return "object"


def hash_join(left, right, on: str, num_buckets: int | None = None,
              how: str = "inner", suffix: str = "_r",
              rows_hint: int | None = None):
    """Explicit partitioned hash join of two Datasets on key ``on``
    (integer or string — ``_key_bucket`` hashes any dtype).

    ``how`` additionally accepts ``"anti"`` / ``"semi"`` (left rows
    with no / at least one right match, left columns only — the
    EXISTS/NOT-EXISTS shapes); for those, project the right side to
    its key column first so the exchange ships keys, not payload.

    ``num_buckets=None`` sizes the bucket count from cluster width AND
    (when the inputs carry metadata row counts) a per-bucket row budget,
    so one bucket's heap stays bounded as data grows on a fixed-width
    cluster (sizing.data_aware_buckets)."""
    if num_buckets is None:
        from ..sizing import data_aware_buckets, estimate_rows

        num_buckets = data_aware_buckets(
            rows_hint if rows_hint is not None
            else estimate_rows(left, right))
    l_schema = left.schema()
    r_schema = right.schema()
    l_cols = list(l_schema.names)
    r_cols = list(r_schema.names)
    dtypes: dict[str, str] = {}
    for name, t in zip(l_schema.names, l_schema.types):
        dtypes[name] = _nullable_dtype(t)
    for name, t in zip(r_schema.names, r_schema.types):
        dtypes.setdefault(name, _nullable_dtype(t))
    all_cols = l_cols + [c for c in r_cols if c not in l_cols]

    def tag(side: str, own: list[str]):
        def _t(batch: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame(index=batch.index)
            for c in all_cols:
                if c in own:
                    out[c] = batch[c].astype(dtypes[c])
                else:
                    out[c] = pd.Series([pd.NA] * len(batch), index=batch.index,
                                       dtype=dtypes[c])
            out["__bucket"] = _key_bucket(batch[on], num_buckets)
            out["__side"] = side
            return out

        return _t

    both = left.map_batches(tag("l", l_cols), batch_format="pandas").union(
        right.map_batches(tag("r", r_cols), batch_format="pandas")
    )

    def join_group(g: pd.DataFrame) -> pd.DataFrame:
        lg = g.loc[g["__side"] == "l", l_cols]
        rg = g.loc[g["__side"] == "r", r_cols]
        if how in ("anti", "semi"):
            hit = lg[on].isin(rg[on].unique())
            return lg[~hit] if how == "anti" else lg[hit]
        return lg.merge(rg, on=on, how=how, suffixes=("", suffix))

    return both.groupby("__bucket").map_groups(join_group, batch_format="pandas")


def broadcast_lookup(ds, mapping: dict, key_col: str, out_col: str):
    """Broadcast-small-side join: ``mapping`` (key -> value) is put in the
    object store ONCE and read once per worker process (``_get_broadcast``
    caches the deserialized dict — never re-fetched per batch, never
    re-shipped with the closure); the lookup is a C-speed ``Series.map``
    per batch.  No shuffle."""
    import ray

    from .merge import _get_broadcast

    ref = ray.put(mapping)

    def _lk(batch: pd.DataFrame) -> pd.DataFrame:
        batch[out_col] = batch[key_col].map(_get_broadcast(ref))
        return batch

    return ds.map_batches(_lk, batch_format="pandas")


def measure_hot_keys(left, on: str, *, hot_threshold_rows: int,
                     hot_keys_cap: int = 100_000,
                     mode: str = "exact",
                     sample_rate: float = 0.01,
                     seed: int = 0x5A17) -> set:
    """The salted-join hot-key pre-pass, exposed for direct use/tests.

    ``mode="exact"``: per-batch key-count partials collapse to a slim
    (key, rows) table via :func:`grouped_sum` (one vocabulary-sized
    exchange); keys above ``hot_threshold_rows`` form the hot set.

    ``mode="sample"``: a seeded Bernoulli row sample
    (``Dataset.random_sample(sample_rate, seed)``) feeds the same
    partial+combine, and a key is flagged hot when its SAMPLED count
    exceeds ``p*T - 3*sqrt(p*T)`` (p=sample_rate, T=threshold) — the
    3-sigma lower bound of Binomial(T, p), so a truly-hot key (n >= T)
    is missed with probability ~1e-3 while the bias-toward-inclusion
    only costs a little extra right-side replication (always correct,
    never wrong-answer).  Error bound: a key with true count n has
    sampled count ~ Binomial(n, p), relative sigma sqrt((1-p)/(p*n));
    at the threshold that is sqrt((1-p)/(p*T)) — pick p so p*T >= 100
    (rel. sigma <= 10%).  The scale win over exact mode on a huge fact
    is twofold: the per-batch groupby touches ~p of the rows, and the
    slim exchange carries only keys with >= 1 sampled row — on a
    web-scale key space (urls, hosts) that shrinks the vocabulary-sized
    exchange by orders of magnitude because rare keys vanish from the
    sample.

    Hot keys are few by definition — if more than ``hot_keys_cap``
    qualify the threshold is meaningless and we raise rather than
    silently build a huge driver set."""
    from .distinct import grouped_sum

    if mode == "sample":
        if not 0.0 < sample_rate <= 1.0:
            raise ValueError(f"sample_rate must be in (0, 1], got {sample_rate}")
        pt = sample_rate * hot_threshold_rows
        eff_threshold = max(1.0, pt - 3.0 * math.sqrt(pt))
        src = left.random_sample(sample_rate, seed=seed)
    elif mode == "exact":
        eff_threshold = float(hot_threshold_rows)
        src = left
    else:
        raise ValueError(f"unknown hot-key pre-pass mode {mode!r}")

    def key_counts(b: pd.DataFrame) -> pd.DataFrame:
        vc = b.groupby(on, sort=False).size()
        return pd.DataFrame({on: vc.index.to_numpy(),
                             "_rows": vc.to_numpy(dtype="int64")})

    counts = grouped_sum(
        src.map_batches(key_counts, batch_format="pandas"),
        on, ["_rows"])
    hot = counts.filter(expr=f"_rows > {eff_threshold}")
    hot_rows = hot.take_all()
    if len(hot_rows) > hot_keys_cap:
        raise ValueError(
            f"{len(hot_rows)} keys exceed hot_threshold_rows="
            f"{hot_threshold_rows} (mode={mode}); raise the threshold — a "
            "'hot set' this large would broadcast a huge driver structure")
    return {r[on] for r in hot_rows}


def salted_hash_join(left, right, on: str, salts: int = 8,
                     num_buckets: int | None = None,
                     hot_keys: set | None = None,
                     hot_threshold_rows: int = 1_000_000,
                     hot_keys_cap: int = 100_000,
                     hot_prepass: str = "exact",
                     hot_sample_rate: float = 0.01,
                     hot_sample_seed: int = 0x5A17,
                     rows_hint: int | None = None,
                     _return_tagged: bool = False):
    """Skew-aware INNER hash join: hot join keys are SALTED so one
    key's rows spread across ``salts`` reduce tasks instead of pinning
    one (the classic remedy for a power-law fact key).

    Mechanics: left rows of a hot key take salt = within-batch position
    mod ``salts`` (any assignment is correct for an inner join — the
    output multiset is salt-invariant); right rows of a hot key are
    REPLICATED into every salt so each (key, salt) bucket joins
    complete right-side data; non-hot rows use salt 0 and pay nothing.
    One (key, salt)-bucket exchange, pandas merge per bucket — the
    hash_join contract otherwise.

    ``hot_keys=None`` triggers a pre-pass (:func:`measure_hot_keys`):
    ``hot_prepass="exact"`` (default) counts every left row —
    a second full left scan; ``hot_prepass="sample"`` estimates from a
    seeded Bernoulli row sample at ``hot_sample_rate`` with a 3-sigma
    bias-toward-inclusion threshold (error bound in
    :func:`measure_hot_keys`) — the cheap choice on a huge fact, and
    always CORRECT either way (a missed hot key only loses the salting
    perf benefit; a false positive only replicates a few extra right
    rows)."""
    import ray

    from ..sizing import data_aware_buckets, estimate_rows
    from .merge import _get_broadcast

    buckets = num_buckets or data_aware_buckets(
        rows_hint if rows_hint is not None else estimate_rows(left, right))

    if hot_keys is None:
        hot_keys = measure_hot_keys(
            left, on, hot_threshold_rows=hot_threshold_rows,
            hot_keys_cap=hot_keys_cap, mode=hot_prepass,
            sample_rate=hot_sample_rate, seed=hot_sample_seed)
    ref = ray.put(hot_keys)

    l_schema, r_schema = left.schema(), right.schema()
    l_cols = list(l_schema.names)
    r_cols = list(r_schema.names)

    def _pa_type(t):
        if isinstance(t, pa.DataType):
            return t
        try:
            return pa.from_numpy_dtype(t)
        except (pa.ArrowNotImplementedError, TypeError):
            return pa.string()  # pandas object columns are strings here

    types: dict[str, pa.DataType] = {}
    for n, t in zip(l_schema.names, l_schema.types):
        types[n] = _pa_type(t)
    for n, t in zip(r_schema.names, r_schema.types):
        types.setdefault(n, _pa_type(t))
    all_cols = l_cols + [c for c in r_cols if c not in l_cols]

    def _aligned(df: pd.DataFrame, own: list[str], side: int,
                 salt: np.ndarray, bucket: np.ndarray) -> pa.Table:
        """One unified Arrow schema from both tags: the exchange sorts
        Arrow blocks (pandas object-dtype blocks sort pathologically —
        same lesson as catalog q61), and union partners must agree."""
        cols = {}
        for c in all_cols:
            if c in own:
                cols[c] = pa.array(df[c].to_numpy(), type=types[c],
                                   from_pandas=True)
            else:
                cols[c] = pa.nulls(len(df), type=types[c])
        cols["__side"] = pa.array(np.full(len(df), side, dtype="int8"))
        cols["__bucket"] = pa.array(bucket, type=pa.int32())
        return pa.table(cols)

    def tag_left(b: pd.DataFrame) -> pa.Table:
        hs = _get_broadcast(ref)
        is_hot = b[on].isin(hs).to_numpy() if hs else np.zeros(len(b), bool)
        salt = np.where(is_hot, np.arange(len(b)) % salts, 0).astype("int64")
        kb = _key_bucket(b[on], buckets).astype("int64")
        return _aligned(b, l_cols, 0, salt,
                        (kb * salts + salt).astype("int32"))

    def tag_right(b: pd.DataFrame) -> pa.Table:
        hs = _get_broadcast(ref)
        is_hot = b[on].isin(hs).to_numpy() if hs else np.zeros(len(b), bool)
        cold = b[~is_hot]
        parts = [cold] + [b[is_hot]] * salts
        out = pd.concat(parts, ignore_index=True)
        salt = np.concatenate(
            [np.zeros(len(cold), dtype="int64")]
            + [np.full(int(is_hot.sum()), s, dtype="int64")
               for s in range(salts)])
        kb = _key_bucket(out[on], buckets).astype("int64")
        return _aligned(out, r_cols, 1, salt,
                        (kb * salts + salt).astype("int32"))

    both = left.map_batches(tag_left, batch_format="pandas").union(
        right.map_batches(tag_right, batch_format="pandas"))
    if _return_tagged:  # test seam: inspect the salted exchange input
        return both

    def join_group(g: pd.DataFrame) -> "pa.Table":
        import pyarrow as pa

        lg = g.loc[g["__side"] == 0, l_cols]
        rg = g.loc[g["__side"] == 1, r_cols]
        m = lg.merge(rg, on=on, how="inner", suffixes=("", "_r"))
        # Arrow out: pandas object-dtype blocks make the downstream
        # sort-based Aggregate pathological (same fix as catalog q61)
        return pa.Table.from_pandas(m, preserve_index=False)

    return both.groupby("__bucket").map_groups(join_group,
                                               batch_format="pandas")
