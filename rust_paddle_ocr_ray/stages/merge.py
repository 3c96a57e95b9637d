"""Merge stage: recognized spans -> one extracted row per url.

The wide step (SURVEY.md §2.5 A1): the analog of the reference's
per-document region-collect loop (/root/reference/src/engine.rs:413-437),
with the implicit detection-emission order made explicit via the
``order`` column (SURVEY.md §2.6) and a per-url sort on it (never a
global order assumption).

Scale shape — a two-phase combiner around ONE small shuffle, each
choice measured on a 100k-page / 800k-span corpus:

* **Partial merge before the shuffle** (``partial_merge``): inside the
  same map wave that recognized the spans, every (url, warc_ts) page
  VERSION present in a batch collapses to ONE slim partial row — text
  pre-joined in span order, confidences pre-summed.  800k span rows
  (250 MB) shrink to ~100k partials before any data moves; the
  all-to-all exchange then carries only partials.  (The naive
  ``groupby(url).map_groups`` over raw spans measured 32 s; the plain
  sort alone was 19 s.)
* **Coarse buckets, not per-url groups**: partials hash into
  ``num_buckets`` buckets and the shuffle is ``groupby("bucket")``;
  each bucket task finishes *all* its urls with vectorized pandas
  kernels (``groupby("url").map_groups`` costs one Python dispatch per
  url — measured 4.5 ms/group of pure overhead).
* **Arrow in, Arrow out**: the bucket column is appended to the Arrow
  block (no whole-block pandas conversion — object-dtype strings
  measured 5x slower through the sort), and the final operator casts
  to the declared ``EXTRACTED_SCHEMA``.

Correctness of the split: detection emits a page's spans contiguously
and recognition preserves row order, so one (url, warc_ts) version is
split across at most adjacent batches; each partial carries its
``min_order`` and the final combine concatenates partials in
``min_order`` sequence — byte-identical to joining all spans in span
order.  Exact (url, warc_ts) ties (the same version in two input
files) are unspecified, as in the single-phase formulation.

Exact URL dedup (D3, SURVEY.md §2.7) is fused into the same shuffle
(``dedup_mode="at_merge"``): every page version flows through
detect/recognize, and the final combine keeps the max-``warc_ts``
version.  One exchange for dedup + merge combined.

Bucket hash: ``pandas.util.hash_array`` (SipHash-1-3, fixed key) —
deterministic across processes/nodes, vectorized C.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.bloom import BloomFilter, member_mask

EXTRACTED_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("lang", pa.string()),
        ("extracted_text", pa.string()),
        ("n_spans", pa.int32()),
        ("confidence", pa.float64()),
    ]
)

#: columns the merge needs from the recognized-spans stream
MERGE_COLUMNS = ["url", "warc_ts", "lang", "block_id", "order", "text", "confidence"]

#: default bucket count — bounds merge-task count; raise for very large
#: clusters (tasks per job ~ num_buckets).  Overridable via
#: ExtractConfig.merge_num_buckets.
DEFAULT_NUM_BUCKETS = 256


def url_bucket(urls, num_buckets: int) -> np.ndarray:
    """Deterministic url -> bucket id (int32 numpy array)."""
    h = pd.util.hash_array(np.asarray(urls, dtype=object)) % num_buckets
    return h.astype("int32")


def partial_merge(batch: pd.DataFrame, num_buckets: int = DEFAULT_NUM_BUCKETS,
                  mark_boundary: bool = False) -> pd.DataFrame:
    """Combiner: collapse each (url, warc_ts) version within one batch to
    a single partial row (the map-side pre-aggregation of A1).

    ``mark_boundary=True`` adds a ``boundary`` flag on the partials of
    the batch's FIRST and LAST (url, warc_ts) versions.  Ray Data splits
    large map outputs at ``DataContext.target_max_block_size``, so a
    version's contiguous span run can straddle two blocks; any such
    version necessarily occupies a suffix and/or prefix of its batches,
    i.e. it is the first or last version of every batch it appears in.
    The planned merge path finalizes interior versions with no exchange
    and routes only boundary partials (~2 per batch) through the bucket
    groupby, where split partials recombine correctly."""
    key = ["url", "warc_ts"]
    g = batch.sort_values([*key, "order"], kind="stable")
    first = g.drop_duplicates(key).set_index(key)

    real = g[g["block_id"] >= 0]
    nonempty = real[real["text"] != ""]
    joined = nonempty.groupby(key, sort=False)["text"].agg("\n".join)
    conf_sum = nonempty.groupby(key, sort=False)["confidence"].sum()
    conf_n = nonempty.groupby(key, sort=False).size()
    n_spans = real.groupby(key, sort=False).size()
    min_order = g.groupby(key, sort=False)["order"].min()

    idx = first.index
    out = pd.DataFrame(
        {
            "url": idx.get_level_values(0).to_numpy(),
            "warc_ts": idx.get_level_values(1).to_numpy(),
            "lang": first["lang"].to_numpy(),
            "text": joined.reindex(idx, fill_value="").to_numpy(),
            "n_spans": n_spans.reindex(idx, fill_value=0).to_numpy(dtype="int64"),
            "conf_sum": conf_sum.reindex(idx, fill_value=0.0).to_numpy(dtype="float64"),
            "conf_n": conf_n.reindex(idx, fill_value=0).to_numpy(dtype="int64"),
            "min_order": min_order.reindex(idx, fill_value=-1).to_numpy(dtype="int64"),
        }
    )
    out["bucket"] = url_bucket(out["url"].to_numpy(dtype=object), num_buckets)
    if mark_boundary:
        if len(batch) == 0:
            out["boundary"] = np.array([], dtype=bool)
        else:
            u0, t0 = batch["url"].iloc[0], batch["warc_ts"].iloc[0]
            u1, t1 = batch["url"].iloc[-1], batch["warc_ts"].iloc[-1]
            out["boundary"] = (
                ((out["url"] == u0) & (out["warc_ts"] == t0))
                | ((out["url"] == u1) & (out["warc_ts"] == t1))
            ).to_numpy()
    return out


def final_merge(g: pd.DataFrame) -> pd.DataFrame:
    """Reduce side: all partials of one bucket (many urls) -> one
    extracted row per url, fully vectorized.  Semantics identical to the
    reference's per-doc collect loop: keep max-warc_ts version, join
    texts in span order, confidence = mean over non-empty spans."""
    max_ts = g.groupby("url")["warc_ts"].transform("max")
    g = g[g["warc_ts"] == max_ts]
    g = g.sort_values(["url", "min_order"], kind="stable")

    first = g.drop_duplicates("url").set_index("url")
    nonempty = g[g["text"] != ""]
    joined = nonempty.groupby("url", sort=False)["text"].agg("\n".join)
    n_spans = g.groupby("url", sort=False)["n_spans"].sum()
    conf_sum = g.groupby("url", sort=False)["conf_sum"].sum()
    conf_n = g.groupby("url", sort=False)["conf_n"].sum()

    idx = first.index
    n = conf_n.reindex(idx, fill_value=0).to_numpy(dtype="float64")
    s = conf_sum.reindex(idx, fill_value=0.0).to_numpy(dtype="float64")
    confidence = np.divide(s, n, out=np.zeros_like(s), where=n > 0)
    return pd.DataFrame(
        {
            "url": idx.to_numpy(),
            "warc_ts": first["warc_ts"].to_numpy(),
            "lang": first["lang"].to_numpy(),
            "extracted_text": joined.reindex(idx, fill_value="").to_numpy(),
            "n_spans": n_spans.reindex(idx, fill_value=0).to_numpy(dtype="int32"),
            "confidence": confidence,
        }
    )


def _cast_extracted(batch: pa.Table) -> pa.Table:
    return batch.select(EXTRACTED_SCHEMA.names).cast(EXTRACTED_SCHEMA)


def _with_bucket(batch: pa.Table, num_buckets: int) -> pa.Table:
    buckets = url_bucket(batch["url"].to_numpy(zero_copy_only=False), num_buckets)
    return batch.append_column("bucket", pa.array(buckets, type=pa.int32()))


def merge_bucket_scattered(g: pd.DataFrame) -> pd.DataFrame:
    """Layout-independent merge of one bucket's RAW span rows (no
    combiner): full per-url sort on ``order`` inside the bucket, so a
    version's spans may arrive interleaved across any batches/files.
    Costs a full-span exchange — use :func:`merge_extracted` with
    ``scattered=True`` only when the input layout does not guarantee
    page-contiguous spans (anything produced by this package's detect
    stage does)."""
    max_ts = g.groupby("url")["warc_ts"].transform("max")
    g = g[g["warc_ts"] == max_ts]
    g = g.sort_values(["url", "order"], kind="stable")

    first = g.drop_duplicates("url").set_index("url")
    real = g[g["block_id"] >= 0]
    nonempty = real[real["text"] != ""]
    joined = nonempty.groupby("url", sort=False)["text"].agg("\n".join)
    conf = nonempty.groupby("url", sort=False)["confidence"].mean()
    n_spans = real.groupby("url", sort=False).size()

    idx = first.index
    return pd.DataFrame(
        {
            "url": idx.to_numpy(),
            "warc_ts": first["warc_ts"].to_numpy(),
            "lang": first["lang"].to_numpy(),
            "extracted_text": joined.reindex(idx, fill_value="").to_numpy(),
            "n_spans": n_spans.reindex(idx, fill_value=0).to_numpy(dtype="int32"),
            "confidence": conf.reindex(idx, fill_value=0.0).to_numpy(dtype="float64"),
        }
    )


# ---------------------------------------------------------------------------
# planned dedup: key-only scan -> broadcast dup winners -> shuffle only dups
# ---------------------------------------------------------------------------

#: per-worker-process cache of broadcast objects (ray.get once per worker,
#: not once per task — the broadcast-small-side pattern)
_BCAST_CACHE: dict[str, object] = {}


def _get_broadcast(ref):
    import ray

    key = ref.hex()
    if key not in _BCAST_CACHE:
        _BCAST_CACHE.clear()  # never hold more than one epoch of broadcasts
        _BCAST_CACHE[key] = ray.get(ref)
    return _BCAST_CACHE[key]


def _plan_partial(batch: pd.DataFrame, num_buckets: int) -> pa.Table:
    """Per-batch combiner of the planning scan: url -> (n rows, max ts,
    rows at max ts) — all vectorized.  Returns an ARROW table so the
    exchange carries Arrow blocks (empty pandas object-dtype blocks trip
    Ray's block-size estimator)."""
    df = pd.DataFrame(
        {
            "url": batch["url"].to_numpy(),
            "ts": batch["warc_ts"].to_numpy(dtype="datetime64[us]").astype("int64"),
        }
    )
    gmax = df.groupby("url", sort=False)["ts"].transform("max")
    df["at_max"] = df["ts"].eq(gmax)
    agg = df.groupby("url", sort=False).agg(
        n=("ts", "size"), max_ts=("ts", "max"), n_at_max=("at_max", "sum")
    )
    agg = agg.reset_index()
    agg["bucket"] = url_bucket(agg["url"].to_numpy(dtype=object), num_buckets)
    return pa.Table.from_pandas(agg, preserve_index=False)


def _plan_combine(g: pd.DataFrame) -> pd.DataFrame:
    """Reduce side of the planning scan: emit only urls with >1 version."""
    gmax = g.groupby("url", sort=False)["max_ts"].transform("max")
    n = g.groupby("url", sort=False)["n"].sum()
    max_ts = g.groupby("url", sort=False)["max_ts"].max()
    n_at_max = g[g["max_ts"] == gmax].groupby("url", sort=False)["n_at_max"].sum()
    out = pd.DataFrame({"n": n, "max_ts": max_ts, "n_at_max": n_at_max}).reset_index()
    out = out[out["n"] > 1]
    return pa.Table.from_pandas(out, preserve_index=False)  # Arrow out (see _plan_partial)


def plan_url_dedup(
    keys_ds, num_buckets: int = 64, max_winners: int | None = None,
) -> tuple["dict[str, int] | BloomFilter", frozenset]:
    """Dedup *planning* pass over (url, warc_ts) keys ONLY — a pruned
    columnar scan, never the html.  Returns:

    * ``winners``: {url: winning_warc_ts_us} for urls with >1 input
      version — the page-level filter drops losing versions *before*
      detection (losers never cost parse/decode compute);
    * ``ties``: urls whose winning warc_ts itself appears >1 time —
      only these (normally zero) need the merge shuffle; behavior for
      them matches the single-exchange formulation (tie versions'
      spans concatenate, documented-unspecified).

    **Driver bound** (``max_winners``): when the dup-url count exceeds
    the cap, the exact dict degrades to a fixed-size
    :class:`~..functions.bloom.BloomFilter` of dup urls — O(bits) on the
    driver no matter how duplicated the crawl is.  Callers detect the
    bloom by type: loser versions can no longer be dropped pre-parse
    (no per-url winning ts), so ALL versions of bloom-positive urls
    (dups + ~0.5% false positives) route through the merge exchange,
    where ``final_merge`` keeps the max-ts version — identical output,
    and ``ties`` folds into the same routing (returned empty)."""
    parts = keys_ds.map_batches(
        _plan_partial, fn_kwargs={"num_buckets": num_buckets}, batch_format="pandas"
    )
    dups = parts.groupby("bucket").map_groups(_plan_combine, batch_format="pandas")

    if max_winners is not None:
        dups = dups.materialize()
        n_dups = dups.count()
        if n_dups > max_winners:
            bloom = BloomFilter(n_dups)
            for b in dups.select_columns(["url"]).iter_batches(batch_format="pyarrow"):
                bloom.add_many(b["url"].to_numpy(zero_copy_only=False))
            return bloom, frozenset()

    winners: dict[str, int] = {}
    ties: list[str] = []
    for b in dups.iter_batches(batch_format="pyarrow"):
        urls = b["url"].to_pylist()
        winners.update(zip(urls, b["max_ts"].to_pylist()))
        for u, k in zip(urls, b["n_at_max"].to_pylist()):
            if k > 1:
                ties.append(u)
    return winners, frozenset(ties)


def plan_url_dedup_local(
    paths, max_winners: int | None = None,
) -> tuple["dict[str, int] | BloomFilter", frozenset]:
    """Driver-local fast path of :func:`plan_url_dedup` for parquet
    inputs below ``ExtractConfig.plan_local_max_rows``: a threaded
    columnar scan of the two key columns + one vectorized pandas pass.
    The distributed plan pays ~3 sequential Ray operator waves of fixed
    latency — measured 13 s on 8 MB of keys — which dwarfs planning
    itself until the key set reaches driver-memory scale.

    ``max_winners`` applies the SAME driver bound as the distributed
    plan: above the cap the exact url->winning-ts dict (which would be
    ``ray.put`` at multi-GB size) degrades to a fixed-size
    :class:`~..functions.bloom.BloomFilter` of dup urls and the max-ts
    dedup moves into the merge exchange for bloom-positive urls."""
    import pyarrow.dataset as pds

    tbl = pds.dataset(paths, format="parquet").to_table(columns=["url", "warc_ts"])
    df = pd.DataFrame(
        {
            "url": tbl["url"].to_pandas(),
            "ts": tbl["warc_ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_pandas(),
        }
    )
    gmax = df.groupby("url", sort=False)["ts"].transform("max")
    df["at_max"] = df["ts"].eq(gmax)
    agg = df.groupby("url", sort=False).agg(
        n=("ts", "size"), max_ts=("ts", "max"), n_at_max=("at_max", "sum")
    )
    dups = agg[agg["n"] > 1]
    if max_winners is not None and len(dups) > max_winners:
        bloom = BloomFilter(len(dups))
        bloom.add_many(dups.index.to_numpy(dtype=object))
        return bloom, frozenset()
    winners = dict(zip(dups.index, dups["max_ts"]))
    ties = frozenset(dups.index[dups["n_at_max"] > 1])
    return winners, ties


def make_winner_filter(winners_ref):
    """Pages-level filter: drop losing (url, warc_ts) versions before
    detection.  Broadcast dict read once per worker."""

    def _filter(batch: pa.Table) -> pa.Table:
        dup = _get_broadcast(winners_ref)
        u = pd.Series(batch["url"].to_pandas())
        m = u.isin(dup)
        if not bool(m.any()):
            return batch
        ts = batch["warc_ts"].cast(pa.timestamp("us")).cast(pa.int64()).to_pandas()
        win = u.map(dup)
        keep = (~m) | (ts.to_numpy() == win.fillna(-1).to_numpy(dtype="int64"))
        return batch.filter(pa.array(keep))

    return _filter


def _finalize_partials(batch: pd.DataFrame) -> pd.DataFrame:
    """Complete partial rows (url fully contained in one batch, already
    deduped) -> extracted rows.  Pure column arithmetic, no shuffle."""
    if len(batch) == 0:
        # typed empty (see _plan_combine note)
        return pd.DataFrame({
            "url": pd.Series(dtype="string"),
            "warc_ts": pd.Series(dtype="datetime64[us]"),
            "lang": pd.Series(dtype="string"),
            "extracted_text": pd.Series(dtype="string"),
            "n_spans": pd.Series(dtype="int32"),
            "confidence": pd.Series(dtype="float64"),
        })
    n = batch["conf_n"].to_numpy(dtype="float64")
    s = batch["conf_sum"].to_numpy(dtype="float64")
    confidence = np.divide(s, n, out=np.zeros_like(s), where=n > 0)
    return pd.DataFrame(
        {
            "url": batch["url"].to_numpy(),
            "warc_ts": batch["warc_ts"].to_numpy(),
            "lang": batch["lang"].to_numpy(),
            "extracted_text": batch["text"].to_numpy(),
            "n_spans": batch["n_spans"].to_numpy(dtype="int32"),
            "confidence": confidence,
        }
    )


def merge_extracted(
    spans_ds,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    tie_urls: frozenset | None = None,
    scattered: bool = False,
    splits_possible: bool = True,
):
    """spans Dataset -> extracted Dataset (combiner + the A1/D3 shuffle).

    CONTIGUITY CONTRACT: the combiner fast paths below assume each
    (url, warc_ts) version's spans are CONTIGUOUS within batches with
    ``order`` ascending — guaranteed by this package's detect stage
    (a page's spans are emitted into one block and every downstream
    stage preserves block boundaries).  For span datasets from other
    sources with arbitrary row layout, pass ``scattered=True``: raw
    spans take one full exchange and each url is fully re-sorted on
    ``order`` (layout-independent, slower).

    ``tie_urls=None``: classic single-exchange formulation — ALL
    partials flow through the bucket groupby (``dedup_mode="at_merge"``;
    handles arbitrary duplicate layout with no planning pass).

    ``tie_urls=frozenset``: planned formulation — the caller already
    winner-filtered pages (``make_winner_filter``), so every url has
    exactly one surviving version.

    ``tie_urls=BloomFilter``: bounded-driver planned formulation — the
    filter holds the DUP urls (pages were NOT winner-filtered; see
    ``plan_url_dedup(max_winners=...)``).  Bloom-positive urls (all
    their versions, plus ~0.5% false-positive unique urls) route through
    the bucket exchange where ``final_merge`` performs the max-ts dedup;
    bloom-negative urls are provably unique and stream.  Finalize strategy depends on
    ``splits_possible``:

    * ``splits_possible=False`` — the caller statically guarantees no
      page version straddles a block boundary (the recognizer yields
      page-aligned chunks bounded far below Ray's 1.5x-target slice
      threshold, and ``target_max_block_size`` is large enough that a
      single page can never trip it — see
      ``ExtractPipeline._splits_possible``): every partial is complete,
      finalize is a pure streaming map, NO exchange and NO
      materialization; only ``tie_urls`` (normally empty) take the
      bucket groupby.
    * ``splits_possible=True`` (safe default) — Ray may slice a block
      mid-page (tiny ``target_max_block_size``, or the explicit
      ``skew_split_rows`` page splitter); any split version is the
      first or last version of its batches (see :func:`partial_merge`),
      so the slim partials are materialized once and split two ways:
      interior non-tie partials finalize with NO exchange;
      batch-boundary partials (~2 per batch) plus tie urls route
      through the bucket groupby, where split versions' partials
      recombine in ``min_order`` sequence."""
    if scattered:
        bucketed = spans_ds.select_columns(MERGE_COLUMNS).map_batches(
            _with_bucket, fn_kwargs={"num_buckets": num_buckets},
            batch_format="pyarrow", zero_copy_batch=True,
        )
        merged = bucketed.groupby("bucket").map_groups(
            merge_bucket_scattered, batch_format="pandas"
        )
        return merged.map_batches(_cast_extracted, batch_format="pyarrow",
                                  zero_copy_batch=True)

    if tie_urls is None:
        partials = spans_ds.select_columns(MERGE_COLUMNS).map_batches(
            partial_merge,
            fn_kwargs={"num_buckets": num_buckets},
            batch_format="pandas",
        )
        merged = partials.groupby("bucket").map_groups(final_merge, batch_format="pandas")
        return merged.map_batches(_cast_extracted, batch_format="pyarrow", zero_copy_batch=True)

    import ray

    if not splits_possible:
        # page-aligned blocks guaranteed: every partial is complete
        partials = spans_ds.select_columns(MERGE_COLUMNS).map_batches(
            partial_merge,
            fn_kwargs={"num_buckets": num_buckets},
            batch_format="pandas",
        )
        if not tie_urls:
            return partials.map_batches(
                _finalize_partials, batch_format="pandas"
            ).map_batches(_cast_extracted, batch_format="pyarrow", zero_copy_batch=True)

        tref = ray.put(tie_urls)

        def uniq_only(batch: pd.DataFrame) -> pd.DataFrame:
            return _finalize_partials(
                batch[~member_mask(_get_broadcast(tref), batch["url"])]
            )

        def tie_only(batch: pd.DataFrame) -> pd.DataFrame:
            return batch[member_mask(_get_broadcast(tref), batch["url"])]

        parts = partials.materialize()  # only reached when exact-ts ties exist
        out = parts.map_batches(uniq_only, batch_format="pandas").union(
            parts.map_batches(tie_only, batch_format="pandas")
            .groupby("bucket")
            .map_groups(final_merge, batch_format="pandas")
        )
        return out.map_batches(_cast_extracted, batch_format="pyarrow",
                               zero_copy_batch=True)

    # splits possible: mark batch-boundary versions and route them (plus
    # ties) through the bucket exchange
    partials = spans_ds.select_columns(MERGE_COLUMNS).map_batches(
        partial_merge,
        fn_kwargs={"num_buckets": num_buckets, "mark_boundary": True},
        batch_format="pandas",
    )

    ref = ray.put(tie_urls) if tie_urls else None

    def split_unique(batch: pd.DataFrame) -> pd.DataFrame:
        risky = batch["boundary"].to_numpy(dtype=bool)
        if ref is not None:
            risky = risky | member_mask(_get_broadcast(ref), batch["url"])
        return _finalize_partials(batch[~risky])

    def split_risky(batch: pd.DataFrame) -> pd.DataFrame:
        risky = batch["boundary"].to_numpy(dtype=bool)
        if ref is not None:
            risky = risky | member_mask(_get_broadcast(ref), batch["url"])
        return batch[risky].drop(columns=["boundary"])

    # materialize the SLIM partials once so the two branches below don't
    # re-run detect/recognize (combiner output only — never raw spans)
    parts = partials.materialize()
    uniq = parts.map_batches(split_unique, batch_format="pandas")
    risky = (
        parts.map_batches(split_risky, batch_format="pandas")
        .groupby("bucket")
        .map_groups(final_merge, batch_format="pandas")
    )
    out = uniq.union(risky)
    return out.map_batches(_cast_extracted, batch_format="pyarrow", zero_copy_batch=True)
