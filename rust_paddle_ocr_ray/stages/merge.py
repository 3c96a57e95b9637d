"""Merge stage: recognized spans -> one extracted row per url.

The wide step (SURVEY.md §2.5 A1): the analog of the reference's
per-document region-collect loop (/root/reference/src/engine.rs:413-437),
with the implicit detection-emission order made explicit via the
``order`` column (SURVEY.md §2.6) and a per-url sort on it (never a
global order assumption).

Scale shape — three deliberate choices, each measured:

* **Column prune before the shuffle**: only the 7 columns the merge
  needs cross the exchange; span geometry (start/end/line/tag/score)
  stays behind (5x less shuffle weight on the smoke corpus).
* **Coarse buckets, not per-url groups**: spans are hashed into
  ``num_buckets`` buckets and the ONE shuffle is ``groupby("bucket")``;
  each bucket task merges *all* its urls with vectorized pandas groupby
  kernels.  ``groupby("url").map_groups`` costs one Python dispatch per
  url (measured 4.5 ms/group); bucketing pays it once per bucket.
* **Arrow in, Arrow out**: the bucket column is appended to the Arrow
  block zero-copy-in (no pandas conversion of the whole block — object
  dtype strings measured 5x slower through the sort), and the final
  operator casts back to the declared ``EXTRACTED_SCHEMA``.

Exact URL dedup (D3, SURVEY.md §2.7) is fused into the same shuffle
(``dedup_mode="at_merge"``): every page VERSION flows through
detect/recognize, and the merge keeps the spans of the max-``warc_ts``
version.  This shuffles recognized spans (small) instead of raw html
(huge) — one all-to-all exchange for dedup + merge combined.
Behavior on exact (url, warc_ts) ties is unspecified.

Bucket hash: ``pandas.util.hash_array`` (SipHash-1-3, fixed key) —
deterministic across processes/nodes, vectorized C.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

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

#: columns that must survive into the merge shuffle
MERGE_COLUMNS = ["url", "warc_ts", "lang", "block_id", "order", "text", "confidence"]

#: default bucket count — bounds merge-task count; raise for very large
#: clusters (tasks per job ~ num_buckets; at 10^12 docs each bucket still
#: streams through vectorized kernels, but more buckets = finer recovery
#: and better balance).  Overridable via ExtractConfig.merge_num_buckets.
DEFAULT_NUM_BUCKETS = 256


def url_bucket(urls, num_buckets: int):
    """Deterministic url -> bucket id (int32 numpy array)."""
    import numpy as np

    h = pd.util.hash_array(np.asarray(urls, dtype=object)) % num_buckets
    return h.astype("int32")


def _with_bucket(batch: pa.Table, num_buckets: int) -> pa.Table:
    buckets = url_bucket(batch["url"].to_numpy(zero_copy_only=False), num_buckets)
    return batch.append_column("bucket", pa.array(buckets, type=pa.int32()))


def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
    """All spans of one bucket (many urls) -> one extracted row per url,
    fully vectorized (identical semantics to the reference's per-doc
    collect loop: keep max-warc_ts version, sort spans by ``order``,
    join non-empty texts with \\n, mean confidence over non-empty)."""
    # D3 dedup: keep only the latest warc_ts version of each url
    max_ts = g.groupby("url")["warc_ts"].transform("max")
    g = g[g["warc_ts"] == max_ts]
    # reading order within each url (A1); stable mergesort keeps emission
    # order for equal keys
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


def _cast_extracted(batch: pa.Table) -> pa.Table:
    return batch.select(EXTRACTED_SCHEMA.names).cast(EXTRACTED_SCHEMA)


def merge_extracted(spans_ds, num_buckets: int = DEFAULT_NUM_BUCKETS):
    """spans Dataset -> extracted Dataset (the A1 + D3 shuffle)."""
    bucketed = spans_ds.select_columns(MERGE_COLUMNS).map_batches(
        _with_bucket,
        fn_kwargs={"num_buckets": num_buckets},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    merged = bucketed.groupby("bucket").map_groups(merge_bucket, batch_format="pandas")
    return merged.map_batches(_cast_extracted, batch_format="pyarrow", zero_copy_batch=True)
