"""Merge stage: recognized spans -> one extracted row per url.

The wide step (SURVEY.md §2.5 A1): ``groupby("url").map_groups`` —
the analog of the reference's per-document region-collect loop
(/root/reference/src/engine.rs:413-437), with the implicit
detection-emission order made explicit via the ``order`` column
(SURVEY.md §2.6) and a per-group sort on it (never global order).

Exact URL dedup (D3, SURVEY.md §2.7) is fused into the same shuffle
(``dedup_mode="at_merge"``): every page VERSION flows through
detect/recognize, and the group keeps the spans of the max-``warc_ts``
version.  This shuffles recognized spans (small) instead of raw html
(huge) — one all-to-all exchange for dedup + merge combined.
Behavior on exact (url, warc_ts) ties is unspecified.

Key choice: ``url`` is high-cardinality, so shuffle skew is bounded by
single-page span counts (capped by ``max_spans_per_page``).
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


def merge_group(g: pd.DataFrame) -> pd.DataFrame:
    """One url group -> one extracted row (reading-order join)."""
    max_ts = g["warc_ts"].max()
    g = g[g["warc_ts"] == max_ts]
    real = g[g["block_id"] >= 0].sort_values("order", kind="stable")
    texts = real["text"][real["text"] != ""]
    joined = "\n".join(texts.tolist())
    conf = float(real.loc[real["text"] != "", "confidence"].mean()) if len(texts) else 0.0
    return pd.DataFrame(
        {
            "url": [g["url"].iloc[0]],
            "warc_ts": [max_ts],
            "lang": [g["lang"].iloc[0]],
            "extracted_text": [joined],
            "n_spans": [len(real)],
            "confidence": [conf],
        }
    )


def merge_extracted(spans_ds):
    """spans Dataset -> extracted Dataset (the A1 + D3 shuffle)."""
    return spans_ds.groupby("url").map_groups(merge_group, batch_format="pandas")
