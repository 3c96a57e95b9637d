"""Temporal operators Ray Data lacks natively: gap-based sessionization
and as-of join (prompt-mandated custom-operator family; composed from
map_batches + bucket groupby per SURVEY.md §2's "custom operators"
recipe — no raw Ray tasks needed).

Partitioning assumptions (documented per the recipe):

- ``sessionize``: all events of one ``key`` must meet in one group —
  achieved by hashing keys into coarse buckets and ONE
  ``groupby(bucket)`` exchange; inside a bucket everything is
  vectorized pandas (same pattern as stages/merge.py).
- ``asof_join_broadcast``: the RIGHT side (sorted per key) is broadcast
  once via ``ray.put`` and probed with ``np.searchsorted`` per batch —
  zero exchange on the big left side.  Valid while the right side fits
  in worker memory (dimension-table-sized); for a large right side,
  bucket-co-partition both sides and run ``pd.merge_asof`` per bucket
  (same bucket trick as ``sessionize``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .merge import _get_broadcast, url_bucket


def _ts_us(series: pd.Series) -> np.ndarray:
    return series.to_numpy(dtype="datetime64[us]").astype("int64")


# ---------------------------------------------------------------------------
# sessionization (gap-based windows)
# ---------------------------------------------------------------------------

def sessionize(events, key_col: str, ts_col: str, id_col: str,
               gap_us: int, num_buckets: int = 64):
    """Assign each event a per-key session number (1-based): a new
    session starts when the gap to the previous event of the same key
    exceeds ``gap_us``.  Deterministic order: (key, ts, id).

    Returns a Dataset of (id_col, key_col, session_seq:int64).
    """

    def bucketize(b: pd.DataFrame) -> pd.DataFrame:
        b = b[[id_col, key_col, ts_col]].copy()
        b["bucket"] = (b[key_col].to_numpy(dtype="int64") % num_buckets).astype("int32")
        return b

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g["_ts"] = _ts_us(g[ts_col])
        g = g.sort_values([key_col, "_ts", id_col], kind="stable")
        key = g[key_col].to_numpy()
        ts = g["_ts"].to_numpy()
        new_key = np.ones(len(g), dtype=bool)
        new_key[1:] = key[1:] != key[:-1]
        gap = np.ones(len(g), dtype=bool)
        gap[1:] = (ts[1:] - ts[:-1]) > gap_us
        starts = new_key | gap
        seq_global = np.cumsum(starts)
        # per-key restart: subtract the running count just before each key
        first_of_key = np.flatnonzero(new_key)
        base = np.repeat(seq_global[first_of_key] - 1,
                         np.diff(np.append(first_of_key, len(g))))
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(),
                key_col: key,
                "session_seq": (seq_global - base).astype("int64"),
            }
        )

    bucketed = events.map_batches(bucketize, batch_format="pandas")
    return bucketed.groupby("bucket").map_groups(per_bucket, batch_format="pandas")


# ---------------------------------------------------------------------------
# as-of join (broadcast small right side)
# ---------------------------------------------------------------------------

def build_asof_index(right_df: pd.DataFrame, key_col: str, ts_col: str,
                     payload_cols: list[str]) -> dict:
    """Driver-side: sorted per-key arrays for searchsorted probing.
    Ties on (key, ts) keep the row with the greatest last payload sort
    key (deterministic; mirror the SQL twin's arg_max dedup)."""
    df = right_df.copy()
    df["_ts"] = _ts_us(df[ts_col])
    df = df.sort_values([key_col, "_ts", *payload_cols], kind="stable")
    df = df.drop_duplicates([key_col, "_ts"], keep="last")
    index: dict = {}
    for key, g in df.groupby(key_col, sort=False):
        index[int(key)] = (
            g["_ts"].to_numpy(),
            {c: g[c].to_numpy() for c in payload_cols},
        )
    return index


def asof_join_broadcast(left, index_ref, key_col: str, ts_col: str,
                        payload_cols: list[str], out_cols: list[str] | None = None):
    """For each left row, attach the payload of the latest right row of
    the same key with right_ts <= left_ts (NULLs when none).  The right
    index (from :func:`build_asof_index`) is broadcast once."""
    out_cols = out_cols or payload_cols

    def probe(batch: pd.DataFrame) -> pd.DataFrame:
        idx = _get_broadcast(index_ref)
        n = len(batch)
        ts = _ts_us(batch[ts_col])
        keys = batch[key_col].to_numpy(dtype="int64")
        out = {c: np.full(n, np.nan, dtype="float64") for c in payload_cols}
        order = np.argsort(keys, kind="stable")
        sorted_keys = keys[order]
        bounds = np.flatnonzero(np.r_[True, sorted_keys[1:] != sorted_keys[:-1]])
        for bi, start in enumerate(bounds):
            end = bounds[bi + 1] if bi + 1 < len(bounds) else n
            rows = order[start:end]
            entry = idx.get(int(sorted_keys[start]))
            if entry is None:
                continue
            r_ts, payload = entry
            pos = np.searchsorted(r_ts, ts[rows], side="right") - 1
            hit = pos >= 0
            for c in payload_cols:
                out[c][rows[hit]] = payload[c][pos[hit]].astype("float64")
        res = batch.copy()
        for c, oc in zip(payload_cols, out_cols):
            res[oc] = out[c]
        return res

    return left.map_batches(probe, batch_format="pandas")
