"""Mergeable sketches — the brief's "novel sketch" custom-operator
family, built so the DRIVER GATE can check them exactly:

- **Count-min**: counters are SUMS over the stream, so the combined
  sketch is independent of batch order/layout — one vocabulary-sized
  (depth × width) counter table, built from per-batch partials via the
  grouped_sum combine.  Estimates (min over depth rows) OVERCOUNT on
  collisions, never undercount; with an md5-derived hash both engines
  compute bit-identical tables, so the estimates themselves are
  oracle-checkable (catalog q86) — the width is chosen small enough
  that collisions actually happen and the gate proves the sketch
  math, not just the counting.
- **HyperLogLog registers**: each register is a MAX over the stream —
  also order-free and mergeable.  The registers (not the float
  estimate, whose bias-corrected harmonic mean is engine-specific
  arithmetic) are the checked artifact (catalog q87); the estimate is
  a driver-side finalize any consumer can apply.

Scale shape: both sketches reduce every block to a bounded partial
(≤ depth × width rows / ≤ m rows) regardless of input size — this is
the entire point of sketches at 100 TB — and the only exchange is the
coarse-bucket combine of those partials.

Hashing: md5 head-32 (functions/textstats.md5_head32), the same
engine-independent hash the split/sampling operators use; the SQL
twin reproduces it with ``('0x'||substr(md5(x),1,8))::BIGINT``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.textstats import md5_head32, md5_hex
from .distinct import grouped_reduce, grouped_sum


def cms_counters(ds, text_col: str, depth: int = 4, width: int = 256):
    """Count-min counter table over whitespace tokens of ``text_col``
    -> Dataset of (j, h, c): counter row j, cell h, count c.

    Per batch, tokens collapse to their value_counts FIRST, so only
    distinct tokens are hashed (depth × |batch vocab| md5 calls, not
    depth × token occurrences)."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vc = (b[text_col].astype(str).str.lower().str.split()
              .explode().dropna().value_counts())
        if not len(vc):
            return pd.DataFrame({"j": pd.Series([], dtype="int64"),
                                 "h": pd.Series([], dtype="int64"),
                                 "c": pd.Series([], dtype="int64")})
        toks = pd.Series(vc.index.astype(str))
        n = vc.to_numpy(dtype="int64")
        frames = []
        for j in range(depth):
            h = md5_head32(md5_hex(toks + f"#{j}")) % width
            cnt = np.bincount(h, weights=n, minlength=width)
            nz = np.nonzero(cnt)[0]
            frames.append(pd.DataFrame({
                "j": np.int64(j), "h": nz.astype("int64"),
                "c": cnt[nz].astype("int64"),
            }))
        return pd.concat(frames, ignore_index=True)

    return grouped_sum(ds.map_batches(partial, batch_format="pandas"),
                       ["j", "h"], ["c"], num_buckets=4)


def cms_estimate_tokens(ds, text_col: str, depth: int = 4,
                        width: int = 256):
    """Count-min frequency estimate for EVERY distinct token: builds
    the counter table (one pass), broadcasts it (depth × width ints),
    and estimates each distinct token via min over its depth cells.
    Returns a Dataset of (token, est)."""
    import ray

    from .merge import _get_broadcast

    ctab = cms_counters(ds, text_col, depth, width).to_pandas()
    mat = np.zeros((depth, width), dtype=np.int64)
    mat[ctab["j"].to_numpy(dtype="int64"),
        ctab["h"].to_numpy(dtype="int64")] = ctab["c"].to_numpy(dtype="int64")
    ref = ray.put(mat)

    def tok_partial(b: pd.DataFrame) -> pd.DataFrame:
        u = (b[text_col].astype(str).str.lower().str.split()
             .explode().dropna().unique())
        return pd.DataFrame({"token": pd.Series(u, dtype=object),
                             "_one": np.int64(1)})

    distinct = grouped_reduce(
        ds.map_batches(tok_partial, batch_format="pandas"),
        "token", ["_one"], how="max", num_buckets=4)

    def estimate(b: pd.DataFrame) -> pd.DataFrame:
        m = _get_broadcast(ref)
        toks = pd.Series(b["token"].astype(str))
        est = np.full(len(toks), np.iinfo(np.int64).max, dtype=np.int64)
        for j in range(depth):
            h = md5_head32(md5_hex(toks + f"#{j}")) % width
            est = np.minimum(est, m[j, h])
        return pd.DataFrame({"token": b["token"], "est": est})

    return distinct.map_batches(estimate, batch_format="pandas")


def hll_registers(ds, key_col: str, p: int = 6):
    """HyperLogLog register table for COUNT(DISTINCT ``key_col``):
    bucket = md5head32 % 2^p, register = max over the bucket's keys of
    (leading-zero count of the 32−p-bit suffix) + 1.  Returns a
    Dataset of (bucket, register) for OBSERVED buckets (empty buckets
    are register 0 by convention).  The classic estimate is
    ``alpha_m · m² / Σ 2^−M[i]`` over the full m registers — float
    finalize left to the consumer; the registers are the exact,
    mergeable artifact."""
    m = 1 << p
    suffix_bits = 32 - p

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        keys = pd.Series(pd.unique(b[key_col])).astype(str)
        if not len(keys):
            return pd.DataFrame({"bucket": pd.Series([], dtype="int64"),
                                 "register": pd.Series([], dtype="int64")})
        h = md5_head32(md5_hex(keys))
        bucket = h % m
        suffix = h // m
        bl = np.zeros(len(suffix), dtype="int64")
        nz = suffix > 0
        # float64 log2 is exact at powers of two and correctly rounded
        # below them, so floor(log2)+1 == bit_length for < 2^53
        bl[nz] = np.floor(np.log2(suffix[nz])).astype("int64") + 1
        rho = suffix_bits - bl + 1
        g = pd.DataFrame({"bucket": bucket.astype("int64"),
                          "register": rho})
        return g.groupby("bucket", sort=False).max().reset_index()

    return grouped_reduce(ds.map_batches(partial, batch_format="pandas"),
                          "bucket", ["register"], how="max", num_buckets=4)
