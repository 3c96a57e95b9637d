"""Sequence-packing bin assignment via a distributed prefix sum.

Training-data pipelines pack documents into fixed-token-budget
sequences (bins) in a deterministic order; the bin of a document is

    bin = (running token total of all EARLIER docs in its partition)
          // bin_size

— a per-partition exclusive prefix sum over an explicit order column.
Ray Data has no window/prefix operator, so this implements the classic
two-pass distributed scan:

1. **Partial pass** (map-side combiner): every batch pre-aggregates
   token counts per (partition, chunk), where ``chunk = order_id //
   chunk_rows`` — derived from the ORDER COLUMN, not from batch
   layout, so it is deterministic under any block split.  The exchange
   then carries one slim row per (partition, chunk), never documents.
2. **Chunk offsets**: the (partition, chunk) totals — bounded by
   rows / chunk_rows (e.g. 10^12 docs / 10^5 = 10^7 rows, ~100 MB) —
   compute each chunk's exclusive prefix on the driver and broadcast
   once via ``ray.put``.
3. **Final pass**: ONE bucket exchange on hash(partition, chunk); each
   task sorts its chunk by the order column, adds the broadcast chunk
   offset to the local cumulative sum, and emits the bin — per-task
   rows bounded by ``chunk_rows`` regardless of partition skew (a
   10^9-doc partition spreads over its chunks, same trick as the
   sliced sessionizer).

Partitioning assumption (documented per the custom-operator recipe):
order ids need not be dense, but chunk balance follows their spread —
pick ``chunk_rows`` near the expected ids-per-chunk.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..sizing import data_aware_buckets, estimate_rows


def assign_pack_bins(docs, id_col: str, part_col: str, tokens_fn,
                     bin_size: int = 2048, chunk_rows: int = 100_000,
                     num_buckets: int | None = None):
    """Assign each row its packing bin (see module docstring).

    ``tokens_fn(batch: pd.DataFrame) -> np.ndarray[int64]`` computes the
    per-row token weight (kept pluggable so callers reuse their token
    counter).  Returns a Dataset of (id_col, part_col, n_toks:int64,
    pack_bin:int64)."""
    import ray

    from .join import _key_bucket
    from .merge import _get_broadcast

    buckets = num_buckets or data_aware_buckets(estimate_rows(docs))

    def slim(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            id_col: b[id_col].to_numpy(dtype="int64"),
            part_col: b[part_col].to_numpy(),
            "n_toks": np.asarray(tokens_fn(b), dtype="int64"),
        })
        out["_chunk"] = out[id_col].to_numpy() // chunk_rows
        return out

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = slim(b)
        return (g.groupby([part_col, "_chunk"], sort=False)["n_toks"]
                .sum().rename("toks").reset_index())

    # slim totals -> exclusive per-partition chunk offsets (driver-side;
    # bounded by rows / chunk_rows)
    parts = list(docs.map_batches(partial, batch_format="pandas")
                 .iter_batches(batch_format="pandas", batch_size=65536))
    totals = (pd.concat(parts, ignore_index=True) if parts
              else pd.DataFrame({part_col: [], "_chunk": [], "toks": []}))
    if len(totals):
        totals = (totals.groupby([part_col, "_chunk"], sort=False)["toks"]
                  .sum().reset_index()
                  .sort_values([part_col, "_chunk"], kind="stable"))
        cum = totals.groupby(part_col, sort=False)["toks"].cumsum().to_numpy()
        offsets = dict(zip(zip(totals[part_col], totals["_chunk"]),
                           (cum - totals["toks"].to_numpy()).astype("int64")))
    else:
        offsets = {}
    ref = ray.put(offsets)

    def bucketize(b: pd.DataFrame) -> pd.DataFrame:
        g = slim(b)
        kb = _key_bucket(g[part_col], 1 << 20).astype("int64")
        g["bucket"] = ((kb * 1_000_003 + g["_chunk"]) % buckets).astype("int32")
        return g

    def per_chunk(g: pd.DataFrame) -> pd.DataFrame:
        off = _get_broadcast(ref)
        g = g.sort_values([part_col, "_chunk", id_col], kind="stable")
        toks = g["n_toks"].to_numpy()
        # exclusive prefix within each (partition, chunk) group
        grp = pd.Series(list(zip(g[part_col], g["_chunk"])))
        cum = (pd.Series(toks).groupby(grp.values, sort=False).cumsum()
               .to_numpy() - toks)
        base = np.fromiter((off.get(k, 0) for k in grp), dtype="int64",
                           count=len(g))
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(),
            part_col: g[part_col].to_numpy(),
            "n_toks": toks,
            "pack_bin": ((base + cum) // bin_size).astype("int64"),
        })

    return (docs.map_batches(bucketize, batch_format="pandas")
            .groupby("bucket").map_groups(per_chunk, batch_format="pandas"))


def _rank_buckets(ds, num_buckets):
    """Power-of-two bucket count for the range-bucketed rank passes:
    explicit value wins; else scale with a metadata row estimate
    (~50k rows/bucket, at least 4, at most 256 — the md5 top byte)."""
    if num_buckets is not None:
        return num_buckets
    rows = estimate_rows(ds)
    if not rows:
        return 256
    want = max(4, min(256, -(-rows // 50_000)))
    return 1 << (want - 1).bit_length()


def global_order_by_hash(ds, id_col: str, num_buckets: int | None = None):
    """Deterministic pseudo-shuffle: assign every row its GLOBAL
    training-order index ``ord`` = rank by ``(md5(id), id)`` — the
    reproducible corpus shuffle a training run needs (same order on
    every engine / rerun, no RNG state to ship).

    Scale shape: the top byte of the md5 is a RANGE partition of the
    hash space, so global rank decomposes into (exclusive prefix of
    bucket counts) + (local rank inside the bucket):

    1. pass 1 aggregates one count per bucket (256 slim rows);
    2. exclusive prefix offsets broadcast once via ``ray.put``;
    3. pass 2 is ONE bucket exchange — each task sorts its own bucket
       by ``(hex, id)`` and adds the offset.

    Per-task rows ≈ N / num_buckets regardless of input layout (md5 is
    uniform), and only ``(id, 32-char hex)`` rows ever ride the
    exchange.  The input is read twice, but both passes touch only the
    pruned id column — at 10^12 rows that is the cheap alternative to
    materializing the keyed corpus between passes.

    Hex-string sort order equals numeric hash order ('0'-'9' < 'a'-'f'
    in ASCII), so bucket-major + local hex sort is exactly the global
    ``ORDER BY md5(id), id``."""
    import ray

    from ..functions.textstats import md5_head32, md5_hex
    from .distinct import grouped_sum
    from .merge import _get_broadcast

    num_buckets = _rank_buckets(ds, num_buckets)
    shift = 32 - (num_buckets - 1).bit_length()  # top bits of head32
    if 1 << (32 - shift) != num_buckets:
        raise ValueError("num_buckets must be a power of two <= 2**32")

    def keyed(b: pd.DataFrame) -> pd.DataFrame:
        h = md5_hex(b[id_col].astype("int64").astype(str))
        return pd.DataFrame({
            id_col: b[id_col].to_numpy(dtype="int64"),
            "_h": h.to_numpy(dtype=object),
            "_bkt": (md5_head32(h) >> shift).astype("int64"),
        })

    keyed_ds = ds.map_batches(keyed, batch_format="pandas")

    def count_partial(b: pd.DataFrame) -> pd.DataFrame:
        vc = b["_bkt"].value_counts()
        return pd.DataFrame({"_bkt": vc.index.to_numpy(dtype="int64"),
                             "n": vc.to_numpy(dtype="int64")})

    counts = (grouped_sum(keyed_ds.map_batches(count_partial,
                                               batch_format="pandas"),
                          "_bkt", ["n"], num_buckets=4)
              .to_pandas().sort_values("_bkt"))
    offs = np.zeros(num_buckets, dtype="int64")
    n = counts["n"].to_numpy(dtype="int64")
    offs[counts["_bkt"].to_numpy(dtype="int64")] = np.cumsum(n) - n
    ref = ray.put(offs)

    def rank(g: pd.DataFrame) -> pd.DataFrame:
        off = _get_broadcast(ref)
        g = g.sort_values(["_h", id_col], kind="mergesort")
        base = off[int(g["_bkt"].iloc[0])]
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(dtype="int64"),
            "ord": base + np.arange(len(g), dtype="int64"),
        })

    return keyed_ds.groupby("_bkt").map_groups(rank, batch_format="pandas")


def interleave_order(ds, id_col: str, part_col: str,
                     num_buckets: int | None = None, scale_bits: int = 20):
    """Proportional source-interleaving order — the data-MIXING
    schedule: every row gets a global training position such that each
    ``part_col`` stratum appears ~proportionally in every prefix (the
    deterministic round-robin curriculum; q67's budget mixing decides
    WHAT to keep, this decides in WHAT ORDER it is consumed).

    Construction (identical on both engines):
      1. within-stratum rank r by (md5(id), id) — the pseudo-shuffle;
      2. interleave key = ((2r+1) << scale_bits) // (2·n_s) — the
         quantized ideal position of item r of n_s (ties broken by
         (stratum, id), so the total order is exact while positions
         quantize to 2^-scale_bits);
      3. global ord = rank by (key, stratum, id).

    Scale shape: TWO range-bucketed rank passes (the
    global_order_by_hash trick) — pass 1 buckets on the md5 top byte
    per stratum (counts table = strata × buckets, vocabulary-sized),
    pass 2 on the key's top bits (uniform by construction); each
    exchange carries only (id, stratum, 32-hex / int key) rows and
    per-task rows stay ≈ N / num_buckets.  int64 bound: r < 2^(63 -
    scale_bits)."""
    import ray

    from ..functions.textstats import md5_head32, md5_hex
    from .distinct import grouped_sum
    from .merge import _get_broadcast

    num_buckets = _rank_buckets(ds, num_buckets)
    shift = 32 - (num_buckets - 1).bit_length()
    if 1 << (32 - shift) != num_buckets:
        raise ValueError("num_buckets must be a power of two <= 2**32")
    scale = 1 << scale_bits

    def keyed(b: pd.DataFrame) -> pd.DataFrame:
        h = md5_hex(b[id_col].astype("int64").astype(str))
        return pd.DataFrame({
            id_col: b[id_col].to_numpy(dtype="int64"),
            part_col: b[part_col].to_numpy(),
            "_h": h.to_numpy(dtype=object),
            "_bkt": (md5_head32(h) >> shift).astype("int64"),
        })

    keyed_ds = ds.map_batches(keyed, batch_format="pandas")

    def count_partial(b: pd.DataFrame) -> pd.DataFrame:
        vc = b.groupby([part_col, "_bkt"], sort=False).size()
        out = vc.index.to_frame(index=False)
        out["n"] = vc.to_numpy(dtype="int64")
        return out

    counts = (grouped_sum(keyed_ds.map_batches(count_partial,
                                               batch_format="pandas"),
                          [part_col, "_bkt"], ["n"], num_buckets=4)
              .to_pandas().sort_values([part_col, "_bkt"], kind="stable"))
    # exclusive prefix WITHIN each stratum + per-stratum totals
    cum = counts.groupby(part_col, sort=False)["n"].cumsum().to_numpy()
    counts["off"] = cum - counts["n"].to_numpy()
    offs = {(p, int(b)): int(o) for p, b, o in
            zip(counts[part_col], counts["_bkt"], counts["off"])}
    totals = counts.groupby(part_col, sort=False)["n"].sum().to_dict()
    ref1 = ray.put((offs, totals))

    def stratum_rank(g: pd.DataFrame) -> pd.DataFrame:
        # one group per md5 bucket; every stratum's slice of the bucket
        # ranks locally against its own (stratum, bucket) offset
        off, tot = _get_broadcast(ref1)
        g = g.sort_values(["_h", id_col], kind="mergesort")
        bkt = int(g["_bkt"].iloc[0])
        parts = []
        for p, sub in g.groupby(part_col, sort=False):
            r = off[(p, bkt)] + np.arange(len(sub), dtype=np.int64)
            n_s = tot[p]
            key = ((2 * r + 1) * scale) // (2 * n_s)
            parts.append(pd.DataFrame({
                id_col: sub[id_col].to_numpy(dtype="int64"),
                part_col: sub[part_col].to_numpy(),
                "_key": key,
                "_kb": (key >> (scale_bits - (32 - shift))).astype("int64"),
            }))
        return pd.concat(parts, ignore_index=True)

    with_keys = (keyed_ds.groupby("_bkt")
                 .map_groups(stratum_rank, batch_format="pandas"))

    def key_counts(b: pd.DataFrame) -> pd.DataFrame:
        vc = b["_kb"].value_counts()
        return pd.DataFrame({"_kb": vc.index.to_numpy(dtype="int64"),
                             "n": vc.to_numpy(dtype="int64")})

    kcounts = (grouped_sum(with_keys.map_batches(key_counts,
                                                 batch_format="pandas"),
                           "_kb", ["n"], num_buckets=4)
               .to_pandas().sort_values("_kb"))
    offs2 = np.zeros(num_buckets, dtype="int64")
    n2 = kcounts["n"].to_numpy(dtype="int64")
    offs2[kcounts["_kb"].to_numpy(dtype="int64")] = np.cumsum(n2) - n2
    ref2 = ray.put(offs2)

    def final_rank(g: pd.DataFrame) -> pd.DataFrame:
        off = _get_broadcast(ref2)
        g = g.sort_values(["_key", part_col, id_col], kind="mergesort")
        base = off[int(g["_kb"].iloc[0])]
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(dtype="int64"),
            part_col: g[part_col].to_numpy(),
            "ord": base + np.arange(len(g), dtype="int64"),
        })

    return with_keys.groupby("_kb").map_groups(final_rank,
                                               batch_format="pandas")
