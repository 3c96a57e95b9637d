"""Deduplication operators for the training-data pipeline (first-class
components alongside the extraction engine; SURVEY.md §2.7 D3 plus the
scale family: exact, MinHash+LSH, SimHash, n-gram Jaccard).

Scale shape of each:

- exact:     hash column in map_batches (vectorized) -> ONE shuffle on
             the hash -> per-group first.  Never shuffles content.
- MinHash:   signatures per batch (stateful actor holds permutation
             params) -> explode to (band, key) rows -> groupby bucket
             -> candidate pairs (bucket size capped -> bounded skew)
             -> Jaccard verify inside the group.  Shuffles only
             (band, key, id, sig) rows, never documents.
- SimHash:   64-bit signature, banded into 4x16-bit keys, Hamming
             verify per bucket.
"""

from __future__ import annotations

import hashlib
import logging
from itertools import combinations

import numpy as np
import pandas as pd

from ..functions.bloom import BlockedBloomFilter, BloomFilter, member_mask
from ..functions.bloom import _base_hash as _bloom_base_hash
from ..functions.hashing import (
    band_keys,
    hamming64,
    jaccard,
    minhash_params,
    minhash_signature,
    simhash64,
    stable_hash64,
    word_shingles,
)
from ..sizing import proportional_pool
from .merge import _get_broadcast

logger = logging.getLogger(__name__)

# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------

def add_md5(ds, col: str, out: str = "content_md5"):
    """Vectorized content-hash column (the dedup key)."""

    def _h(batch: pd.DataFrame) -> pd.DataFrame:
        batch[out] = batch[col].map(lambda s: hashlib.md5(str(s).encode()).hexdigest())
        return batch

    return ds.map_batches(_h, batch_format="pandas")


def exact_dedup(ds, hash_cols: list[str], id_col: str, num_buckets: int = 256):
    """Keep the min-``id_col`` row per hash group (the D3 pattern).

    Scale shape: the shuffle key is a COARSE bucket (hash of the dedup
    key mod ``num_buckets``), never the unbounded-cardinality key itself
    — ``groupby(key).map_groups`` pays ~4.5 ms of Python dispatch per
    unique key, while each bucket task here finishes millions of keys
    with one vectorized sort + drop_duplicates (same pattern as the
    merge shuffle and the q15/q16/q36 catalog queries)."""

    def _bucket(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["_db"] = (
            pd.util.hash_pandas_object(batch[hash_cols], index=False).to_numpy()
            % num_buckets
        ).astype("int32")
        return batch

    def _first(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([*hash_cols, id_col], kind="stable")
        return g.drop_duplicates(hash_cols, keep="first").drop(columns=["_db"])

    return (
        ds.map_batches(_bucket, batch_format="pandas")
        .groupby("_db")
        .map_groups(_first, batch_format="pandas")
    )


# --------------------------------------------------------------------------
# MinHash + LSH near-dup
# --------------------------------------------------------------------------

class MinHasher:
    """Actor-pool stage: permutation params built once per actor (ST2
    pattern); emits one (id, band, key, shingle-count) row per band."""

    def __init__(self, text_col: str, id_col: str, num_perm: int = 128,
                 bands: int = 16, k: int = 3, seed: int = 1):
        self.text_col = text_col
        self.id_col = id_col
        self.bands = bands
        self.k = k
        self.a, self.b = minhash_params(num_perm, seed)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids, bands_out, keys = [], [], []
        for doc_id, text in zip(batch[self.id_col], batch[self.text_col]):
            sh = word_shingles(str(text), self.k)
            sig = minhash_signature(sh, self.a, self.b)
            for bi, bkey in enumerate(band_keys(sig, self.bands)):
                ids.append(doc_id)
                bands_out.append(bi)
                keys.append(bkey)
        return pd.DataFrame({"doc_id": ids, "band": bands_out, "key": keys})


def minhash_candidate_pairs(band_rows, max_bucket: int = 200):
    """groupby (band, key) -> unordered candidate id pairs (deduped later).
    Buckets larger than ``max_bucket`` are dropped (degenerate content):
    each drop is logged on the worker AND emitted as an ``(-1, size)``
    marker row so callers can surface the total recall loss."""

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = sorted(set(g["doc_id"].tolist()))
        if len(ids) < 2:
            return pd.DataFrame({"a": [], "b": []})
        if len(ids) > max_bucket:
            logger.warning(
                "minhash LSH bucket of %d docs exceeds max_bucket=%d — dropped "
                "(degenerate near-identical content); recall reduced for these docs",
                len(ids), max_bucket,
            )
            return pd.DataFrame({"a": [-1], "b": [len(ids)]})  # overflow marker
        a, b = zip(*combinations(ids, 2))
        return pd.DataFrame({"a": list(a), "b": list(b)})

    return band_rows.groupby(["band", "key"]).map_groups(pairs, batch_format="pandas")


#: empty verified-pairs schema (returned when candidate generation finds none)
def _empty_pairs():
    import pyarrow as pa

    import ray.data as rd

    return rd.from_arrow(
        pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                  "jaccard": pa.array([], pa.float64())})
    )


def _pair_jaccard(sa: np.ndarray, sb: np.ndarray) -> float:
    """Exact Jaccard of two packed (unique) shingle arrays."""
    if sa.size == 0 and sb.size == 0:
        return 1.0
    if sa.size == 0 or sb.size == 0:
        return 0.0
    inter = np.intersect1d(sa, sb, assume_unique=True).size
    return inter / (sa.size + sb.size - inter)


def _verify_pairs_broadcast(docs, text_col, id_col, k, threshold, need_ref,
                            pairs_acc):
    """Small-candidate-set verify: shingle only the candidate docs
    (pruned distributed map), broadcast the packed shingles once, and
    verify the distinct pairs in one vectorized map — three fewer
    operators than the bucketed join-back, with a bounded broadcast."""
    import pyarrow as pa

    import ray
    import ray.data as rd

    def pick(batch: pd.DataFrame) -> pd.DataFrame:
        nd = _get_broadcast(need_ref)
        sub = batch[member_mask(nd, batch[id_col])]
        return pd.DataFrame({
            "doc_id": sub[id_col].to_numpy(dtype="int64"),
            "sh": [np.fromiter(word_shingles(str(t), k), dtype=np.uint64).tobytes()
                   for t in sub[text_col]],
        })

    sh_df = docs.map_batches(pick, batch_format="pandas").to_pandas()
    lut_ref = ray.put(dict(zip(sh_df["doc_id"], sh_df["sh"])))

    srt = sorted(pairs_acc)
    pairs_tbl = pa.table({
        "a": pa.array([p[0] for p in srt], pa.int64()),
        "b": pa.array([p[1] for p in srt], pa.int64()),
    })

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        lut = _get_broadcast(lut_ref)
        out_a, out_b, out_j = [], [], []
        for a, b in zip(batch["a"], batch["b"]):
            ra, rb = lut.get(int(a)), lut.get(int(b))
            if ra is None or rb is None:
                continue
            j = _pair_jaccard(np.frombuffer(ra, dtype=np.uint64),
                              np.frombuffer(rb, dtype=np.uint64))
            if j >= threshold:
                out_a.append(int(a))
                out_b.append(int(b))
                out_j.append(j)
        return pd.DataFrame({"a": np.array(out_a, dtype="int64"),
                             "b": np.array(out_b, dtype="int64"),
                             "jaccard": np.array(out_j, dtype="float64")})

    return rd.from_arrow(pairs_tbl).map_batches(verify, batch_format="pandas")


def _distributed_need_bloom(cand, capacity: int,
                            chunk_mb: int = 32) -> tuple[BlockedBloomFilter, int]:
    """Build the candidate-id need-set bloom with NO driver pass over
    candidate pairs (VERDICT r4 item 3).

    Map side: each candidate block emits one uint64 base hash per
    locally-UNIQUE id plus one overflow-count row — slim uint64 rows,
    never pairs.  Reduce side: ONE range exchange on the id's bloom
    block (every probe of a blocked bloom lives in its block, so a
    chunk of contiguous blocks is buildable locally); each reduce task
    ORs its ``chunk_mb``-sized slice of the bitmap.  The driver
    receives exactly the finished ``m/8`` bytes — O(bits) memory AND
    O(bits) driver CPU at any candidate cardinality.

    Returns (bloom, n_overflow_markers).
    """
    proto = BlockedBloomFilter(capacity)
    n_blocks, k = proto.n_blocks, proto.k
    m_bytes = proto.m // 8
    want_chunks = max(1, min(256, m_bytes // max(1, chunk_mb << 20) + 1))
    bpc = -(-n_blocks // want_chunks)  # blocks per chunk (ceil)
    num_chunks = -(-n_blocks // bpc)
    block_b = BlockedBloomFilter.BLOCK_BITS // 8
    chunk_bytes = [
        (min(n_blocks, (c + 1) * bpc) - c * bpc) * block_b for c in range(num_chunks)
    ]

    def part(b: pd.DataFrame) -> pd.DataFrame:
        a = b["a"].to_numpy(dtype="int64")
        bb = b["b"].to_numpy(dtype="int64")
        keep = a >= 0
        n_ov = int(len(a) - keep.sum())
        ids = np.unique(np.concatenate([a[keep], bb[keep]]))
        h = _bloom_base_hash(ids)
        blk = BlockedBloomFilter.block_of_hash(h, n_blocks)
        chunk = (blk // np.uint64(bpc)).astype("int32")
        out = pd.DataFrame({"chunk": chunk, "h": h})
        if n_ov:
            out = pd.concat(
                [out, pd.DataFrame({"chunk": np.int32(-1),
                                    "h": np.array([n_ov], dtype="uint64")})],
                ignore_index=True)
        return out

    def build(g: pd.DataFrame) -> pd.DataFrame:
        c = int(g["chunk"].iloc[0])
        if c < 0:
            return pd.DataFrame({"chunk": np.int32(-1), "n": [0],
                                 "words": [int(g["h"].sum()).to_bytes(8, "little")]})
        h = np.unique(g["h"].to_numpy(dtype="uint64"))
        buf = np.zeros(chunk_bytes[c], dtype=np.uint8)
        base_bit = c * bpc * BlockedBloomFilter.BLOCK_BITS
        idx = BlockedBloomFilter.probes_from_hash(h, n_blocks, k).ravel() - np.uint64(base_bit)
        np.bitwise_or.at(buf, (idx >> 3).astype(np.int64),
                         np.left_shift(np.uint8(1), (idx & np.uint64(7)).astype(np.uint8)))
        return pd.DataFrame({"chunk": np.int32(c), "n": [len(h)],
                             "words": [buf.tobytes()]})

    chunks = (cand.map_batches(part, batch_format="pandas", batch_size=None)
              .groupby("chunk").map_groups(build, batch_format="pandas")
              .take_all())
    bits = np.zeros(m_bytes, dtype=np.uint8)
    n_overflow, n_ids = 0, 0
    for row in chunks:
        c = int(row["chunk"])
        if c < 0:
            n_overflow += int.from_bytes(row["words"], "little")
            continue
        b0 = sum(chunk_bytes[:c])
        bits[b0:b0 + chunk_bytes[c]] = np.frombuffer(row["words"], dtype=np.uint8)
        n_ids += int(row["n"])
    bloom = BlockedBloomFilter(capacity, bits=bits)
    bloom.n_added = n_ids  # upper bound (per-chunk unique), only gates __bool__
    return bloom, n_overflow


def minhash_dedup_pairs(docs, text_col: str, id_col: str, threshold: float = 0.7,
                        num_perm: int = 128, bands: int = 16, k: int = 3,
                        concurrency=None, max_bucket: int = 200,
                        verify_buckets: int = 64,
                        broadcast_max_docs: int = 20_000,
                        max_driver_ids: int | None = None):
    """Full near-dup pipeline -> Dataset of verified pairs
    (a, b, jaccard >= threshold).

    1. signatures per batch (actor pool) -> (band, key) rows; ONE
       groupby emits candidate pairs (bucket-capped -> bounded skew);
    2. the candidate-id set (ints only — never texts) is broadcast as a
       semi-join filter, so only candidate docs are re-shingled.
       **Driver bound** (``max_driver_ids``, default
       ``8 * broadcast_max_docs``): when the candidate-pair count says
       the id set could exceed the cap, the exact set degrades to a
       :class:`~..functions.bloom.BlockedBloomFilter` built FULLY
       DISTRIBUTED (:func:`_distributed_need_bloom` — slim uint64-hash
       exchange range-partitioned on the bloom block, per-chunk OR
       reducers; the driver never scans a candidate pair and receives
       only the finished bitmap: O(bits) memory AND cpu); false
       positives only shingle extra docs whose rows then match no pair
       request in the (fully distributed) join-back;
    3. verify strategy is MEASURED, like every broadcast decision in
       this package: at or under ``broadcast_max_docs`` candidate docs
       (bounded footprint — ~tens of MB of packed shingles) the
       candidates' shingles are collected once, broadcast via
       ``ray.put``, and pairs verify in a single vectorized map; above
       the cap nothing leaves the workers — shingle rows and per-pair
       requests meet in a ``groupby`` on the doc-id bucket (the
       join-back) and pairs reassemble in a second ``groupby`` on the
       pair bucket.  Both paths use ``np.intersect1d`` for exact
       Jaccard, bounded per LSH bucket; both are planted-truth tested
       (the scale path forced via ``broadcast_max_docs=0``).
    """
    import ray

    band_rows = docs.map_batches(
        MinHasher,
        fn_constructor_kwargs={
            "text_col": text_col, "id_col": id_col,
            "num_perm": num_perm, "bands": bands, "k": k,
        },
        batch_format="pandas",
        concurrency=concurrency or proportional_pool(),
    )
    cand = minhash_candidate_pairs(band_rows, max_bucket=max_bucket).materialize()

    # Above max_driver_ids the exact id set degrades to a blocked bloom
    # built FULLY DISTRIBUTED (_distributed_need_bloom: slim uint64-hash
    # exchange, OR'd bitmap chunks — the driver never scans a candidate
    # pair and receives only the finished m/8 bytes).  At or under the
    # cap the candidate count is provably small, so one driver pass
    # collects the exact id set and the distinct pairs for the
    # broadcast-verify fast path.
    if max_driver_ids is None:
        max_driver_ids = max(8 * broadcast_max_docs, 1)
    n_pairs_upper = cand.count()  # includes overflow markers: safe upper bound
    use_bloom = 2 * n_pairs_upper > max_driver_ids
    need: set[int] | BlockedBloomFilter
    pairs_acc: set[tuple[int, int]] | None
    n_overflow = 0
    if use_bloom:
        need, n_overflow = _distributed_need_bloom(cand, 2 * n_pairs_upper)
        pairs_acc = None
    else:
        need, pairs_acc = set(), set()
        max_driver_pairs = max(4 * broadcast_max_docs, 1)
        for b in cand.iter_batches(batch_format="pyarrow"):
            a_np = b["a"].to_numpy()
            b_np = b["b"].to_numpy()
            ov = a_np < 0
            n_overflow += int(ov.sum())
            keep = ~ov
            need.update(a_np[keep].tolist())
            need.update(b_np[keep].tolist())
            if pairs_acc is not None:
                pairs_acc.update(zip(a_np[keep].tolist(), b_np[keep].tolist()))
                if len(pairs_acc) > max_driver_pairs:
                    pairs_acc = None  # too many: stay fully distributed
    if n_overflow:
        logger.warning(
            "minhash_dedup_pairs: %d oversized LSH bucket(s) dropped "
            "(max_bucket=%d) — near-dup recall reduced for their docs",
            n_overflow, max_bucket,
        )
    if not need:
        return _empty_pairs()

    need_ref = ray.put(need)

    if pairs_acc is not None and len(need) <= broadcast_max_docs:
        return _verify_pairs_broadcast(
            docs, text_col, id_col, k, threshold, need_ref, pairs_acc
        )

    K = verify_buckets

    def doc_shingles(batch: pd.DataFrame) -> pd.DataFrame:
        nd = _get_broadcast(need_ref)
        sub = batch[member_mask(nd, batch[id_col])]
        sh = [
            np.fromiter(word_shingles(str(t), k), dtype=np.uint64).tobytes()
            for t in sub[text_col]
        ]
        ids = sub[id_col].to_numpy(dtype="int64")
        return pd.DataFrame({
            "doc_id": ids, "pa": np.int64(-1), "pb": np.int64(-1), "sh": sh,
            "dbucket": (ids % K).astype("int32"),
        })

    def pair_requests(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[batch["a"] >= 0].drop_duplicates(["a", "b"])
        a_np = batch["a"].to_numpy(dtype="int64")
        b_np = batch["b"].to_numpy(dtype="int64")
        doc = np.concatenate([a_np, b_np])
        return pd.DataFrame({
            "doc_id": doc,
            "pa": np.concatenate([a_np, a_np]),
            "pb": np.concatenate([b_np, b_np]),
            "sh": b"",
            "dbucket": (doc % K).astype("int32"),
        })

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        is_sh = g["pa"] < 0
        lut = dict(zip(g.loc[is_sh, "doc_id"], g.loc[is_sh, "sh"]))
        pr = g[~is_sh]
        out = pd.DataFrame({
            "pa": pr["pa"].to_numpy(), "pb": pr["pb"].to_numpy(),
            "doc_id": pr["doc_id"].to_numpy(),
            "sh": pr["doc_id"].map(lut),
        })
        out = out[out["sh"].notna()]
        with np.errstate(over="ignore"):
            out["pbucket"] = (
                (out["pa"].to_numpy() * 1_000_003 + out["pb"].to_numpy()) % K
            ).astype("int32")
        return out

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["pa", "pb", "doc_id"])
        out_a: list[int] = []
        out_b: list[int] = []
        out_j: list[float] = []
        for (a, b), sub in g.groupby(["pa", "pb"], sort=False):
            if len(sub) != 2:
                continue
            sh = {int(d): np.frombuffer(s, dtype=np.uint64)
                  for d, s in zip(sub["doc_id"], sub["sh"])}
            j = _pair_jaccard(sh[int(a)], sh[int(b)])
            if j >= threshold:
                out_a.append(int(a))
                out_b.append(int(b))
                out_j.append(j)
        return pd.DataFrame({"a": np.array(out_a, dtype="int64"),
                             "b": np.array(out_b, dtype="int64"),
                             "jaccard": np.array(out_j, dtype="float64")})

    shingle_rows = docs.map_batches(doc_shingles, batch_format="pandas")
    request_rows = cand.map_batches(pair_requests, batch_format="pandas")
    attached = (
        shingle_rows.union(request_rows)
        .groupby("dbucket")
        .map_groups(attach, batch_format="pandas")
    )
    return attached.groupby("pbucket").map_groups(verify, batch_format="pandas")


# --------------------------------------------------------------------------
# SimHash near-dup
# --------------------------------------------------------------------------

def add_simhash(ds, text_col: str, out: str = "simhash"):
    def _sh(batch: pd.DataFrame) -> pd.DataFrame:
        batch[out] = batch[text_col].map(lambda s: np.uint64(simhash64(str(s))))
        return batch

    return ds.map_batches(_sh, batch_format="pandas")


def simhash_pairs(docs, text_col: str, id_col: str, max_hamming: int = 3,
                  max_bucket: int = 500, dedup_buckets: int = 64):
    """Banded SimHash: 4 x 16-bit keys -> bucket groupby -> Hamming verify.
    Any pair within Hamming distance 3 shares at least one of 4 bands.
    Returns a Dataset of (a, b, hamming); the cross-band pair dedup runs
    distributed (pair-hash bucket groupby), never on the driver."""
    with_sig = add_simhash(docs, text_col)

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        rows = {"doc_id": [], "band": [], "key": [], "sig": []}
        for doc_id, sig in zip(batch[id_col], batch["simhash"]):
            s = int(sig)
            for bi in range(4):
                rows["doc_id"].append(doc_id)
                rows["band"].append(bi)
                rows["key"].append((s >> (16 * bi)) & 0xFFFF)
                rows["sig"].append(np.uint64(s))
        return pd.DataFrame(rows)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        rows = sorted(set(zip(g["doc_id"].tolist(), (int(x) for x in g["sig"]))))
        if len(rows) < 2 or len(rows) > max_bucket:
            return pd.DataFrame({"a": [], "b": [], "hamming": []})
        out = []
        for (ia, sa), (ib, sb) in combinations(rows, 2):
            h = hamming64(sa, sb)
            if h <= max_hamming:
                out.append((ia, ib, h))
        return pd.DataFrame(out, columns=["a", "b", "hamming"])

    def add_pbucket(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            b = b.copy()
            b["pbucket"] = np.array([], dtype="int32")
            return b
        b = b.drop_duplicates(["a", "b"]).copy()
        with np.errstate(over="ignore"):
            b["pbucket"] = (
                (b["a"].to_numpy(dtype="int64") * 1_000_003
                 + b["b"].to_numpy(dtype="int64")) % dedup_buckets
            ).astype("int32")
        return b

    def distinct(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["a", "b"])[["a", "b", "hamming"]]

    cand = with_sig.map_batches(explode, batch_format="pandas")
    res = cand.groupby(["band", "key"]).map_groups(pairs, batch_format="pandas")
    return (
        res.map_batches(add_pbucket, batch_format="pandas")
        .groupby("pbucket")
        .map_groups(distinct, batch_format="pandas")
    )


# --------------------------------------------------------------------------
# n-gram Jaccard within explicit buckets
# --------------------------------------------------------------------------

def ngram_jaccard_pairs(docs, text_col: str, id_col: str, bucket_cols: list[str],
                        threshold: float = 0.5, k: int = 3, max_bucket: int = 200):
    """Exact word-k-gram Jaccard for all pairs inside pre-bucketed groups
    (the quadratic verify, bounded by bucket size)."""

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2 or len(g) > max_bucket:
            return pd.DataFrame({"a": [], "b": [], "jaccard": []})
        items = sorted(zip(g[id_col].tolist(), g[text_col].tolist()))
        sh = [(i, word_shingles(str(t), k)) for i, t in items]
        out = []
        for (ia, sa), (ib, sb) in combinations(sh, 2):
            j = jaccard(sa, sb)
            if j >= threshold:
                out.append((ia, ib, j))
        return pd.DataFrame(out, columns=["a", "b", "jaccard"])

    return docs.groupby(bucket_cols).map_groups(pairs, batch_format="pandas")


# --------------------------------------------------------------------------
# duplicate n-gram coverage (exact-substring-dedup signal)
# --------------------------------------------------------------------------

def duplicate_ngram_stats(docs, text_col: str, id_col: str, k: int = 3,
                          num_buckets: int | None = None,
                          doc_buckets: int = 256,
                          rows_hint: int | None = None):
    """Per-document duplicate n-gram coverage: for every doc, how many
    of its DISTINCT word ``k``-grams also occur in at least one OTHER
    document, and the covered fraction — the per-doc signal exact
    substring deduplication ranks and prunes on (the corpus-level
    "how much of this page is boilerplate shared with other pages"
    measure; pairwise forms of the same shingle machinery feed q17-q19).

    Scale shape (two slim exchanges, documents never shuffle):

    1. per batch: distinct shingle hashes per doc -> (h:uint64,
       doc:int64) rows, bucketed by ``h % num_buckets`` — the only
       corpus-sized stream, 16 bytes/row.
    2. per hash-bucket group: ``np.unique`` doc-count per hash marks
       duplicated grams (a gram's occurrences all share a bucket, so
       the count is complete); reduce to per-(bucket, doc) partials
       (n, n_dup) — at most ``num_buckets`` rows per doc.
    3. per doc-bucket group: sum partials, emit fraction.  A zero
       partial per doc (unioned from a second pruned read) keeps
       shingle-less docs in the output with ``n_grams = 0``.

    Within-doc repeats do NOT count as duplication (grams are distinct
    per doc before the exchange) — matching the SQL twin's
    ``list_distinct`` formulation.
    """
    from ..sizing import data_aware_buckets, estimate_rows

    # The exchanged stream is SHINGLE rows, ~1 per word per doc — inflate
    # the metadata doc count by a nominal grams/doc so the bucket floor
    # tracks the real exchange volume (callers with a better number pass
    # rows_hint).
    est = rows_hint or (lambda e: e * 64 if e else None)(estimate_rows(docs))
    K = num_buckets or data_aware_buckets(est)

    def shingle_rows(b: pd.DataFrame) -> pd.DataFrame:
        hs, rid = [], []
        for i, t in zip(b[id_col].to_numpy(dtype="int64"), b[text_col]):
            sh = word_shingles(str(t), k)
            if sh:
                hs.append(np.fromiter(sh, dtype=np.uint64, count=len(sh)))
                rid.append(np.full(len(hs[-1]), i, dtype=np.int64))
        h = np.concatenate(hs) if hs else np.empty(0, dtype=np.uint64)
        d = np.concatenate(rid) if rid else np.empty(0, dtype=np.int64)
        return pd.DataFrame({
            "h": h, "doc": d, "hb": (h % np.uint64(K)).astype("int32"),
        })

    def bucket_partials(g: pd.DataFrame) -> pd.DataFrame:
        h = g["h"].to_numpy()
        _, inv, cnt = np.unique(h, return_inverse=True, return_counts=True)
        out = pd.DataFrame({"doc": g["doc"].to_numpy(),
                            "isdup": (cnt[inv] > 1).astype("int64")})
        p = (out.groupby("doc", sort=False)
             .agg(n=("isdup", "size"), n_dup=("isdup", "sum")).reset_index())
        p["db"] = (p["doc"].to_numpy() % doc_buckets).astype("int32")
        return p[["doc", "n", "n_dup", "db"]]

    def zero_partials(b: pd.DataFrame) -> pd.DataFrame:
        d = b[id_col].to_numpy(dtype="int64")
        return pd.DataFrame({
            "doc": d,
            "n": np.zeros(len(d), dtype="int64"),
            "n_dup": np.zeros(len(d), dtype="int64"),
            "db": (d % doc_buckets).astype("int32"),
        })

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby("doc", sort=False)[["n", "n_dup"]]
               .sum().reset_index()
               .rename(columns={"doc": id_col, "n": "n_grams"}))
        n = out["n_grams"].to_numpy(dtype="float64")
        out["dup_fraction"] = np.where(
            n > 0, out["n_dup"].to_numpy(dtype="float64") / n, 0.0)
        return out

    partials = (docs.map_batches(shingle_rows, batch_format="pandas")
                .groupby("hb").map_groups(bucket_partials, batch_format="pandas"))
    zeros = docs.map_batches(zero_partials, batch_format="pandas")
    return (partials.union(zeros)
            .groupby("db").map_groups(combine, batch_format="pandas"))
