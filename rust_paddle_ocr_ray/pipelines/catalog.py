"""The query catalog: every operator/pipeline exposed to the driver
(`__ray_entry__.py: queries()/oracle_sql()`), one entry per SURVEY.md §2
line plus the training-data operator family.

Each Ray implementation has a DuckDB-SQL twin with IDENTICAL column
names and integer-safe arithmetic wherever the driver's value-hash
compares them; genuinely non-SQL operators (the extraction pipeline,
MinHash/SimHash, LSH ANN) carry ``None`` SQL and get the driver's
rows-only check — their rigor comes from the committed goldens and
unit tests instead.

Column-name discipline: every computed/aggregate column is aliased the
SAME on both sides (driver hashes sort columns by name).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data as rd
from ray.data.aggregate import Count, Max, Min, Sum

from ..config import CLI_CONFIG
from ..functions.textstats import (
    JA_RANGE,
    STOPWORDS,
    ZH_RANGE,
    langid_frame,
    md5_head32,
    md5_hex,
    quality_frame,
    rolling_fingerprint,
)
from ..sizing import estimate_rows
from ..sources.synth import pages_from_documents
from ..stages.cluster import connected_components
from ..stages.dedup import minhash_dedup_pairs, ngram_jaccard_pairs, simhash_pairs
from ..stages.join import broadcast_lookup, native_join
from ..stages.multimodal import featurize_media, frame_sample
from ..stages.similarity import embedding_dup_pairs, knn_bruteforce, knn_ivf, knn_lsh


def _t(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def _rp(sf_dir: str, name: str, columns: list[str] | None = None):
    """Pruned parquet read.  (An extra metadata-strip map here measured
    +0.4-0.5 s of fixed operator latency per query without removing the
    read-op schema-hash log line, so joins strip metadata themselves —
    stages/join.native_join — and plain reads stay one operator.)"""
    return rd.read_parquet(_t(sf_dir, name), columns=columns)


# ===========================================================================
# relational core (engine breadth: filter/project/agg/sort/join/distinct)
# ===========================================================================

def q01_filter_project(sf_dir: str):
    """M1-M4 analog: pruned read + vectorized filter + computed column."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ds = _rp(sf_dir, "lineitem",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def f(b: pa.Table) -> pa.Table:
        b = b.filter(pc.less(b["l_shipdate"], pa.scalar(pd.Timestamp("1995-09-01"))))
        rev = pc.multiply(b["l_extendedprice"], pc.subtract(pa.scalar(1.0), b["l_discount"]))
        return pa.Table.from_arrays(
            [b["l_orderkey"], b["l_linenumber"], rev],
            names=["l_orderkey", "l_linenumber", "revenue"],
        )

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


SQL_Q01 = """
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS revenue
FROM lineitem WHERE l_shipdate < TIMESTAMP '1995-09-01'
"""


def q02_groupby_agg(sf_dir: str):
    """A1/A3 analog: TPC-H-Q1-style grouped aggregate with partial
    pre-aggregation done by Ray's hash aggregate."""
    ds = _rp(sf_dir, "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )
    out = ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("l_quantity", alias_name="sum_qty"),
        Sum("l_extendedprice", alias_name="sum_price"),
        Count(alias_name="n"),
    )

    def r(b: pd.DataFrame) -> pd.DataFrame:
        b["sum_qty"] = b["sum_qty"].round(2)
        b["sum_price"] = b["sum_price"].round(2)
        return b

    return out.map_batches(r, batch_format="pandas")


SQL_Q02 = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_price,
       COUNT(*) AS n
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


def q03_sort_limit(sf_dir: str):
    """§2.6: global sort + limit (top-k)."""
    ds = _rp(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)


SQL_Q03 = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


def q04_join_broadcast(sf_dir: str):
    """§2.4: broadcast-small-side join (ray.put once, dict lookup per
    batch) — no shuffle for the dimension tables."""
    nation = pq.read_table(_t(sf_dir, "nation")).to_pandas()
    region = pq.read_table(_t(sf_dir, "region")).to_pandas()
    r_name = dict(zip(region["r_regionkey"], region["r_name"]))
    nat_to_region = {
        int(nk): r_name[rk] for nk, rk in zip(nation["n_nationkey"], nation["n_regionkey"])
    }
    cust = _rp(sf_dir, "customer", columns=["c_nationkey", "c_acctbal"])
    with_region = broadcast_lookup(cust, nat_to_region, "c_nationkey", "r_name")
    out = with_region.groupby("r_name").aggregate(
        Count(alias_name="n_cust"), Sum("c_acctbal", alias_name="sum_bal")
    )

    def r(b: pd.DataFrame) -> pd.DataFrame:
        b["sum_bal"] = b["sum_bal"].round(2)
        return b

    return out.map_batches(r, batch_format="pandas")


SQL_Q04 = """
SELECT r_name, COUNT(*) AS n_cust, ROUND(SUM(c_acctbal), 2) AS sum_bal
FROM customer JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q05_join_hash(sf_dir: str):
    """§2.4: large-large hash-partitioned join (native Dataset.join)."""
    orders = _rp(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    cust = _rp(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    # rows_hint: the rename drops the metadata count, so estimate first
    est = estimate_rows(orders, cust)
    joined = native_join(orders, cust.rename_columns({"c_custkey": "o_custkey"}),
                         on="o_custkey", rows_hint=est)
    out = joined.groupby("c_mktsegment").aggregate(
        Count(alias_name="n_orders"), Sum("o_totalprice", alias_name="sum_price")
    )

    def r(b: pd.DataFrame) -> pd.DataFrame:
        b["sum_price"] = b["sum_price"].round(2)
        return b

    return out.map_batches(r, batch_format="pandas")


SQL_Q05 = """
SELECT c_mktsegment, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 2) AS sum_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def q06_distinct(sf_dir: str):
    """§2.7: distinct over a column pair (shuffle)."""
    ds = _rp(sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus"])
    grouped = ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(Count(alias_name="c"))
    return grouped.drop_columns(["c"])


SQL_Q06 = "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem"


def q07_agg_events(sf_dir: str):
    ds = _rp(sf_dir, "events", columns=["event_type", "value", "ts"])
    out = ds.groupby("event_type").aggregate(
        Count(alias_name="n"), Sum("value", alias_name="sum_value"), Max("ts", alias_name="max_ts")
    )

    def r(b: pd.DataFrame) -> pd.DataFrame:
        b["sum_value"] = b["sum_value"].round(2)
        return b

    return out.map_batches(r, batch_format="pandas")


SQL_Q07 = """
SELECT event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value, MAX(ts) AS max_ts
FROM events GROUP BY event_type
"""


def q08_window_bucket(sf_dir: str):
    """§2.9: tumbling event-time window as an explicit bucket column +
    grouped aggregate.  High-cardinality group key (~1 group/row), so
    Ray's per-group aggregate machinery is replaced by the coarse-bucket
    + vectorized-pandas pattern (same trick as the merge stage; 50 s ->
    ~2 s at sf0.1): partial agg per batch, ONE shuffle on 256 hash
    buckets, vectorized combine per bucket."""
    ds = _rp(sf_dir, "events", columns=["user_id", "ts", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["hour_epoch"] = (
            b["ts"].to_numpy(dtype="datetime64[us]").astype("int64") // 3_600_000_000
        ) * 3600
        g = (
            b.groupby(["user_id", "hour_epoch"], sort=False)["value"]
            .agg(n="size", sum_value="sum")
            .reset_index()
        )
        g["bucket"] = (
            (g["user_id"].to_numpy(dtype="int64") * 1_000_003 + g["hour_epoch"].to_numpy()) % 256
        ).astype("int32")
        return g

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby(["user_id", "hour_epoch"], sort=False)
            .agg(n=("n", "sum"), sum_value=("sum_value", "sum"))
            .reset_index()
        )
        out["n"] = out["n"].astype("int64")
        out["sum_value"] = out["sum_value"].round(2)
        return out[["user_id", "hour_epoch", "n", "sum_value"]]

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(combine, batch_format="pandas")
    )


SQL_Q08 = """
SELECT user_id, epoch(date_trunc('hour', ts))::BIGINT AS hour_epoch,
       COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
FROM events GROUP BY 1, 2
"""


def q09_topk_per_group(sf_dir: str):
    """§2.6: per-group sort + head (top-3 orders per priority)."""
    ds = _rp(sf_dir, "orders", columns=["o_orderpriority", "o_orderkey", "o_totalprice"]
    )

    def top3(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True],
                             kind="stable").head(3)

    return ds.groupby("o_orderpriority").map_groups(top3, batch_format="pandas")


SQL_Q09 = """
SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                               ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders) WHERE rn <= 3
"""


def q10_union(sf_dir: str):
    """Dataset.union of two filtered streams (S-ops breadth)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ds = _rp(sf_dir, "orders", columns=["o_orderstatus", "o_totalprice"])

    def pick(status: str):
        def _f(b: pa.Table) -> pa.Table:
            return b.filter(pc.equal(b["o_orderstatus"], pa.scalar(status)))

        return _f

    a = ds.map_batches(pick("O"), batch_format="pyarrow")
    b = ds.map_batches(pick("F"), batch_format="pyarrow")
    out = a.union(b).groupby("o_orderstatus").aggregate(Count(alias_name="n"))
    return out


SQL_Q10 = """
SELECT o_orderstatus, COUNT(*) AS n FROM orders
WHERE o_orderstatus IN ('O', 'F') GROUP BY o_orderstatus
"""


# ===========================================================================
# text analysis over documents
# ===========================================================================

def q11_langid(sf_dir: str):
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])

    def f(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": b["doc_id"], "pred_lang": langid_frame(b["text"])})

    return ds.map_batches(f, batch_format="pandas")


SQL_Q11 = f"""
SELECT doc_id,
  CASE
    WHEN regexp_matches(text, '{JA_RANGE}') THEN 'ja'
    WHEN regexp_matches(text, '{ZH_RANGE}') THEN 'zh'
    WHEN len(regexp_extract_all(lower(text), '{STOPWORDS["en"]}')) >= len(regexp_extract_all(lower(text), '{STOPWORDS["fr"]}'))
     AND len(regexp_extract_all(lower(text), '{STOPWORDS["en"]}')) >= len(regexp_extract_all(lower(text), '{STOPWORDS["es"]}'))
     AND len(regexp_extract_all(lower(text), '{STOPWORDS["en"]}')) >= len(regexp_extract_all(lower(text), '{STOPWORDS["de"]}')) THEN 'en'
    WHEN len(regexp_extract_all(lower(text), '{STOPWORDS["fr"]}')) >= len(regexp_extract_all(lower(text), '{STOPWORDS["es"]}'))
     AND len(regexp_extract_all(lower(text), '{STOPWORDS["fr"]}')) >= len(regexp_extract_all(lower(text), '{STOPWORDS["de"]}')) THEN 'fr'
    WHEN len(regexp_extract_all(lower(text), '{STOPWORDS["es"]}')) >= len(regexp_extract_all(lower(text), '{STOPWORDS["de"]}')) THEN 'es'
    ELSE 'de'
  END AS pred_lang
FROM documents
"""


def q12_quality(sf_dir: str):
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])

    def f(b: pd.DataFrame) -> pd.DataFrame:
        q = quality_frame(b["text"])
        q.insert(0, "doc_id", b["doc_id"].to_numpy())
        return q

    return ds.map_batches(f, batch_format="pandas")


SQL_Q12 = r"""
SELECT doc_id,
  length(text) AS n_chars,
  len(regexp_extract_all(text, '\S+')) AS n_tokens,
  len(regexp_extract_all(text, '[,.!?;:]')) AS n_punct,
  len(regexp_extract_all(text, '[A-Z]')) AS n_upper,
  (10 * (length(text) - len(regexp_extract_all(text, '\S+')) + 1))
     // greatest(len(regexp_extract_all(text, '\S+')), 1) AS mean_tok_len_x10,
  (len(regexp_extract_all(text, '\S+')) >= 10
   AND len(regexp_extract_all(text, '\S+')) <= 100000
   AND len(regexp_extract_all(text, '[,.!?;:]')) * 5
       <= len(regexp_extract_all(text, '\S+')) * 2 + 10) AS is_quality
FROM documents
"""


def q13_tokens_by_source(sf_dir: str):
    ds = _rp(sf_dir, "documents", columns=["source", "text"])

    def f(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "source": b["source"],
                "toks": b["text"].str.count(r"\S+").astype("int64"),
                "chars": b["text"].str.len().astype("int64"),
            }
        )

    out = ds.map_batches(f, batch_format="pandas").groupby("source").aggregate(
        Count(alias_name="docs"), Sum("toks", alias_name="total_tokens"),
        Sum("chars", alias_name="total_chars"),
    )

    def cast(b: pd.DataFrame) -> pd.DataFrame:
        # DuckDB SUM(BIGINT) is HUGEINT -> cast both sides to int64
        b["total_tokens"] = b["total_tokens"].astype("int64")
        b["total_chars"] = b["total_chars"].astype("int64")
        return b

    return out.map_batches(cast, batch_format="pandas")


SQL_Q13 = r"""
SELECT source, COUNT(*) AS docs,
       SUM(len(regexp_extract_all(text, '\S+')))::BIGINT AS total_tokens,
       SUM(length(text))::BIGINT AS total_chars
FROM documents GROUP BY source
"""


def q14_fingerprint(sf_dir: str):
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])

    def f(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": b["doc_id"], "fp": md5_hex(b["text"])})

    return ds.map_batches(f, batch_format="pandas")


SQL_Q14 = "SELECT doc_id, md5(text) AS fp FROM documents"


# ===========================================================================
# dedup family
# ===========================================================================

def q15_dedup_exact(sf_dir: str):
    """D3 pattern on a key with real duplicates: keep min doc_id per
    (lang, n_chars) group."""
    ds = _rp(sf_dir, "documents", columns=["doc_id", "lang", "n_chars"])
    out = ds.groupby(["lang", "n_chars"]).aggregate(
        Min("doc_id", alias_name="doc_id"), Count(alias_name="dupes")
    )
    return out


SQL_Q15 = """
SELECT lang, n_chars, MIN(doc_id) AS doc_id, COUNT(*) AS dupes
FROM documents GROUP BY lang, n_chars
"""


def q16_dedup_exact_text(sf_dir: str):
    """Exact content-hash dedup: md5 in map_batches -> ONE shuffle on the
    hash -> per-group min id (content itself never shuffles twice)."""
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])

    def f(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": b["doc_id"], "h": md5_hex(b["text"])})

    hashed = ds.map_batches(f, batch_format="pandas")
    return hashed.groupby("h").aggregate(Min("doc_id", alias_name="doc_id"))


SQL_Q16 = "SELECT md5(text) AS h, MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)"


def q17_minhash_pairs(sf_dir: str):
    """MinHash+LSH near-dup pairs.  Fully distributed — candidate gen,
    shingle join-back and Jaccard verify all run as Dataset stages.

    Deterministic (seeded permutations), so it is hash-checked against
    a committed golden of the INDEPENDENT oracle
    (tests/oracle_impl.oracle_minhash_pairs via tools/make_goldens.py)
    surfaced as a DuckDB ``read_parquet`` twin — valid at the driver
    gate's sf0.01 only; planted-truth/forced-path tests carry the
    scale-path rigor."""
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = minhash_dedup_pairs(ds, "text", "doc_id", threshold=0.5)
    return pairs.select_columns(["a", "b"])


def q18_simhash_pairs(sf_dir: str):
    """Banded SimHash near-dup pairs; deterministic -> hash-checked
    against a committed independent-oracle golden (see q17)."""
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    return simhash_pairs(ds, "text", "doc_id", max_hamming=3)


def q19_jaccard_pairs(sf_dir: str):
    """Exact n-gram Jaccard within (lang, n_chars) buckets (the brute
    verify; bucketed so the quadratic term is bounded).  With k=1 the
    shingles are (hashed) distinct word unigrams, so the exact Jaccard
    has a DuckDB list-ops twin: ``jaccard >= 0.5`` over sets is the
    integer test ``3*|intersect| >= |A| + |B|`` (hash-checked — the one
    value-verified member of the near-dup family)."""
    ds = _rp(sf_dir, "documents", columns=["doc_id", "lang", "n_chars", "text"])
    out = ngram_jaccard_pairs(ds, "text", "doc_id", ["lang", "n_chars"], threshold=0.5, k=1)
    return out.drop_columns(["jaccard"])


SQL_Q19 = r"""
WITH d AS (
  SELECT doc_id, lang, n_chars,
         list_distinct(regexp_extract_all(lower(text), '\S+')) AS toks
  FROM documents
),
sized AS (
  SELECT lang, n_chars FROM documents
  GROUP BY 1, 2 HAVING COUNT(*) BETWEEN 2 AND 200
)
SELECT a.doc_id AS a, b.doc_id AS b
FROM d a
JOIN d b ON a.lang = b.lang AND a.n_chars = b.n_chars AND a.doc_id < b.doc_id
JOIN sized s ON s.lang = a.lang AND s.n_chars = a.n_chars
WHERE 3 * len(list_intersect(a.toks, b.toks)) >= len(a.toks) + len(b.toks)
"""


# ===========================================================================
# similarity search
# ===========================================================================

def _load_queries(sf_dir: str, n: int = 3) -> dict:
    # Row-filter pushed into the parquet read: only the n query rows ever
    # reach the driver (row-group predicate pruning), never the table.
    tbl = pq.read_table(
        _t(sf_dir, "embeddings"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", n)],
    ).to_pandas()
    q = tbl.sort_values("vec_id")
    return {"ids": q["vec_id"].to_numpy(), "mat": np.stack(q["embedding"].to_numpy())}


def q20_knn_bruteforce(sf_dir: str):
    ds = _rp(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = knn_bruteforce(ds, _load_queries(sf_dir), "vec_id", "embedding", k=5)
    return out.select_columns(["query_id", "neighbor_id", "rank"])


SQL_Q20 = """
SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
       ROW_NUMBER() OVER (
         PARTITION BY q.vec_id
         ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[]) DESC,
                  e.vec_id) AS rank
FROM (SELECT * FROM embeddings WHERE vec_id < 3) q, embeddings e
WHERE e.vec_id != q.vec_id
QUALIFY rank <= 5
"""


def q21_knn_lsh(sf_dir: str):
    """ANN scale path: hyperplane-LSH buckets with single-bit multiprobe.
    Deterministic (seeded hyperplanes) -> hash-checked against a
    committed independent-oracle golden (see q17); recall vs brute
    force additionally asserted in unit tests."""
    ds = _rp(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = knn_lsh(ds, _load_queries(sf_dir), "vec_id", "embedding", k=5, dim=64, bits=8)
    return out.select_columns(["query_id", "neighbor_id", "rank"])


def q35_knn_ivf(sf_dir: str):
    """Second ANN scale path: IVF — spherical-k-means coarse quantizer
    over a bounded driver-side sample, vectorized cell assignment, each
    query scans only its nprobe closest cells.  Deterministic (seeded
    k-means over the full gate-scale corpus) -> hash-checked against a
    committed independent-oracle golden (see q17); recall vs brute
    force additionally asserted in unit tests."""
    ds = _rp(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = knn_ivf(ds, _load_queries(sf_dir), "vec_id", "embedding", k=5,
                  nlist=16, nprobe=4)
    return out.select_columns(["query_id", "neighbor_id", "rank"])


def q22_embedding_dups(sf_dir: str):
    """Embedding-cosine near-dup pairs within label buckets."""
    ds = _rp(sf_dir, "embeddings")
    out = embedding_dup_pairs(ds, "vec_id", "embedding", "label", tau=0.3)
    return out.drop_columns(["cos"])


SQL_Q22 = """
SELECT a.vec_id AS a, b.vec_id AS b
FROM embeddings a, embeddings b
WHERE a.label = b.label AND a.vec_id < b.vec_id
  AND list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) > 0.3
"""


# ===========================================================================
# extraction pipeline over driver tables (rows-only; goldens carry rigor)
# ===========================================================================

def _doc_pages(sf_dir: str):
    # The test documents file is one tiny parquet -> 1 read block -> every
    # downstream stage would run as ONE task.  override_num_blocks splits
    # the READ itself to 2x cluster width — no repartition exchange, no
    # extra metadata-strip wave (r3 A/B at sf0.1/32cpu: min 7.1 s vs 7.2 s
    # for the old strip+repartition form; see BASELINE.md).  A real 100 TB
    # read yields thousands of blocks natively and skips this.
    import ray

    width = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    docs = rd.read_parquet(_t(sf_dir, "documents"), override_num_blocks=width * 2)
    return docs.map_batches(pages_from_documents, batch_format="pyarrow")


def _small_input_pipe():
    """The flagship pipeline exactly as production runs it.  An A/B at
    sf0.1 x 32 pinned cpus (3 repeats each, one session) measured the
    WARM pool at 4.95 s min vs 7.03 s for a ramping (min=1) pool on
    q23 — at 5k docs the ramp starves recognition while actors spawn,
    so the eager 3/4-share pool wins here too; sizing.py's
    ramp-for-short-stages note applies to lighter per-query actor
    stages, not the flagship."""
    from .extract import ExtractPipeline

    return ExtractPipeline(CLI_CONFIG)


def q23_extract(sf_dir: str):
    """Flagship det->rec->merge over pages synthesized from documents.

    Hash-checked against a committed oracle golden (tests/golden/
    q23_sf0.01.parquet, generated by the INDEPENDENT oracle impl via
    tools/make_goldens.py) surfaced as a DuckDB ``read_parquet`` twin —
    valid at the driver gate's sf0.01 only."""
    return _small_input_pipe().run(_doc_pages(sf_dir))


_GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "tests", "golden",
)

# golden twins: the oracle side is the committed output of the independent
# reference implementation (tests/oracle_impl.py), NOT SQL re-derivation —
# the judge-requested way to surface the extraction goldens through the
# driver's value-hash gate.  Pinned to sf0.01 (the gate's scale factor).
SQL_Q23 = f"""
SELECT url, warc_ts, lang, extracted_text, n_spans, confidence
FROM read_parquet('{_GOLDEN_DIR}/q23_sf0.01.parquet')
"""

SQL_Q30 = f"""
SELECT url, warc_ts, lang, extracted_text, n_spans, confidence
FROM read_parquet('{_GOLDEN_DIR}/q30_sf0.01.parquet')
"""

SQL_Q24 = f"""
SELECT url, warc_ts, lang, block_id, start, "end", tstart, tend,
       line_start, line_end, tag, depth, "order", score
FROM read_parquet('{_GOLDEN_DIR}/q24_sf0.01.parquet')
"""

# the approximate family's golden twins (VERDICT r3 item 1): committed
# output of the independent straight-line oracles (tests/oracle_impl.py:
# oracle_minhash_pairs / oracle_simhash_pairs / oracle_knn_lsh /
# oracle_knn_ivf, generated by tools/make_goldens.make_approx_goldens) —
# all four pipelines are deterministic (seeded permutations /
# hyperplanes / k-means) and emit integer-only rows.  Pinned to sf0.01.
SQL_Q17 = f"SELECT a, b FROM read_parquet('{_GOLDEN_DIR}/q17_sf0.01.parquet')"
SQL_Q18 = (f"SELECT a, b, hamming "
           f"FROM read_parquet('{_GOLDEN_DIR}/q18_sf0.01.parquet')")
SQL_Q21 = (f"SELECT query_id, neighbor_id, rank "
           f"FROM read_parquet('{_GOLDEN_DIR}/q21_sf0.01.parquet')")
SQL_Q35 = (f"SELECT query_id, neighbor_id, rank "
           f"FROM read_parquet('{_GOLDEN_DIR}/q35_sf0.01.parquet')")


def q30_mixed_extract(sf_dir: str):
    """Mixed-payload extraction (north_rule "PDF/layout parse"): the
    documents table wrapped as pages where every 5th doc_id carries its
    text as a FlateDecode'd PDF and every 11th an image payload; the
    detect stage routes by magic bytes (functions/pdf.py).  Hash-checked
    against a committed golden of the INDEPENDENT mixed oracle
    (tests/oracle_impl.py extract_mixed_corpus: spec-subset PDF reader +
    PNG IHDR parser, tools/make_goldens.py) surfaced as a DuckDB
    ``read_parquet`` twin — valid at the driver gate's sf0.01 only;
    byte-level micro-goldens live in tests/test_pdf.py."""
    import ray

    from ..sources.synth import mixed_pages_from_documents
    width = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    docs = rd.read_parquet(_t(sf_dir, "documents"), override_num_blocks=width * 2)
    pages = docs.map_batches(mixed_pages_from_documents, batch_format="pyarrow")
    return _small_input_pipe().run(pages)


def q24_detect_spans(sf_dir: str):
    """Detection stage only: flat span rows (offsets + scores), sentinel
    rows for zero-span pages excluded (the JSON sink's contract).

    Hash-checked against a committed oracle golden (tests/golden/
    q24_sf0.01.parquet, generated by the INDEPENDENT oracle impl via
    tools/make_goldens.py) surfaced as a DuckDB ``read_parquet`` twin —
    valid at the driver gate's sf0.01 only."""
    pipe = _small_input_pipe()
    spans = pipe.detect(_doc_pages(sf_dir)).drop_columns(["raw"])
    return spans.filter(expr="block_id >= 0")


def q25_media_meta(sf_dir: str):
    """Multimodal plumbing over binary payloads (documents.text as bytes);
    SQL twin checks the honest part (sizes + digests)."""
    import pyarrow as pa

    docs = _rp(sf_dir, "documents", columns=["doc_id", "text"])

    def to_blob(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.Table.from_arrays(
            [b["doc_id"], pc.cast(b["text"], pa.binary())], names=["doc_id", "payload"]
        )

    media = docs.map_batches(to_blob, batch_format="pyarrow")
    out = featurize_media(media, "payload", "doc_id")
    return out.select_columns(["media_id", "n_bytes", "sha16"])


SQL_Q25 = """
SELECT doc_id AS media_id, octet_length(encode(text)) AS n_bytes,
       substr(sha256(text), 1, 16) AS sha16
FROM documents
"""


def q31_frame_sample(sf_dir: str):
    """Video frame-sampling plumbing (stages/multimodal.frame_sample):
    the fake frame index is deterministic (1 frame per KiB, every 10th
    sampled), so the Ray-side plumbing — flat (media, frame) rows from
    binary payloads — is value-checked by a generate_series SQL twin."""
    import pyarrow as pa

    docs = _rp(sf_dir, "documents", columns=["doc_id", "text"])

    def to_blob(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.Table.from_arrays(
            [b["doc_id"], pc.cast(b["text"], pa.binary())], names=["doc_id", "payload"]
        )

    media = docs.map_batches(to_blob, batch_format="pyarrow")
    out = frame_sample(media, "payload", "doc_id", every_n=10)
    return out.select_columns(["media_id", "frame_no"])


SQL_Q31 = """
SELECT doc_id AS media_id,
       unnest(generate_series(0, greatest(octet_length(encode(text)) // 1024, 1) - 1, 10)) AS frame_no
FROM documents
"""


def q32_rolling_fingerprint(sf_dir: str):
    """Winnowing-style document fingerprint: min Karp-Rabin rolling hash
    over 16-char windows (functions/textstats.rolling_fingerprint).
    Hash-checked against a closed-form DuckDB twin (SQL_Q32: the window
    hash as sum(ord * 257^(16-j)) mod 2^61 over generate_series windows
    in HUGEINT arithmetic) and unit-tested against an independent
    brute-force twin (tests/test_wired_ops.py)."""
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])

    def f(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": b["doc_id"],
             "rfp": rolling_fingerprint(b["text"]).astype("int64")}
        )

    return ds.map_batches(f, batch_format="pandas")


_RFP_MOD = 1 << 61
_RFP_POWS = ", ".join(
    f"({j}, {pow(257, 16 - j, _RFP_MOD)}::HUGEINT)" for j in range(1, 17)
)

# the rolling (Karp-Rabin) hash in closed form: each 16-char window's
# hash is sum_j ord(char_j) * 257^(16-j) mod 2^61 — identical to the
# iterative add/subtract formulation in functions/textstats.py.  Short
# docs are \x00-padded to one window (ord 0 terms vanish, hence the
# CASE).  HUGEINT (int128) holds the pre-mod sum (< 2^86).
SQL_Q32 = f"""
WITH pw(j, p) AS (VALUES {_RFP_POWS}),
docs AS (SELECT doc_id, text, greatest(length(text), 16) AS L FROM documents),
win AS (SELECT doc_id, unnest(generate_series(1, L - 15)) AS i FROM docs),
h AS (
  SELECT w.doc_id, w.i,
         (SUM(CASE WHEN w.i + pw.j - 1 <= length(d.text)
               THEN unicode(substr(d.text, w.i + pw.j - 1, 1))::HUGEINT
               ELSE 0 END * pw.p) % {_RFP_MOD}::HUGEINT)::BIGINT AS hv
  FROM win w JOIN docs d USING (doc_id) CROSS JOIN pw
  GROUP BY w.doc_id, w.i
)
SELECT doc_id, MIN(hv) AS rfp FROM h GROUP BY doc_id
"""


# ===========================================================================
# temporal operators (sessionization, as-of join)
# ===========================================================================

def q26_sessionize(sf_dir: str):
    """Gap-based sessionization (30-min gap): the windowed-aggregate
    family Ray Data lacks natively; bucket-groupby + vectorized scan."""
    from ..stages.temporal import sessionize

    ds = _rp(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    return sessionize(ds, "user_id", "ts", "event_id", gap_us=30 * 60 * 1_000_000)


SQL_Q26 = """
SELECT event_id, user_id,
       SUM(CASE WHEN prev_ts IS NULL
                  OR ts - prev_ts > INTERVAL 30 MINUTE THEN 1 ELSE 0 END)
         OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING)::BIGINT AS session_seq
FROM (
  SELECT event_id, user_id, ts,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events)
"""


def q27_asof_join(sf_dir: str):
    """As-of join: each event gets the latest order of the same user
    with o_orderdate <= ts.  Strategy auto-selected by right-side row
    count: broadcast searchsorted index here (orders is small at test
    scale); above the threshold the bucketed co-partitioned
    ``pd.merge_asof`` path runs instead (tested equivalent in
    tests/test_temporal_asof.py)."""
    from ..stages.temporal import asof_join

    orders = _rp(sf_dir, "orders", columns=["o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"]
    )
    events = _rp(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    out = asof_join(events, orders, "user_id", "ts", ["o_orderkey", "o_totalprice"],
                    right_key_col="o_custkey", right_ts_col="o_orderdate")
    return out.select_columns(["event_id", "user_id", "o_orderkey", "o_totalprice"])


SQL_Q27 = """
WITH r AS (
  SELECT o_custkey, o_orderdate,
         arg_max(o_orderkey, o_orderkey) AS o_orderkey,
         arg_max(o_totalprice, o_orderkey) AS o_totalprice
  FROM orders GROUP BY 1, 2
)
SELECT e.event_id, e.user_id,
       r.o_orderkey::DOUBLE AS o_orderkey, r.o_totalprice
FROM events e ASOF LEFT JOIN r
  ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate
"""


# ===========================================================================
# json scalar functions + deep join tree
# ===========================================================================

def q28_json_extract(sf_dir: str):
    """F6 analog: per-row JSON field extraction + grouped aggregate.

    Hybrid extraction (VERDICT r4 item 7 + the r5 review fix): the
    fast path is one vectorized ``str.extract`` C-regex per batch, but
    it only TRUSTS itself when the row has exactly ONE ``"k":``
    occurrence and the value is a bare integer — any other shape
    (duplicate/nested ``"k"``, a ``"k":`` inside a string value, a
    float) falls back to exact ``json.loads`` for that row, so the result
    matches the twin's ``json_extract('$.k')`` on every valid JSON
    input rather than assuming the testdata's flat shape.  A row with
    no extractable k surfaces as a loud error, never a silent value.
    """
    ds = _rp(sf_dir, "events", columns=["event_type", "props"])

    def f(b: pd.DataFrame) -> pd.DataFrame:
        import json as _json

        props = b["props"]
        counts = props.str.count(r'"k"\s*:')
        fast = props.str.extract(r'"k"\s*:\s*(-?\d+)(?![\d.eE])',
                                 expand=False)
        ok = (counts == 1) & fast.notna()
        k = np.empty(len(b), dtype="int64")
        k[ok.to_numpy()] = fast[ok].astype("int64").to_numpy()
        if (~ok).any():
            k[(~ok).to_numpy()] = [int(_json.loads(p)["k"])
                                   for p in props[~ok]]
        g = pd.DataFrame({"event_type": b["event_type"], "n": np.int64(1),
                          "sum_k": k, "max_k": k})
        return (g.groupby("event_type", sort=False)
                .agg({"n": "sum", "sum_k": "sum", "max_k": "max"})
                .reset_index())

    from ..stages.distinct import grouped_reduce

    return grouped_reduce(ds.map_batches(f, batch_format="pandas"),
                          "event_type", ["n", "sum_k", "max_k"],
                          how={"n": "sum", "sum_k": "sum", "max_k": "max"},
                          num_buckets=4)


SQL_Q28 = """
SELECT event_type, COUNT(*) AS n,
       SUM(json_extract(props, '$.k')::BIGINT)::BIGINT AS sum_k,
       MAX(json_extract(props, '$.k')::BIGINT) AS max_k
FROM events GROUP BY event_type
"""


def q29_multijoin(sf_dir: str, broadcast_max_rows: int = 2_000_000):
    """TPC-H-Q5-style deep join tree with MEASURED broadcast decisions:
    the big-big lineitem x orders edge is always a hash-partitioned
    join; supplier and customer are fact-scaled, so each is broadcast
    (``ray.put`` dict + per-worker cache — never a closure capture) only
    when its measured row count is at or under ``broadcast_max_rows``,
    else it joins hash-partitioned too (the 100 TB path; forced and
    equivalence-tested in tests/test_wired_ops.py).  nation/region (25 +
    5 rows) always broadcast; revenue per nation in EUROPE."""
    nat = pq.read_table(_t(sf_dir, "nation")).to_pandas()
    reg = pq.read_table(_t(sf_dir, "region")).to_pandas()
    r_name = dict(zip(reg["r_regionkey"], reg["r_name"]))
    n_region = {int(k): r_name[r] for k, r in zip(nat["n_nationkey"], nat["n_regionkey"])}
    n_name = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))

    li = _rp(sf_dir, "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    orders = _rp(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    big_est = estimate_rows(li, orders)
    joined = native_join(
        li, orders.rename_columns({"o_orderkey": "l_orderkey"}), on="l_orderkey",
        rows_hint=big_est)

    # the fact stream past the first join is ~lineitem-sized (each l_orderkey
    # matches exactly one order), NOT li+orders — the dim joins size their
    # exchange from this estimate plus the dim's OWN row count, never from
    # big_est (which would spawn fact-join-scaled aggregator actors, ~1 s
    # each, for a dimension-sized right side)
    fact_est = estimate_rows(li)

    def attach_dim(ds, name, key_file_col, join_key, out_col):
        dim = _rp(sf_dir, name, columns=[key_file_col, out_col])
        n_dim = dim.count()  # metadata-only count
        if n_dim <= broadcast_max_rows:
            df = pq.read_table(_t(sf_dir, name), columns=[key_file_col, out_col]).to_pandas()
            lut = dict(zip(df[key_file_col].astype(int), df[out_col].astype(int)))
            return broadcast_lookup(ds, lut, join_key, out_col)
        return native_join(ds, dim.rename_columns({key_file_col: join_key}),
                           on=join_key,
                           rows_hint=None if fact_est is None else fact_est + n_dim)

    joined = attach_dim(joined, "supplier", "s_suppkey", "l_suppkey", "s_nationkey")
    joined = attach_dim(joined, "customer", "c_custkey", "o_custkey", "c_nationkey")
    # nation/region: 25 + 5 rows — the provably-small broadcast side
    joined = broadcast_lookup(joined, n_region, "s_nationkey", "r_name")
    joined = broadcast_lookup(joined, n_name, "s_nationkey", "n_name")

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        keep = (b["s_nationkey"] == b["c_nationkey"]) & (b["r_name"] == "EUROPE")
        b = b[keep]
        return pd.DataFrame(
            {
                "n_name": b["n_name"].to_numpy(),
                "rev": (b["l_extendedprice"] * (1.0 - b["l_discount"])).to_numpy(),
            }
        )

    out = joined.map_batches(finish, batch_format="pandas").groupby("n_name").aggregate(
        Sum("rev", alias_name="revenue"), Count(alias_name="n_items")
    )

    def r(b: pd.DataFrame) -> pd.DataFrame:
        b["revenue"] = b["revenue"].round(2)
        return b

    return out.map_batches(r, batch_format="pandas")


SQL_Q29 = """
SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
GROUP BY n_name
"""


# ===========================================================================
# extra text / temporal operators (round 2)
# ===========================================================================

#: GPT-2-style pre-tokenizer restricted to ASCII classes so Python re and
#: DuckDB's RE2 match identically (both leftmost-first, non-overlapping;
#: \p{L}/\w differ between the engines and are deliberately avoided)
BPE_RE = r"'(?:s|d|m|t|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def q33_bpe_tokens(sf_dir: str):
    """Token counting with a BPE-ish pre-tokenizer regex (the
    training-data token-budget primitive; exact twin in RE2)."""
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])

    def f(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": b["doc_id"],
             "n_bpe": b["text"].str.count(BPE_RE).astype("int64")}
        )

    return ds.map_batches(f, batch_format="pandas")


SQL_Q33 = (
    "SELECT doc_id, len(regexp_extract_all(text, '"
    + BPE_RE.replace("'", "''")
    + "'))::BIGINT AS n_bpe FROM documents"
)


def q34_hopping_window(sf_dir: str):
    """Hopping (sliding) event-time window aggregate — 1 h windows every
    30 min, so each event lands in size/hop = 2 windows.  Ray Data has
    no window operator: each batch explodes events into their window
    replicas and pre-aggregates (vectorized), then ONE coarse-bucket
    groupby combines — the q08 pattern generalized to overlapping
    windows.  SQL twin via unnest(generate_series)."""
    size_us = 3_600_000_000
    hop_us = 1_800_000_000
    m = size_us // hop_us

    ds = _rp(sf_dir, "events", columns=["ts", "value"])

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        te = b["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
        wmax = te // hop_us * hop_us
        ws = np.concatenate([wmax - j * hop_us for j in range(m)])
        vals = np.tile(b["value"].to_numpy(), m)
        g = (
            pd.DataFrame({"window_start": ws, "value": vals})
            .groupby("window_start", sort=False)["value"]
            .agg(n="size", sum_value="sum")
            .reset_index()
        )
        g["bucket"] = (g["window_start"] // hop_us % 128).astype("int32")
        return g

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby("window_start", sort=False)
            .agg(n=("n", "sum"), sum_value=("sum_value", "sum"))
            .reset_index()
        )
        out["n"] = out["n"].astype("int64")
        out["sum_value"] = out["sum_value"].round(2)
        return out[["window_start", "n", "sum_value"]]

    return (
        ds.map_batches(explode, batch_format="pandas")
        .groupby("bucket")
        .map_groups(combine, batch_format="pandas")
    )


SQL_Q34 = """
SELECT w AS window_start, COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
FROM (
  SELECT value,
         unnest(generate_series(
           (epoch_us(ts) // 1800000000 - 1) * 1800000000,
           (epoch_us(ts) // 1800000000) * 1800000000,
           1800000000)) AS w
  FROM events)
GROUP BY 1
"""


def q36_curation(sf_dir: str):
    """Composite training-data curation chain — the realistic end-to-end
    pipeline the single-purpose operators compose into: quality gate
    (q12's predicate) -> exact content dedup (md5, keep min doc_id;
    coarse-bucket + vectorized first, never per-content map_groups) ->
    per-source kept-token budget.  Fully hash-checked against one SQL
    twin."""
    ds = _rp(sf_dir, "documents", columns=["doc_id", "source", "text"])

    def stats(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].str.count(r"\S+").astype("int64")
        punct = b["text"].str.count(r"[,.!?;:]").astype("int64")
        keep = (toks >= 10) & (toks <= 100000) & (punct * 5 <= toks * 2 + 10)
        out = pd.DataFrame(
            {
                "doc_id": b["doc_id"].to_numpy(),
                "source": b["source"].to_numpy(),
                "toks": toks.to_numpy(),
                "h": md5_hex(b["text"]).to_numpy(),
            }
        )[keep.to_numpy()]
        out["bucket"] = (
            pd.util.hash_array(out["h"].to_numpy(dtype=object)) % 128
        ).astype("int32")
        return out

    def first_per_content(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h", "doc_id"], kind="stable").drop_duplicates("h")
        return g[["source", "toks"]]

    kept = (
        ds.map_batches(stats, batch_format="pandas")
        .groupby("bucket")
        .map_groups(first_per_content, batch_format="pandas")
    )
    out = kept.groupby("source").aggregate(
        Count(alias_name="docs"), Sum("toks", alias_name="total_tokens")
    )

    def cast(b: pd.DataFrame) -> pd.DataFrame:
        b["total_tokens"] = b["total_tokens"].astype("int64")
        return b

    return out.map_batches(cast, batch_format="pandas")


SQL_Q36 = r"""
WITH q AS (
  SELECT doc_id, source,
         len(regexp_extract_all(text, '\S+')) AS toks,
         md5(text) AS h
  FROM documents
  WHERE len(regexp_extract_all(text, '\S+')) BETWEEN 10 AND 100000
    AND len(regexp_extract_all(text, '[,.!?;:]')) * 5
        <= len(regexp_extract_all(text, '\S+')) * 2 + 10
),
s AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id) AS rn FROM q
)
SELECT source, COUNT(*) AS docs, SUM(toks)::BIGINT AS total_tokens
FROM s WHERE rn = 1 GROUP BY source
"""


def q37_range_join(sf_dir: str):
    """Keyed interval (range) join + aggregate: for every click event,
    the count and value-sum of the SAME user's events in the following
    hour (stages/temporal.range_join_agg — one (key, time-window)
    bucket exchange, right side replicated into <= 2 windows so
    per-bucket aggregation is complete).

    Values aggregate as INTEGER CENTS on both sides (each stored double
    is a 2-decimal price, so round(v*100) is its exact cent count and
    integer sums are order-independent below 2^53) — float summation
    order and the np.round/DuckDB-ROUND half-even/half-away difference
    can otherwise flip a .xx5-boundary sum between the engine and the
    twin."""
    from ..stages.temporal import range_join_agg

    ev = _rp(sf_dir, "events", columns=["event_id", "ts", "user_id", "event_type", "value"])

    def cents(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["value"] = np.round(b["value"].to_numpy(dtype="float64") * 100.0)
        return b

    ev = ev.map_batches(cents, batch_format="pandas")
    clicks = ev.filter(expr="event_type == 'click'")
    out = range_join_agg(clicks, ev, key_col="user_id", ts_col="ts",
                         id_col="event_id", delta_us=3_600_000_000,
                         value_col="value")

    def dollars(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["sum_value"] = np.round(b["sum_value"].to_numpy(dtype="float64") / 100.0, 2)
        return b

    return out.map_batches(dollars, batch_format="pandas")


SQL_Q37 = """
SELECT a.event_id,
       COUNT(b.event_id) AS n_matches,
       ROUND(COALESCE(SUM(ROUND(b.value * 100)::BIGINT), 0) / 100.0, 2) AS sum_value
FROM events a
LEFT JOIN events b
  ON a.user_id = b.user_id
 AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
WHERE a.event_type = 'click'
GROUP BY a.event_id
"""


def q38_vocab_topk(sf_dir: str):
    """Corpus vocabulary top-k: whitespace-tokenized lowercase term
    frequencies over documents, top 100 by (count desc, token asc).

    Scale shape: per-batch pre-aggregation collapses each block to its
    distinct terms BEFORE the exchange (the A1 combiner pattern), fully
    vectorized (lower/split/explode/value_counts — no per-document
    Python loop); the global combine is a groupby(token) sum —
    vocabulary-sized, not corpus-sized — followed by a tiny sort+limit."""
    ds = _rp(sf_dir, "documents", columns=["text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        toks = (b["text"].astype(str).str.lower().str.split()
                .explode(ignore_index=True).dropna())
        vc = toks.value_counts(sort=False)
        return pd.DataFrame({"token": vc.index.to_numpy(dtype=object),
                             "cnt": vc.to_numpy(dtype="int64")})

    counts = ds.map_batches(partial, batch_format="pandas").groupby("token").aggregate(
        Sum("cnt", alias_name="n")
    )
    top = counts.sort(["n", "token"], descending=[True, False]).limit(100)

    def cast(b: pd.DataFrame) -> pd.DataFrame:
        b["n"] = b["n"].astype("int64")
        return b

    return top.map_batches(cast, batch_format="pandas")


SQL_Q38 = r"""
SELECT token, COUNT(*)::BIGINT AS n
FROM (SELECT unnest(regexp_extract_all(lower(text), '\S+')) AS token FROM documents)
GROUP BY token
ORDER BY n DESC, token ASC
LIMIT 100
"""


def q39_dup_clusters(sf_dir: str):
    """Corpus-level near-dup clustering: transitive closure of the q19
    Jaccard pair graph, every document assigned cluster_id = min doc_id
    in its connected component (singletons keep their own id).  The
    graph analog of the reference's transitive box merge
    (src/det.rs worklist merge); the step that turns PAIRS into a
    keep-one-per-cluster dedup decision.  Pair count is measured and
    the driver union-find fast path taken under the cap; above it,
    distributed min-label propagation (see stages/cluster.py)."""
    ds = _rp(sf_dir, "documents", columns=["doc_id", "lang", "n_chars", "text"])
    pairs = ngram_jaccard_pairs(ds, "text", "doc_id", ["lang", "n_chars"],
                                threshold=0.5, k=1).drop_columns(["jaccard"])
    out = connected_components(pairs, ds, id_col="doc_id", out_col="cluster_id")

    def cast(b: pd.DataFrame) -> pd.DataFrame:
        b["doc_id"] = b["doc_id"].astype("int64")
        b["cluster_id"] = b["cluster_id"].astype("int64")
        return b

    return out.map_batches(cast, batch_format="pandas")


#: q19's edge set + a recursive min-label walk: comp(x) = min id that
#: can reach x through the symmetric pair graph = min id in x's
#: connected component (UNION recursion deduplicates visited states)
SQL_Q39 = r"""
WITH RECURSIVE d AS (
  SELECT doc_id, lang, n_chars,
         list_distinct(regexp_extract_all(lower(text), '\S+')) AS toks
  FROM documents
),
sized AS (
  SELECT lang, n_chars FROM documents
  GROUP BY 1, 2 HAVING COUNT(*) BETWEEN 2 AND 200
),
edges AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM d a
  JOIN d b ON a.lang = b.lang AND a.n_chars = b.n_chars AND a.doc_id < b.doc_id
  JOIN sized s ON s.lang = a.lang AND s.n_chars = a.n_chars
  WHERE 3 * len(list_intersect(a.toks, b.toks)) >= len(a.toks) + len(b.toks)
),
sym AS (
  SELECT a AS src, b AS dst FROM edges
  UNION ALL
  SELECT b AS src, a AS dst FROM edges
),
walk (id, comp) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT s.dst, w.comp FROM walk w JOIN sym s ON s.src = w.id
)
SELECT id::BIGINT AS doc_id, MIN(comp)::BIGINT AS cluster_id
FROM walk GROUP BY id
"""


def q40_dedup_canonical(sf_dir: str):
    """Quality-aware canonical keep: near-dup clusters (q39) reduced to
    ONE kept document each — the longest member, doc_id as tie-break
    (real curation keeps the best-quality member, not an arbitrary
    one).  Composition: connected_components -> slim hash join of the
    (doc_id, cluster_id) assignment against (doc_id, n_chars) — ids and
    ints only, documents never shuffle — -> coarse-bucket vectorized
    argmax per cluster (the q15/q36 pattern: never
    groupby(cluster).map_groups on an unbounded key)."""
    ds = _rp(sf_dir, "documents", columns=["doc_id", "lang", "n_chars", "text"])
    pairs = ngram_jaccard_pairs(ds, "text", "doc_id", ["lang", "n_chars"],
                                threshold=0.5, k=1).drop_columns(["jaccard"])
    assign = connected_components(pairs, ds, id_col="doc_id", out_col="cluster_id")
    sizes = _rp(sf_dir, "documents", columns=["doc_id", "n_chars"])
    est = estimate_rows(sizes)
    joined = native_join(assign, sizes, on="doc_id",
                         rows_hint=None if est is None else 2 * est)

    def bucket(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["_cb"] = (b["cluster_id"].to_numpy() % 256).astype("int32")
        return b

    def argmax(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cluster_id", "n_chars", "doc_id"],
                          ascending=[True, False, True], kind="stable")
        g = g.drop_duplicates("cluster_id", keep="first")
        out = pd.DataFrame({
            "cluster_id": g["cluster_id"].astype("int64"),
            "keep_id": g["doc_id"].astype("int64"),
            "n_chars": g["n_chars"].astype("int64"),
        })
        return out

    return (joined.map_batches(bucket, batch_format="pandas")
            .groupby("_cb").map_groups(argmax, batch_format="pandas"))


SQL_Q40 = r"""
WITH RECURSIVE d AS (
  SELECT doc_id, lang, n_chars,
         list_distinct(regexp_extract_all(lower(text), '\S+')) AS toks
  FROM documents
),
sized AS (
  SELECT lang, n_chars FROM documents
  GROUP BY 1, 2 HAVING COUNT(*) BETWEEN 2 AND 200
),
edges AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM d a
  JOIN d b ON a.lang = b.lang AND a.n_chars = b.n_chars AND a.doc_id < b.doc_id
  JOIN sized s ON s.lang = a.lang AND s.n_chars = a.n_chars
  WHERE 3 * len(list_intersect(a.toks, b.toks)) >= len(a.toks) + len(b.toks)
),
sym AS (
  SELECT a AS src, b AS dst FROM edges
  UNION ALL
  SELECT b AS src, a AS dst FROM edges
),
walk (id, comp) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT s.dst, w.comp FROM walk w JOIN sym s ON s.src = w.id
),
cl AS (SELECT id AS doc_id, MIN(comp) AS cluster_id FROM walk GROUP BY id),
ranked AS (
  SELECT cl.cluster_id, doc.doc_id, doc.n_chars,
         ROW_NUMBER() OVER (PARTITION BY cl.cluster_id
                            ORDER BY doc.n_chars DESC, doc.doc_id ASC) AS rn
  FROM cl JOIN documents doc ON doc.doc_id = cl.doc_id
)
SELECT cluster_id::BIGINT AS cluster_id, doc_id::BIGINT AS keep_id,
       n_chars::BIGINT AS n_chars
FROM ranked WHERE rn = 1
"""


def q41_stratified_sample(sf_dir: str):
    """Deterministic stratified sampling — the training-data mixture
    primitive: keep a per-source rate of documents selected by a STABLE
    content-independent hash (md5 of the id string), so the sample is
    reproducible across runs/engines and needs no shuffle or state.
    Rate per source = (100 + 37*len(source)) per-mille — an arbitrary
    but deterministic per-stratum mixture weight expressible on both
    sides."""
    ds = _rp(sf_dir, "documents", columns=["doc_id", "source"])

    def f(b: pd.DataFrame) -> pd.DataFrame:
        h = md5_hex(b["doc_id"].astype("int64").astype(str))
        v = md5_head32(h) % 1000
        rate = (100 + (b["source"].str.len().to_numpy() * 37) % 400)
        return b[v < rate]

    return ds.map_batches(f, batch_format="pandas")


SQL_Q41 = """
SELECT doc_id, source FROM documents
WHERE ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 1000
      < 100 + (length(source) * 37) % 400
"""


def q42_contamination(sf_dir: str):
    """Benchmark decontamination: documents of OTHER sources that are
    near-duplicates (a q19 Jaccard pair) of any document in the probe
    source (the min source value — stands in for an eval/benchmark
    set).  Scale shape: the probe id set is benchmark-sized and
    broadcasts once; pairs come from the bucketed Jaccard verify (slim
    int rows), and the contaminated-id distinct is a coarse-bucket
    groupby — the corpus never shuffles."""
    import ray

    from ..functions.bloom import member_mask

    docs_meta = pq.read_table(_t(sf_dir, "documents"), columns=["source"])
    probe_src = min(docs_meta["source"].to_pylist())
    probe_ids = frozenset(
        pq.read_table(_t(sf_dir, "documents"), columns=["doc_id", "source"],
                      filters=[("source", "==", probe_src)])["doc_id"].to_pylist()
    )
    ref = ray.put(probe_ids)

    ds = _rp(sf_dir, "documents", columns=["doc_id", "lang", "n_chars", "text"])
    pairs = ngram_jaccard_pairs(ds, "text", "doc_id", ["lang", "n_chars"],
                                threshold=0.5, k=1).drop_columns(["jaccard"])

    def contaminated(b: pd.DataFrame) -> pd.DataFrame:
        from ..stages.merge import _get_broadcast

        probe = _get_broadcast(ref)
        a = b["a"].to_numpy(dtype="int64")
        bb = b["b"].to_numpy(dtype="int64")
        a_in = member_mask(probe, b["a"])
        b_in = member_mask(probe, b["b"])
        # contaminated = the non-probe member of a probe-crossing pair
        ids = np.concatenate([a[b_in & ~a_in], bb[a_in & ~b_in]])
        out = pd.DataFrame({"doc_id": ids})
        out["_cb"] = (ids % 64).astype("int32")
        return out

    def distinct(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": np.unique(g["doc_id"].to_numpy())})

    return (pairs.map_batches(contaminated, batch_format="pandas")
            .groupby("_cb").map_groups(distinct, batch_format="pandas"))


SQL_Q42 = r"""
WITH d AS (
  SELECT doc_id, lang, n_chars,
         list_distinct(regexp_extract_all(lower(text), '\S+')) AS toks
  FROM documents
),
sized AS (
  SELECT lang, n_chars FROM documents
  GROUP BY 1, 2 HAVING COUNT(*) BETWEEN 2 AND 200
),
edges AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM d a
  JOIN d b ON a.lang = b.lang AND a.n_chars = b.n_chars AND a.doc_id < b.doc_id
  JOIN sized s ON s.lang = a.lang AND s.n_chars = a.n_chars
  WHERE 3 * len(list_intersect(a.toks, b.toks)) >= len(a.toks) + len(b.toks)
),
probe AS (SELECT doc_id FROM documents
          WHERE source = (SELECT min(source) FROM documents)),
sym AS (SELECT a AS id, b AS other FROM edges
        UNION ALL SELECT b AS id, a AS other FROM edges)
SELECT DISTINCT x.id AS doc_id
FROM sym x
JOIN probe p ON x.other = p.doc_id
ANTI JOIN probe q ON x.id = q.doc_id
"""


def q43_pack_bins(sf_dir: str):
    """Sequence-packing bin assignment — per-source exclusive prefix sum
    of token counts over doc_id order, bin = prefix // 2048 (the window
    / running-total operator family Ray Data lacks natively).  Two-pass
    distributed scan: slim (source, chunk) token totals -> broadcast
    chunk offsets -> ONE bucket exchange on hash(source, chunk) with
    per-task rows bounded by the chunk size regardless of source skew
    (stages/packing.py)."""
    from ..stages.packing import assign_pack_bins

    ds = _rp(sf_dir, "documents", columns=["doc_id", "source", "text"])

    def toks(b: pd.DataFrame) -> np.ndarray:
        return b["text"].str.count(r"\S+").to_numpy(dtype="int64")

    out = assign_pack_bins(ds, "doc_id", "source", toks,
                           bin_size=2048, chunk_rows=100)
    return out


SQL_Q43 = r"""
SELECT doc_id, source,
       len(regexp_extract_all(text, '\S+'))::BIGINT AS n_toks,
       ((SUM(len(regexp_extract_all(text, '\S+')))
           OVER (PARTITION BY source ORDER BY doc_id
                 ROWS UNBOUNDED PRECEDING)
         - len(regexp_extract_all(text, '\S+'))) // 2048)::BIGINT AS pack_bin
FROM documents
"""


def q44_repetition_stats(sf_dir: str):
    """Gopher-style repetition screening: per-document word totals,
    distinct-word counts and the top word's frequency (the
    most-common-word-fraction filter of web-corpus curation).  Fully
    vectorized per batch — repeat/concatenate explode, ONE pandas
    double groupby — and zero exchange: every document's words live in
    its own row, so the stats never leave the batch."""
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])

    def f(b: pd.DataFrame) -> pd.DataFrame:
        parts = b["text"].astype(str).str.split()
        lens = parts.str.len().to_numpy(dtype="int64")
        ex = pd.DataFrame({
            "doc_id": np.repeat(b["doc_id"].to_numpy(dtype="int64"), lens),
            "word": np.concatenate(parts.to_numpy()) if lens.sum() else
                    np.array([], dtype=object),
        })
        if ex.empty:
            return pd.DataFrame({c: np.array([], dtype="int64") for c in
                                 ["doc_id", "n_words", "n_distinct_words",
                                  "top_word_count"]})
        wc = ex.groupby(["doc_id", "word"], sort=False).size()
        g = wc.groupby(level=0, sort=False)
        tot = g.sum()
        return pd.DataFrame({
            "doc_id": tot.index.to_numpy(dtype="int64"),
            "n_words": tot.to_numpy(dtype="int64"),
            "n_distinct_words": g.size().to_numpy(dtype="int64"),
            "top_word_count": g.max().to_numpy(dtype="int64"),
        })

    return ds.map_batches(f, batch_format="pandas")


SQL_Q44 = r"""
WITH wc AS (
  SELECT doc_id, word, COUNT(*) AS c
  FROM (SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS word
        FROM documents)
  GROUP BY doc_id, word
)
SELECT doc_id, SUM(c)::BIGINT AS n_words, COUNT(*)::BIGINT AS n_distinct_words,
       MAX(c)::BIGINT AS top_word_count
FROM wc GROUP BY doc_id
"""


def q45_source_quantiles(sf_dir: str):
    """Exact per-group discrete quantiles (p50/p90 of document length
    per source) — the corpus-profiling aggregate behind length-filter
    thresholds.  Ray Data has no quantile aggregate; see
    stages/quantile.py for the histogram-combiner scale shape (the
    exchange carries distinct (source, n_chars) pairs, never rows)."""
    from ..stages.quantile import grouped_quantile_disc

    ds = _rp(sf_dir, "documents", columns=["source", "n_chars"])
    return grouped_quantile_disc(ds, "source", "n_chars",
                                 {"p50": 0.5, "p90": 0.9})


SQL_Q45 = """
SELECT source, COUNT(*)::BIGINT AS n,
       quantile_disc(n_chars, 0.5)::BIGINT AS p50,
       quantile_disc(n_chars, 0.9)::BIGINT AS p90
FROM documents GROUP BY source
"""


def q46_asof_tolerance(sf_dir: str):
    """q27's as-of join with a staleness bound: a match only counts if
    the latest order is at most 30 days older than the event (the
    feature-freshness rule of point-in-time training joins).  Same
    auto-selected broadcast/bucketed machinery — the tolerance is a
    vectorized post-filter on the searchsorted hit (broadcast path) or
    ``pd.merge_asof(tolerance=...)`` (bucketed path)."""
    from ..stages.temporal import asof_join

    orders = _rp(sf_dir, "orders",
                 columns=["o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"])
    events = _rp(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    out = asof_join(events, orders, "user_id", "ts",
                    ["o_orderkey", "o_totalprice"],
                    right_key_col="o_custkey", right_ts_col="o_orderdate",
                    tolerance_us=30 * 86_400 * 10**6)
    return out.select_columns(["event_id", "user_id", "o_orderkey", "o_totalprice"])


SQL_Q46 = """
WITH r AS (
  SELECT o_custkey, o_orderdate,
         arg_max(o_orderkey, o_orderkey) AS o_orderkey,
         arg_max(o_totalprice, o_orderkey) AS o_totalprice
  FROM orders GROUP BY 1, 2
)
SELECT e.event_id, e.user_id,
       CASE WHEN e.ts - r.o_orderdate <= INTERVAL 30 DAY
            THEN r.o_orderkey::DOUBLE END AS o_orderkey,
       CASE WHEN e.ts - r.o_orderdate <= INTERVAL 30 DAY
            THEN r.o_totalprice END AS o_totalprice
FROM events e ASOF LEFT JOIN r
  ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate
"""


def q47_posting_lists(sf_dir: str):
    """Inverted-index build: for the 50 highest-document-frequency
    tokens, the distinct-document count and the posting-list head (10
    smallest doc_ids, comma-joined).  Scale shape: per-batch distinct
    (token, doc_id) pre-dedup collapses each block before the ONE
    coarse-bucket exchange (hash(token) % 64, never the unbounded
    token key — the exact_dedup pattern); the per-token head walk is
    block-boundary numpy (the only Python loop is over distinct tokens
    in the bucket — vocabulary-sized); the final sort+limit is
    vocabulary-sized, not corpus-sized."""
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        parts = b["text"].astype(str).str.lower().str.split()
        lens = parts.str.len().to_numpy(dtype="int64")
        ex = pd.DataFrame({
            "token": np.concatenate(parts.to_numpy()) if lens.sum() else
                     np.array([], dtype=object),
            "doc_id": np.repeat(b["doc_id"].to_numpy(dtype="int64"), lens),
        })
        ex = ex.drop_duplicates(["token", "doc_id"])
        ex["_tb"] = (
            pd.util.hash_pandas_object(ex["token"], index=False).to_numpy() % 64
        ).astype("int32")
        return ex

    def per_token_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["token", "doc_id"])
        g = g.sort_values(["token", "doc_id"], kind="stable")
        toks = g["token"].to_numpy()
        ids = g["doc_id"].to_numpy(dtype="int64")
        starts = np.flatnonzero(np.r_[True, toks[1:] != toks[:-1]])
        ends = np.r_[starts[1:], len(toks)]
        heads = [",".join(map(str, ids[s:min(s + 10, e)]))
                 for s, e in zip(starts, ends)]
        return pd.DataFrame({"token": toks[starts],
                             "n_docs": (ends - starts).astype("int64"),
                             "head": heads})

    pairs = ds.map_batches(partial, batch_format="pandas")
    postings = pairs.groupby("_tb").map_groups(per_token_bucket,
                                               batch_format="pandas")
    return postings.sort(["n_docs", "token"], descending=[True, False]).limit(50)


SQL_Q47 = r"""
SELECT token, COUNT(DISTINCT doc_id)::BIGINT AS n_docs,
       array_to_string(list_sort(list(DISTINCT doc_id))[1:10], ',') AS head
FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS token
      FROM documents)
GROUP BY token
ORDER BY n_docs DESC, token ASC
LIMIT 50
"""


def q48_normalized_dedup(sf_dir: str):
    """Exact dedup AFTER text canonicalization (lowercase + collapse
    whitespace runs + trim) — catches the trivially-reformatted
    duplicates a raw content hash misses.  Combiner shape: each batch
    collapses to (norm-md5 -> min id, count) partials, ONE coarse-
    bucket exchange of slim hash rows, vectorized per-bucket combine;
    document text never shuffles."""
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        norm = (b["text"].astype(str).str.lower()
                .str.replace(r"\s+", " ", regex=True).str.strip())
        t = pd.DataFrame({"h": md5_hex(norm),
                          "doc_id": b["doc_id"].to_numpy(dtype="int64")})
        agg = (t.groupby("h", sort=False)
               .agg(doc_id=("doc_id", "min"), n_dups=("doc_id", "size"))
               .reset_index())
        agg["_db"] = (
            pd.util.hash_pandas_object(agg["h"], index=False).to_numpy() % 256
        ).astype("int32")
        return agg

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby("h", sort=False)
               .agg(doc_id=("doc_id", "min"), n_dups=("n_dups", "sum"))
               .reset_index())
        out["doc_id"] = out["doc_id"].astype("int64")
        out["n_dups"] = out["n_dups"].astype("int64")
        return out

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("_db").map_groups(combine, batch_format="pandas"))


SQL_Q48 = r"""
SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS h,
       MIN(doc_id)::BIGINT AS doc_id, COUNT(*)::BIGINT AS n_dups
FROM documents GROUP BY 1
"""


def q49_grouped_topk(sf_dir: str):
    """Per-(source, lang) top-3 longest documents with rank — the
    corpus-curation "best exemplars per stratum" selection.  Unlike
    q09's per-group map_groups (correct, but ships every row and pays
    Python dispatch per key), this uses the top-k SEMIGROUP combiner
    (stages/topk.py): each batch contributes at most k candidate rows
    per key to the ONE coarse-bucket exchange, so a skewed stratum
    never concentrates its rows in one task."""
    from ..stages.topk import grouped_topk

    ds = _rp(sf_dir, "documents", columns=["doc_id", "source", "lang", "n_chars"])
    return grouped_topk(ds, ["source", "lang"], "n_chars", k=3,
                        tie_cols=["doc_id"], with_rank="rnk")


SQL_Q49 = """
SELECT doc_id, source, lang, n_chars, rnk FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY source, lang
                               ORDER BY n_chars DESC, doc_id) AS rnk
  FROM documents) WHERE rnk <= 3
"""


def q50_duplicate_ngrams(sf_dir: str):
    """Per-document duplicate n-gram coverage — for every document, how
    many of its distinct word trigrams occur in at least one OTHER
    document and the covered fraction (the exact-substring-dedup
    ranking signal; stages/dedup.duplicate_ngram_stats — two slim
    (uint64, int64) exchanges, documents never shuffle)."""
    from ..stages.dedup import duplicate_ngram_stats

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    return duplicate_ngram_stats(ds, "text", "doc_id", k=3)


SQL_Q50 = r"""
WITH w AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS ws FROM documents
),
g AS (
  SELECT doc_id,
         CASE WHEN len(ws) >= 3 THEN
                list_distinct(list_transform(range(1, len(ws) - 1),
                              i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))
              WHEN len(ws) > 0 THEN [array_to_string(ws, ' ')]
              ELSE [] END AS grams
  FROM w
),
e AS (SELECT doc_id, unnest(grams) AS gram FROM g),
dup AS (SELECT gram FROM e GROUP BY gram HAVING COUNT(*) > 1),
cov AS (
  SELECT e.doc_id, COUNT(*) AS n_dup
  FROM e JOIN dup USING (gram) GROUP BY e.doc_id
)
SELECT g.doc_id,
       len(g.grams)::BIGINT AS n_grams,
       COALESCE(c.n_dup, 0)::BIGINT AS n_dup,
       CASE WHEN len(g.grams) = 0 THEN 0.0
            ELSE COALESCE(c.n_dup, 0) / len(g.grams) END AS dup_fraction
FROM g LEFT JOIN cov c USING (doc_id)
"""


def q51_chunk_documents(sf_dir: str):
    """Document chunking for embedding prep: overlapping 512-char
    windows (stride 384) with codepoint offsets, one output row per
    chunk (stages/chunk.py — pure flat-map, vectorized per chunk
    ordinal via pyarrow utf8_slice_codeunits, no exchange)."""
    from ..stages.chunk import chunk_documents

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    return chunk_documents(ds, "text", "doc_id", size=512, overlap=128)


SQL_Q51 = """
WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents
           WHERE length(text) > 0),
s AS (SELECT doc_id, text, n, unnest(range(0, n, 384)) AS st FROM d)
SELECT doc_id, (st // 384)::BIGINT AS chunk_id, st::BIGINT AS begin_at,
       LEAST(st + 512, n)::BIGINT AS end_at,
       substr(text, st::INT + 1, 512) AS chunk
FROM s
"""


def q52_weighted_sample(sf_dir: str):
    """Deterministic weighted priority sample: 20 documents per source,
    chosen by the smallest ``hash32(doc_id) / n_chars`` priority key —
    the seeded-hash form of weighted reservoir sampling (longer docs
    proportionally likelier), reproducible across engines and runs.
    Scale shape: the key is a per-batch vectorized column and the
    selection is the top-k SEMIGROUP combiner (stages/topk.py,
    ascending) — each batch contributes <= k candidates per source to
    the ONE coarse-bucket exchange, so the sample never ships the
    corpus."""
    from ..stages.topk import grouped_topk

    ds = _rp(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])

    def key(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["n_chars"] > 0].copy()
        h = md5_hex(b["doc_id"].astype("int64").astype(str))
        h32 = md5_head32(h).astype("float64")
        b["pkey"] = h32 / b["n_chars"].to_numpy(dtype="float64")
        return b

    out = grouped_topk(ds.map_batches(key, batch_format="pandas"),
                       ["source"], "pkey", k=20, tie_cols=["doc_id"],
                       with_rank="rnk", ascending=True)
    return out.drop_columns(["pkey"])


SQL_Q52 = """
SELECT doc_id, source, n_chars, rnk FROM (
  SELECT doc_id, source, n_chars,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT
                    / n_chars, doc_id) AS rnk
  FROM documents WHERE n_chars > 0) WHERE rnk <= 20
"""


def q53_tfdf_top_terms(sf_dir: str):
    """Characteristic terms per document: top-3 tokens by the rational
    TF-IDF surrogate ``score = tf * N / df`` (no log — transcendental
    kernels differ in the last ulp between engines; the RATIONAL form
    ranks identically to tf*(N/df) monotone transforms and compares
    bit-exactly against the SQL twin).

    Scale shape: per-batch vectorized (doc, term, tf) partials (a doc
    lives in one batch, so tf is complete) → ONE term-bucket exchange
    where df-per-term is counted AND joined to the rows in the same
    task (no second pass) → the grouped top-k semigroup combiner picks
    3 terms per doc.  Everything exchanged is (int64, token, int64)
    slim rows; documents never shuffle."""
    from ..stages.topk import grouped_topk

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    n_docs = estimate_rows(ds)
    assert n_docs, "parquet metadata count required"

    def tf_partial(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].astype(str).str.lower().str.split().explode()
        ids = b["doc_id"].to_numpy(dtype="int64")[
            toks.index.to_numpy(dtype="int64")]
        out = pd.DataFrame({"doc_id": ids, "term": toks.to_numpy(dtype=object)})
        out = out.dropna(subset=["term"])
        g = (out.groupby(["doc_id", "term"], sort=False).size()
             .reset_index(name="tf"))
        g["tf"] = g["tf"].astype("int64")
        g["tb"] = (pd.util.hash_pandas_object(g["term"], index=False)
                   .to_numpy() % 128).astype("int32")
        return g

    def score_bucket(g: pd.DataFrame) -> pd.DataFrame:
        _, inv, cnt = np.unique(g["term"].to_numpy(dtype=object),
                                return_inverse=True, return_counts=True)
        out = g.drop(columns=["tb"]).copy()
        out["df"] = cnt[inv].astype("int64")
        out["score"] = (out["tf"].to_numpy(dtype="float64") * float(n_docs)
                        / out["df"].to_numpy(dtype="float64"))
        return out

    scored = (ds.map_batches(tf_partial, batch_format="pandas")
              .groupby("tb").map_groups(score_bucket, batch_format="pandas"))
    return grouped_topk(scored, ["doc_id"], "score", k=3,
                        tie_cols=["term"], with_rank="rnk")


SQL_Q53 = r"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*)::BIGINT AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT term, COUNT(*)::BIGINT AS df FROM tf GROUP BY 1),
n AS (SELECT COUNT(*)::DOUBLE AS n FROM documents)
SELECT doc_id, term, tf, df, score, rnk FROM (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         tf.tf * (SELECT n FROM n) / df.df AS score,
         ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                            ORDER BY tf.tf * (SELECT n FROM n) / df.df DESC,
                                     tf.term) AS rnk
  FROM tf JOIN df USING (term))
WHERE rnk <= 3
"""


def q54_centroid_exemplars(sf_dir: str):
    """Per-label centroid exemplars: mean embedding per label, then the
    5 vectors most cosine-similar to their own label's centroid
    (stages/similarity.label_centroid_topk — tiny driver-combined
    partial sums broadcast once, vectorized cosine pass, grouped top-k
    semigroup combiner; only (label, id, rank) ints leave the pass)."""
    from ..stages.similarity import label_centroid_topk

    ds = _rp(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])
    return label_centroid_topk(ds, "vec_id", "embedding", "label", k=5)


SQL_Q54 = """
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
u AS (SELECT vec_id, label, unnest(v) AS val,
             unnest(range(1, len(v) + 1)) AS dim FROM e),
c AS (SELECT label, dim, AVG(val) AS m FROM u GROUP BY 1, 2),
s AS (
  SELECT u.vec_id, u.label,
         SUM(u.val * c.m) / (SQRT(SUM(u.val * u.val)) * SQRT(SUM(c.m * c.m))) AS cos
  FROM u JOIN c USING (label, dim)
  GROUP BY 1, 2
)
SELECT label, vec_id, rnk FROM (
  SELECT label, vec_id,
         ROW_NUMBER() OVER (PARTITION BY label ORDER BY cos DESC, vec_id) AS rnk
  FROM s) WHERE rnk <= 5
"""


def q55_funnel(sf_dir: str):
    """Ordered-funnel analysis over the event stream: users reaching
    each stage of signup -> view -> click -> purchase with strictly
    increasing timestamps (stages/temporal.funnel_counts — type-filter
    before the ONE user-bucket exchange, vectorized per-stage
    min-merge inside, (depth, n) partials out)."""
    from ..stages.temporal import funnel_counts

    ev = _rp(sf_dir, "events", columns=["ts", "user_id", "event_type"])
    return funnel_counts(ev, "user_id", "ts", "event_type",
                         ["signup", "view", "click", "purchase"])


SQL_Q55 = """
WITH s1 AS (SELECT user_id, MIN(ts) AS t FROM events
            WHERE event_type = 'signup' GROUP BY 1),
s2 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN s1 USING (user_id)
       WHERE e.event_type = 'view' AND e.ts > s1.t GROUP BY 1),
s3 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN s2 USING (user_id)
       WHERE e.event_type = 'click' AND e.ts > s2.t GROUP BY 1),
s4 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN s3 USING (user_id)
       WHERE e.event_type = 'purchase' AND e.ts > s3.t GROUP BY 1)
SELECT 1::BIGINT AS stage, 'signup' AS event_type,
       (SELECT COUNT(*) FROM s1)::BIGINT AS users
UNION ALL SELECT 2, 'view', (SELECT COUNT(*) FROM s2)
UNION ALL SELECT 3, 'click', (SELECT COUNT(*) FROM s3)
UNION ALL SELECT 4, 'purchase', (SELECT COUNT(*) FROM s4)
"""


def q56_customers_no_orders(sf_dir: str):
    """Anti join + dimension rollup: customers with NO urgent order,
    counted per nation (the NOT-EXISTS shape; TPC-H q22 flavor).
    Scale shape: the right side filters at the read and ships as
    DISTINCT KEYS only (per-batch pre-dedup), the anti filter runs
    inside hash_join's ONE key-bucket exchange (how="anti"), and the
    25-row nation dim is a broadcast lookup."""
    cust = _rp(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    okeys = _rp(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])

    def distinct_keys(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["o_orderpriority"].str.startswith("1-")]
        return pd.DataFrame({"c_custkey":
                             pd.unique(b["o_custkey"].to_numpy(dtype="int64"))})

    from ..stages.join import broadcast_lookup, hash_join

    no_orders = hash_join(
        cust, okeys.map_batches(distinct_keys, batch_format="pandas"),
        on="c_custkey", how="anti",
        rows_hint=estimate_rows(cust, okeys),
    )

    from ..stages.distinct import grouped_sum

    def nation_partial(b: pd.DataFrame) -> pd.DataFrame:
        vc = b.groupby("c_nationkey", sort=False).size()
        return pd.DataFrame({"c_nationkey": vc.index.to_numpy(),
                             "customers": vc.to_numpy(dtype="int64")})

    counts = grouped_sum(
        no_orders.map_batches(nation_partial, batch_format="pandas"),
        "c_nationkey", ["customers"], num_buckets=4)
    nat = pq.read_table(_t(sf_dir, "nation"),
                        columns=["n_nationkey", "n_name"]).to_pandas()
    out = broadcast_lookup(counts, dict(zip(nat.n_nationkey, nat.n_name)),
                           "c_nationkey", "n_name")

    def cast(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n_name": b["n_name"],
                             "customers": b["customers"].astype("int64")})

    return out.map_batches(cast, batch_format="pandas")


SQL_Q56 = """
SELECT n_name, COUNT(*)::BIGINT AS customers
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderpriority LIKE '1-%')
GROUP BY 1
"""


def q57_user_cumspend(sf_dir: str):
    """Per-user cumulative spend over time — the running-total window
    (stages/temporal.keyed_running_sum: ONE user-bucket exchange,
    vectorized sort + cumsum inside).  Values run as INTEGER CENTS so
    the cumulative sums are order-exact on both engines (the q37
    rule), divided back to 2-decimal dollars at the end."""
    from ..stages.temporal import keyed_running_sum

    ev = _rp(sf_dir, "events", columns=["event_id", "ts", "user_id", "value"])

    def cents(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["value"] = np.round(b["value"].to_numpy(dtype="float64") * 100.0)
        return b

    run = keyed_running_sum(ev.map_batches(cents, batch_format="pandas"),
                            "user_id", "ts", "event_id", "value")

    def dollars(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "event_id": b["event_id"].astype("int64"),
            "cum_value": b["run"].to_numpy(dtype="float64") / 100.0,
        })

    return run.map_batches(dollars, batch_format="pandas")


SQL_Q57 = """
SELECT event_id,
       SUM(ROUND(value * 100)::BIGINT) OVER (
         PARTITION BY user_id ORDER BY ts, event_id) / 100.0 AS cum_value
FROM events
"""


def q58_percent_rank(sf_dir: str):
    """Per-source PERCENT_RANK of document length — the
    rank-normalized quality score used to compare documents across
    strata with different length distributions
    (stages/quantile.grouped_percent_rank: histogram collapse, slim
    rank map, measured broadcast join-back with a distributed
    fallback)."""
    from ..stages.quantile import grouped_percent_rank

    ds = _rp(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])
    return grouped_percent_rank(ds, "source", "n_chars")


SQL_Q58 = """
SELECT doc_id, source, n_chars,
       PERCENT_RANK() OVER (PARTITION BY source ORDER BY n_chars) AS pct_rank
FROM documents
"""


def q59_distinct_users(sf_dir: str):
    """Exact per-group COUNT(DISTINCT) — the audience-size / vocabulary
    cardinality primitive (stages/distinct.grouped_count_distinct:
    per-batch pair dedup, pair-hash bucket exchange so hot keys spread,
    vocabulary-sized sum combine)."""
    from ..stages.distinct import grouped_count_distinct

    ds = _rp(sf_dir, "events", columns=["event_type", "user_id"])
    return grouped_count_distinct(ds, "event_type", "user_id",
                                  out_col="n_users")


SQL_Q59 = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
"""


def q60_length_token_corr(sf_dir: str):
    """Per-source Pearson correlation of document length vs token count
    — the corpus-health diagnostic for tokenizer drift
    (stages/distinct.grouped_corr: 6-double sum-combiner semigroup, no
    corpus shuffle)."""
    from ..stages.distinct import grouped_corr

    ds = _rp(sf_dir, "documents", columns=["source", "text"])

    def f(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "source": b["source"],
            "len": b["text"].str.len().astype("int64"),
            "toks": b["text"].str.count(r"\S+").astype("int64"),
        })

    return grouped_corr(ds.map_batches(f, batch_format="pandas"),
                        "source", "len", "toks")


SQL_Q60 = r"""
SELECT source,
       ROUND(CORR(length(text), len(regexp_extract_all(text, '\S+'))), 6)
         AS corr,
       COUNT(*) AS n
FROM documents GROUP BY source
"""


def q61_customer_order_profile(sf_dir: str):
    """§2.4 breadth: LEFT OUTER hash-partitioned join — order-less
    customers survive with null order columns and are profiled per
    segment alongside matched rows."""
    cust = _rp(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    orders = _rp(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    est = estimate_rows(cust, orders)
    joined = native_join(
        cust, orders.rename_columns({"o_custkey": "c_custkey"}),
        on="c_custkey", join_type="left_outer", rows_hint=est)

    def mark(b: pa.Table) -> pa.Table:
        # Arrow in/out: a pandas block here makes the downstream
        # sort-based Aggregate pathological (measured 34 s vs 5 s at
        # sf0.1 — object-dtype string blocks sort/size terribly)
        import pyarrow.compute as pc

        tp = b.column("o_totalprice")
        return pa.Table.from_pydict({
            "c_mktsegment": b.column("c_mktsegment"),
            "has_order": pc.cast(pc.is_valid(tp), pa.int64()),
            "price": pc.fill_null(tp, 0.0),
        })

    out = (joined.map_batches(mark, batch_format="pyarrow")
           .groupby("c_mktsegment")
           .aggregate(Count(alias_name="n_rows"),
                      Sum("has_order", alias_name="n_orders"),
                      Sum("price", alias_name="sum_price")))

    def r(b: pd.DataFrame) -> pd.DataFrame:
        b["n_orders"] = b["n_orders"].astype("int64")
        b["sum_price"] = b["sum_price"].round(2)
        return b

    return out.map_batches(r, batch_format="pandas")


SQL_Q61 = """
SELECT c_mktsegment, COUNT(*) AS n_rows,
       COUNT(o_orderkey) AS n_orders,
       ROUND(SUM(COALESCE(o_totalprice, 0)), 2) AS sum_price
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_mktsegment
"""


def q62_trim_outliers(sf_dir: str):
    """Quality-curation trim: drop documents outside their source's
    [p05, p95] length band, then profile what survives
    (stages/quantile.quantile_band_filter — per-group band map from the
    histogram-collapse quantile stage, measured broadcast join-back;
    the corpus streams through one filter pass, never shuffles)."""
    from ..stages.quantile import quantile_band_filter

    ds = _rp(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])
    kept = quantile_band_filter(ds, "source", "n_chars", 0.05, 0.95)
    out = kept.groupby("source").aggregate(
        Count(alias_name="kept"),
        Sum("n_chars", alias_name="kept_chars"),
        Min("n_chars", alias_name="min_len"),
        Max("n_chars", alias_name="max_len"),
    )

    def cast(b: pd.DataFrame) -> pd.DataFrame:
        for c in ("kept_chars", "min_len", "max_len"):
            b[c] = b[c].astype("int64")
        return b

    return out.map_batches(cast, batch_format="pandas")


SQL_Q62 = """
WITH bands AS (
  SELECT source,
         quantile_disc(n_chars, 0.05) AS lo,
         quantile_disc(n_chars, 0.95) AS hi
  FROM documents GROUP BY source
)
SELECT d.source, COUNT(*) AS kept, SUM(d.n_chars)::BIGINT AS kept_chars,
       MIN(d.n_chars) AS min_len, MAX(d.n_chars) AS max_len
FROM documents d JOIN bands b ON d.source = b.source
WHERE d.n_chars BETWEEN b.lo AND b.hi
GROUP BY d.source
"""


def q63_inter_event_gaps(sf_dir: str):
    """Per-user inter-event gap profile — the LAG-window diagnostic run
    before picking a session gap (stages/temporal.keyed_gap_stats: one
    key-bucket exchange, reduceat-segmented diffs, 5 ints per key out).
    All columns are integer microseconds/counts, so the comparison with
    the SQL LAG twin is order-exact even under timestamp ties."""
    from ..stages.temporal import keyed_gap_stats

    ev = _rp(sf_dir, "events", columns=["user_id", "ts"])
    return keyed_gap_stats(ev, "user_id", "ts", break_us=3_600_000_000)


SQL_Q63 = """
WITH g AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
         epoch_us(ts) - LAG(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts) AS gap
  FROM events
)
SELECT user_id, COUNT(*) AS n_events,
       MAX(ts_us) - MIN(ts_us) AS span_us,
       COALESCE(MAX(gap), 0) AS max_gap_us,
       COALESCE(SUM(CASE WHEN gap >= 3600000000 THEN 1 ELSE 0 END), 0)::BIGINT
         AS n_breaks
FROM g GROUP BY user_id
"""


def q64_modal_user(sf_dir: str):
    """Deterministic per-group MODE (most frequent value, smallest
    value on ties) — the dominant-actor summary
    (stages/distinct.grouped_mode: histogram collapse, one slim
    exchange, sort+first argmax per bucket)."""
    from ..stages.distinct import grouped_mode

    ev = _rp(sf_dir, "events", columns=["event_type", "user_id"])
    return grouped_mode(ev, "event_type", "user_id", out_col="modal_user")


SQL_Q64 = """
WITH c AS (
  SELECT event_type, user_id, COUNT(*) AS cnt
  FROM events GROUP BY event_type, user_id
), m AS (
  SELECT event_type, MAX(cnt) AS mx FROM c GROUP BY event_type
)
SELECT c.event_type, MIN(c.user_id) AS modal_user, MAX(c.cnt) AS modal_count
FROM c JOIN m ON c.event_type = m.event_type AND c.cnt = m.mx
GROUP BY c.event_type
"""


def _semantic_query_vec(dims: int = 64) -> np.ndarray:
    """Deterministic query vector shared by q65's engine and SQL twin
    (a fixed cosine ramp — no RNG, reproducible everywhere)."""
    return np.cos(np.arange(dims, dtype="float64") * 0.37) + 0.5


def q65_semantic_filter(sf_dir: str):
    """Embedding-normalize + cosine score against a broadcast query
    vector, keep the semantically-close rows — the similarity filter a
    curation pipeline runs against a topic centroid.  Pure per-batch
    numpy matmul (zero shuffle, query shipped once via closure
    capture); scores rounded to 6 before the threshold so the filter
    boundary is identical on both sides."""
    q = _semantic_query_vec()
    qn = q / np.linalg.norm(q)

    ds = _rp(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])

    def score(b: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(b["embedding"].to_numpy()).astype("float64")
        norms = np.linalg.norm(m, axis=1)
        cos = np.round((m @ qn) / np.where(norms > 0, norms, 1.0), 6)
        out = pd.DataFrame({
            "vec_id": b["vec_id"].to_numpy(dtype="int64"),
            "label": b["label"].to_numpy(dtype="int64"),
            "cos_sim": cos,
        })
        return out[out["cos_sim"] >= 0.1]

    return ds.map_batches(score, batch_format="pandas")


_Q65_VEC_SQL = "[" + ", ".join(repr(float(x)) for x in _semantic_query_vec()) + "]"

SQL_Q65 = f"""
SELECT vec_id, label::BIGINT AS label,
       ROUND(list_cosine_similarity(embedding::DOUBLE[], {_Q65_VEC_SQL}), 6)
         AS cos_sim
FROM embeddings
WHERE ROUND(list_cosine_similarity(embedding::DOUBLE[], {_Q65_VEC_SQL}), 6)
      >= 0.1
"""


def q66_hash_split(sf_dir: str):
    """Deterministic train/val/test assignment — the reproducible
    split every training pipeline needs: buckets of a stable id hash
    (md5, engine-independent) map to splits 90/5/5, profiled per
    (source, split).  Pure vectorized map + vocabulary-sized groupby —
    zero corpus shuffle."""
    ds = _rp(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        h = md5_hex(b["doc_id"].astype("int64").astype(str))
        v = md5_head32(h) % 1000
        split = np.where(v < 900, "train", np.where(v < 950, "val", "test"))
        return pd.DataFrame({"source": b["source"], "split": split,
                             "n_chars": b["n_chars"]})

    out = (ds.map_batches(assign, batch_format="pandas")
           .groupby(["source", "split"])
           .aggregate(Count(alias_name="docs"),
                      Sum("n_chars", alias_name="chars")))

    def cast(b: pd.DataFrame) -> pd.DataFrame:
        b["chars"] = b["chars"].astype("int64")
        return b

    return out.map_batches(cast, batch_format="pandas")


SQL_Q66 = """
SELECT source,
       CASE WHEN b < 900 THEN 'train' WHEN b < 950 THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS docs, SUM(n_chars)::BIGINT AS chars
FROM (SELECT source, n_chars,
             ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::BIGINT % 1000 AS b
      FROM documents)
GROUP BY source, split
"""


def q67_token_budget_mix(sf_dir: str):
    """Token-budget corpus mixing: per source, keep the largest
    documents while the running char total stays within a fixed
    allowance (stages/topk.budget_select — one key-bucket exchange of
    slim (key, id, value) rows, order-exact integer running sums),
    then profile the kept mixture."""
    from ..stages.topk import budget_select

    ds = _rp(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])
    kept = budget_select(ds, "source", "n_chars", budget=30_000,
                         id_col="doc_id")
    out = kept.groupby("source").aggregate(
        Count(alias_name="kept_docs"),
        Sum("n_chars", alias_name="kept_chars"))

    def cast(b: pd.DataFrame) -> pd.DataFrame:
        b["kept_chars"] = b["kept_chars"].astype("int64")
        return b

    return out.map_batches(cast, batch_format="pandas")


SQL_Q67 = """
WITH r AS (
  SELECT source, doc_id, n_chars,
         SUM(n_chars) OVER (PARTITION BY source
                            ORDER BY n_chars DESC, doc_id) AS run
  FROM documents)
SELECT source, COUNT(*) AS kept_docs, SUM(n_chars)::BIGINT AS kept_chars
FROM r WHERE run <= 30000 GROUP BY source
"""


def q68_leakage_matrix(sf_dir: str):
    """Cross-source contamination matrix — for every source pair, how
    many distinct documents (by a 200-char-prefix md5, the cheap
    leading-content near-dup proxy) appear in BOTH: the train/eval
    leakage audit run before a split ships.  Scale shape: per-batch
    distinct (source, fp) pre-dedup, ONE fp-bucket exchange (identical
    fps co-locate; a fp's source set is tiny), vectorized per-bucket
    self-merge to pairs, vocabulary²-sized count combine."""
    ds = _rp(sf_dir, "documents", columns=["source", "text"])
    num_buckets = 64

    def fp(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"source": b["source"],
                            "fp": md5_hex(b["text"].str.slice(0, 200))})
        out = out.drop_duplicates()
        out["_fb"] = (
            pd.util.hash_pandas_object(out["fp"], index=False).to_numpy()
            % num_buckets
        ).astype("int32")
        return out

    def pairs(g: pd.DataFrame) -> pa.Table:
        d = g[["source", "fp"]].drop_duplicates()
        m = d.merge(d, on="fp")
        m = m[m["source_x"] < m["source_y"]]
        vc = m.groupby(["source_x", "source_y"], sort=False).size()
        idx = vc.index.to_frame(index=False)
        # explicit schema: an empty bucket must still emit typed columns
        return pa.table({
            "src_a": pa.array(idx["source_x"], type=pa.string()),
            "src_b": pa.array(idx["source_y"], type=pa.string()),
            "shared": pa.array(vc.to_numpy(dtype="int64"), type=pa.int64()),
        })

    out = (ds.map_batches(fp, batch_format="pandas")
           .groupby("_fb").map_groups(pairs, batch_format="pandas")
           .groupby(["src_a", "src_b"])
           .aggregate(Sum("shared", alias_name="shared")))

    def cast(b: pd.DataFrame) -> pd.DataFrame:
        b["shared"] = b["shared"].astype("int64")
        return b

    return out.map_batches(cast, batch_format="pandas")


SQL_Q68 = """
WITH f AS (SELECT DISTINCT source, md5(substr(text, 1, 200)) AS fp
           FROM documents)
SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS shared
FROM f a JOIN f b ON a.fp = b.fp AND a.source < b.source
GROUP BY a.source, b.source
"""


def q69_zscore(sf_dir: str):
    """Per-source z-score normalization of document length — the
    cross-strata feature-scaling pass
    (stages/distinct.grouped_zscore: (n, Σx, Σx²) semigroup,
    vocabulary-sized moment map broadcast back, zero corpus
    shuffle)."""
    from ..stages.distinct import grouped_zscore

    ds = _rp(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])
    return grouped_zscore(ds, "source", "n_chars")


SQL_Q69 = """
SELECT doc_id, source, n_chars,
       ROUND((n_chars - AVG(n_chars) OVER (PARTITION BY source))
             / NULLIF(STDDEV_POP(n_chars) OVER (PARTITION BY source), 0), 6)
         AS zscore
FROM documents
"""


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q70_event_pivot(sf_dir: str):
    """Conditional-aggregate pivot: per user, one count column per
    event type (the behavioural feature vector).  Vectorized indicator
    columns inside map_batches collapse into Ray's combiner-based Sum
    — the pivot is map-side partial, the exchange carries one row per
    (block, user)."""
    ds = _rp(sf_dir, "events", columns=["user_id", "event_type"])

    def indicators(b: pd.DataFrame) -> pd.DataFrame:
        et = b["event_type"].to_numpy()
        out = pd.DataFrame({"user_id": b["user_id"].to_numpy(dtype="int64"),
                            "n_events": np.int64(1)})
        for t in _EVENT_TYPES:
            out[f"n_{t}"] = (et == t).astype("int64")
        return out.groupby("user_id", sort=False).sum().reset_index()

    from ..stages.distinct import grouped_sum

    cols = ["n_events"] + [f"n_{t}" for t in _EVENT_TYPES]
    return grouped_sum(ds.map_batches(indicators, batch_format="pandas"),
                       "user_id", cols)


SQL_Q70 = """
SELECT user_id, COUNT(*) AS n_events,
       COUNT(*) FILTER (WHERE event_type = 'click') AS n_click,
       COUNT(*) FILTER (WHERE event_type = 'error') AS n_error,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
       COUNT(*) FILTER (WHERE event_type = 'signup') AS n_signup,
       COUNT(*) FILTER (WHERE event_type = 'view') AS n_view
FROM events GROUP BY user_id
"""


def q71_lang_entropy(sf_dir: str):
    """Per-source Shannon entropy of the language distribution — the
    corpus-diversity diagnostic.  The (source, lang) histogram is
    vocabulary-sized: per-batch count partials, one tiny combine, and
    a vectorized -Σ p·log2(p) finalize; the corpus never shuffles."""
    ds = _rp(sf_dir, "documents", columns=["source", "lang"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vc = b.groupby(["source", "lang"], sort=False).size()
        out = vc.index.to_frame(index=False)
        out["cnt"] = vc.to_numpy(dtype="int64")
        return out

    hist = (ds.map_batches(partial, batch_format="pandas")
            .groupby(["source", "lang"]).aggregate(Sum("cnt", alias_name="cnt")))

    def finalize(b: pd.DataFrame) -> pd.DataFrame:
        tot = b.groupby("source")["cnt"].transform("sum").to_numpy(
            dtype="float64")
        p = b["cnt"].to_numpy(dtype="float64") / tot
        ent = pd.DataFrame({"source": b["source"], "_e": -p * np.log2(p)})
        out = ent.groupby("source", sort=False)["_e"].sum().reset_index()
        out["entropy"] = np.round(out["_e"], 6)
        return out[["source", "entropy"]]

    # the combined histogram is vocabulary-sized: finalize in one task
    def one(b: pd.DataFrame) -> pd.DataFrame:
        b["_one"] = np.int8(0)
        return b

    return (hist.map_batches(one, batch_format="pandas")
            .groupby("_one").map_groups(finalize, batch_format="pandas"))


SQL_Q71 = """
WITH h AS (SELECT source, lang, COUNT(*) AS cnt
           FROM documents GROUP BY source, lang),
     t AS (SELECT source, SUM(cnt) AS tot FROM h GROUP BY source)
SELECT h.source,
       ROUND(SUM(-(cnt / tot) * log2(cnt / tot)), 6) AS entropy
FROM h JOIN t ON h.source = t.source
GROUP BY h.source
"""


def q72_hopping_distinct_users(sf_dir: str):
    """Hopping-window DISTINCT-user counts — the streaming audience
    metric: 1 h windows every 30 min, exact distinct via the
    pair-hash-bucketed count-distinct stage (a hot window's users
    spread across buckets; q34's window-replica explode feeds
    stages/distinct.grouped_count_distinct)."""
    from ..stages.distinct import grouped_count_distinct

    size_us = 3_600_000_000
    hop_us = 1_800_000_000
    m = size_us // hop_us

    ds = _rp(sf_dir, "events", columns=["ts", "user_id"])

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        te = b["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
        wmax = te // hop_us * hop_us
        ws = np.concatenate([wmax - j * hop_us for j in range(m)])
        users = np.tile(b["user_id"].to_numpy(dtype="int64"), m)
        # per-batch pre-dedup before the stage's pair exchange
        return (pd.DataFrame({"window_start": ws, "user_id": users})
                .drop_duplicates())

    pairs = ds.map_batches(explode, batch_format="pandas")
    return grouped_count_distinct(pairs, "window_start", "user_id",
                                  out_col="n_users")


SQL_Q72 = """
SELECT w AS window_start, COUNT(DISTINCT user_id) AS n_users
FROM (
  SELECT user_id,
         unnest(generate_series(
           (epoch_us(ts) // 1800000000 - 1) * 1800000000,
           (epoch_us(ts) // 1800000000) * 1800000000,
           1800000000)) AS w
  FROM events)
GROUP BY 1
"""


def q73_retention_cohorts(sf_dir: str):
    """Retention cohort matrix — users grouped by first-seen day,
    counted per (cohort_day, active_day): the engagement decay table.
    Scale shape: per-user first-seen is a vocabulary-sized Min
    aggregate broadcast back; the distinct (cohort, day, user) count
    runs through the pair-hash-bucketed count-distinct stage (global
    dedup — a per-batch drop_duplicates alone double-counts pairs that
    recur across blocks); the final matrix is days² — tiny."""
    import ray

    from ..stages.distinct import grouped_count_distinct, grouped_reduce
    from ..stages.merge import _get_broadcast

    day_us = 86_400_000_000
    ds = _rp(sf_dir, "events", columns=["user_id", "ts"])

    def days(b: pd.DataFrame) -> pd.DataFrame:
        d = (b["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
             // day_us)
        return (pd.DataFrame({"user_id": b["user_id"].to_numpy(dtype="int64"),
                              "day": d}).drop_duplicates())

    activity = ds.map_batches(days, batch_format="pandas")
    firsts = (grouped_reduce(activity, "user_id", ["day"], how="min")
              .to_pandas().rename(columns={"day": "cohort_day"}))
    ref = ray.put(firsts)

    def tag(b: pd.DataFrame) -> pd.DataFrame:
        m = _get_broadcast(ref)
        j = b.merge(m, on="user_id", how="left")
        return pd.DataFrame({"cohort_day": j["cohort_day"].to_numpy(dtype="int64"),
                             "day": j["day"].to_numpy(dtype="int64"),
                             "user_id": j["user_id"].to_numpy(dtype="int64")})

    tagged = activity.map_batches(tag, batch_format="pandas")
    return grouped_count_distinct(tagged, ["cohort_day", "day"], "user_id",
                                  out_col="users")


SQL_Q73 = """
WITH a AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
           FROM events),
     f AS (SELECT user_id, MIN(day) AS cohort_day FROM a GROUP BY user_id)
SELECT f.cohort_day, a.day, COUNT(*) AS users
FROM a JOIN f ON a.user_id = f.user_id
GROUP BY f.cohort_day, a.day
"""


def q74_salted_join(sf_dir: str):
    """Skew-aware salted fact join: events (150 users × thousands of
    rows each — a power-law fact key) joined to the customer dimension
    with HOT KEYS SALTED across reduce tasks
    (stages/join.salted_hash_join — measured hot-key pre-pass, right
    rows replicated per salt, one (key, salt)-bucket exchange), then a
    segment rollup.  Values aggregate as integer cents so the sum is
    order-exact vs the SQL twin."""
    from ..stages.join import salted_hash_join

    ev = _rp(sf_dir, "events", columns=["user_id", "value"])

    def cents(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "c_custkey": b["user_id"].to_numpy(dtype="int64"),
            "_cents": np.round(b["value"].to_numpy(dtype="float64")
                               * 100.0).astype("int64"),
        })

    from ..stages.distinct import grouped_sum

    cust = _rp(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    joined = salted_hash_join(ev.map_batches(cents, batch_format="pandas"),
                              cust, on="c_custkey", salts=4,
                              hot_threshold_rows=50,
                              rows_hint=estimate_rows(ev, cust))

    def part(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("c_mktsegment", sort=False)["_cents"].agg(
            ["size", "sum"]).reset_index()
        return pd.DataFrame({"c_mktsegment": g["c_mktsegment"],
                             "n": g["size"].astype("int64"),
                             "_sc": g["sum"].astype("int64")})

    out = grouped_sum(joined.map_batches(part, batch_format="pandas"),
                      "c_mktsegment", ["n", "_sc"], num_buckets=4)

    def fin(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "c_mktsegment": b["c_mktsegment"],
            "n": b["n"].astype("int64"),
            "sum_value": np.round(b["_sc"].to_numpy(dtype="int64")
                                  / 100.0, 2),
        })

    return out.map_batches(fin, batch_format="pandas")


SQL_Q74 = """
SELECT c_mktsegment, COUNT(*) AS n,
       ROUND(SUM(ROUND(value * 100)::BIGINT) / 100.0, 2) AS sum_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment
"""


def q75_grouping_sets(sf_dir: str):
    """Multi-level rollup (GROUPING SETS): per (source, lang), per
    source, and the grand total in one result — three vocabulary-sized
    aggregates over ONE shared per-batch partial, unioned; the corpus
    is read and partially aggregated once, 'ALL' marks rolled-up
    levels."""
    ds = _rp(sf_dir, "documents", columns=["source", "lang", "n_chars"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        g = (b.groupby(["source", "lang"], sort=False)
             .agg(docs=("n_chars", "size"), chars=("n_chars", "sum"))
             .reset_index())
        g["docs"] = g["docs"].astype("int64")
        g["chars"] = g["chars"].astype("int64")
        return g

    from ..stages.distinct import grouped_sum

    # ONE combine to the (source, lang) level; the two rolled-up
    # levels derive from that vocabulary-sized table in a single task
    # (three separate Aggregates + a 3-way union measured 8.7 s at
    # sf0.1/32 cpus; this shape runs in ~1.5 s)
    sl = grouped_sum(ds.map_batches(partial, batch_format="pandas"),
                     ["source", "lang"], ["docs", "chars"], num_buckets=4)

    def one(b: pd.DataFrame) -> pd.DataFrame:
        b["_one"] = np.int8(0)
        return b

    def all_levels(g: pd.DataFrame) -> pd.DataFrame:
        lvl0 = g[["source", "lang", "docs", "chars"]]
        s = g.groupby("source", as_index=False)[["docs", "chars"]].sum()
        s["lang"] = "ALL"
        t = pd.DataFrame({"source": ["ALL"], "lang": ["ALL"],
                          "docs": [g["docs"].sum()],
                          "chars": [g["chars"].sum()]})
        out = pd.concat([lvl0, s[["source", "lang", "docs", "chars"]], t],
                        ignore_index=True)
        out["docs"] = out["docs"].astype("int64")
        out["chars"] = out["chars"].astype("int64")
        return out

    return (sl.map_batches(one, batch_format="pandas")
            .groupby("_one").map_groups(all_levels, batch_format="pandas"))


SQL_Q75 = """
SELECT COALESCE(source, 'ALL') AS source, COALESCE(lang, 'ALL') AS lang,
       COUNT(*) AS docs, SUM(n_chars)::BIGINT AS chars
FROM documents
GROUP BY GROUPING SETS ((source, lang), (source), ())
"""


def q76_embedding_norms(sf_dir: str):
    """Per-label embedding L2-norm profile — the normalize-readiness
    audit before cosine pipelines: per-batch vectorized norms, tiny
    (label, n, Σnorm) combine, round-6 mean."""
    ds = _rp(sf_dir, "embeddings", columns=["label", "embedding"])

    def norms(b: pd.DataFrame) -> pd.DataFrame:
        m = np.stack(b["embedding"].to_numpy()).astype("float64")
        n = np.linalg.norm(m, axis=1)
        g = pd.DataFrame({"label": b["label"].to_numpy(dtype="int64"),
                          "_n": np.int64(1), "_s": n})
        return g.groupby("label", sort=False).sum().reset_index()

    agg = (ds.map_batches(norms, batch_format="pandas")
           .groupby("label").aggregate(Sum("_n", alias_name="n"),
                                       Sum("_s", alias_name="_s")))

    def fin(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "label": b["label"].astype("int64"),
            "n": b["n"].astype("int64"),
            "avg_norm": np.round(b["_s"].to_numpy() / b["n"].to_numpy(), 6),
        })

    return agg.map_batches(fin, batch_format="pandas")


SQL_Q76 = """
SELECT label::BIGINT AS label, COUNT(*) AS n,
       ROUND(AVG(sqrt(list_aggregate(
         list_transform(embedding::DOUBLE[], x -> x * x), 'sum'))), 6)
         AS avg_norm
FROM embeddings GROUP BY label
"""


def q77_collocations(sf_dir: str):
    """Bigram collocation mining — the phrase-detection pass (word2vec
    phrases / PMI collocations) over the corpus vocabulary.  Score is
    the RATIONAL PMI surrogate ``n_xy * N * 10^6 // (n_x * n_y)`` —
    integer-exact and order-free on both engines (a log-PMI would rank
    identically but compare only to libm's last ulp).  Scale shape:
    each batch collapses to vocabulary-sized (w1, w2, cnt) partials
    (unigrams ride the same exchange as w2='' rows), ONE hash-bucket
    combine merges them, the unigram map broadcasts once via ray.put,
    and each combined block ships only its LOCAL top-20 to the final
    reduce (≤ 20 × blocks rows however large the bigram space grows).
    int64 bound: safe while n_xy * N ≤ 9.2e12 (document corpora far
    beyond that should widen to object ints in the scoring)."""
    ds = _rp(sf_dir, "documents", columns=["text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].str.lower().str.split()
        e = toks.explode().dropna()
        idx = e.index.to_numpy()
        w = e.to_numpy(dtype=object)
        uni = pd.Series(w).value_counts()
        frames = [pd.DataFrame({
            "w1": uni.index.to_numpy(dtype=object),
            "w2": "",
            "cnt": uni.to_numpy(dtype="int64"),
        })]
        if len(w) > 1:
            same = idx[:-1] == idx[1:]
            if same.any():
                bg = pd.DataFrame({"w1": w[:-1][same], "w2": w[1:][same]})
                g = bg.groupby(["w1", "w2"], sort=False).size()
                gi = g.index.to_frame(index=False)
                gi["cnt"] = g.to_numpy(dtype="int64")
                frames.append(gi)
        return pd.concat(frames, ignore_index=True)

    from ..stages.distinct import grouped_sum

    import ray

    from ..stages.merge import _get_broadcast

    hist = grouped_sum(ds.map_batches(partial, batch_format="pandas"),
                       ["w1", "w2"], ["cnt"], num_buckets=8)

    # unigram map is vocabulary-sized: materialize once, broadcast via
    # ray.put (the zscore/retention pattern); the bigram table then
    # never needs to meet in one task — each block scores its own rows
    # and ships only its local top-20, so the final reduce sees
    # ≤ 20 × blocks rows no matter how large the bigram space grows.
    # materialize() pins the combined (w1, w2, cnt) blocks so the
    # unigram filter below and score_topk share ONE execution of the
    # read+partial+combine lineage (ADVICE r4: it ran twice before)
    hist = hist.materialize()
    uni_df = (hist.filter(expr="w2 == ''").to_pandas())
    uni = uni_df.set_index("w1")["cnt"]
    n_total = int(uni.sum())
    ref = ray.put(uni)

    def score_topk(b: pd.DataFrame) -> pd.DataFrame:
        bg = b[b["w2"] != ""]
        if not len(bg):
            return pd.DataFrame({"w1": [], "w2": [],
                                 "n_xy": pd.Series([], dtype="int64"),
                                 "score": pd.Series([], dtype="int64")})
        u = _get_broadcast(ref)
        n1 = u.reindex(bg["w1"]).to_numpy(dtype="int64")
        n2 = u.reindex(bg["w2"]).to_numpy(dtype="int64")
        nxy = bg["cnt"].to_numpy(dtype="int64")
        score = nxy * n_total * 1_000_000 // (n1 * n2)
        out = pd.DataFrame({"w1": bg["w1"].to_numpy(dtype=object),
                            "w2": bg["w2"].to_numpy(dtype=object),
                            "n_xy": nxy, "score": score})
        return (out.sort_values(["score", "w1", "w2"],
                                ascending=[False, True, True],
                                kind="mergesort").head(20)
                .reset_index(drop=True))

    def one(b: pd.DataFrame) -> pd.DataFrame:
        b["_one"] = np.int8(0)
        return b

    def fin(g: pd.DataFrame) -> pd.DataFrame:
        return (g.drop(columns=["_one"])
                .sort_values(["score", "w1", "w2"],
                             ascending=[False, True, True],
                             kind="mergesort").head(20)
                .reset_index(drop=True))

    return (hist.map_batches(score_topk, batch_format="pandas")
            .map_batches(one, batch_format="pandas")
            .groupby("_one").map_groups(fin, batch_format="pandas"))


SQL_Q77 = r"""
WITH raw AS (SELECT doc_id AS doc, regexp_extract_all(lower(text), '\S+') AS l
             FROM documents),
     toks AS (SELECT doc, unnest(l) AS tok,
                     generate_subscripts(l, 1) AS pos
              FROM raw),
     uni AS (SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok),
     tot AS (SELECT SUM(n) AS n_total FROM uni),
     big AS (SELECT a.tok AS w1, b.tok AS w2, COUNT(*) AS n_xy
             FROM toks a JOIN toks b
               ON a.doc = b.doc AND b.pos = a.pos + 1
             GROUP BY 1, 2)
SELECT w1, w2, n_xy,
       ((n_xy::HUGEINT * n_total * 1000000)
        // (u1.n::HUGEINT * u2.n))::BIGINT AS score
FROM big
CROSS JOIN tot
JOIN uni u1 ON big.w1 = u1.tok
JOIN uni u2 ON big.w2 = u2.tok
ORDER BY score DESC, w1, w2
LIMIT 20
"""


def q78_full_outer_recon(sf_dir: str):
    """§2.4 breadth: FULL OUTER hash-partitioned join — the
    reconciliation audit between the event stream's per-user rollup
    and the customer dimension: matched users, event-less customers,
    and (if any) customer-less event users all survive with COALESCEd
    fill values.  The event side pre-aggregates to one slim row per
    user (integer cents) before the join, so the exchange carries
    users + customers, never events."""
    from ..stages.join import native_join

    ev = _rp(sf_dir, "events", columns=["user_id", "value"])

    def cents(b: pd.DataFrame) -> pd.DataFrame:
        # per-batch combiner: ≤ |users| slim partial rows per block
        # ever reach the combine, never full event blocks
        return pd.DataFrame({
            "user_id": b["user_id"].to_numpy(dtype="int64"),
            "n_events": np.int64(1),
            "_cents": np.round(b["value"].to_numpy(dtype="float64")
                               * 100.0).astype("int64"),
        }).groupby("user_id", sort=False).sum().reset_index()

    from ..stages.distinct import grouped_sum

    per_user = grouped_sum(ev.map_batches(cents, batch_format="pandas"),
                           "user_id", ["n_events", "_cents"])
    cust = _rp(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    est = estimate_rows(cust)
    joined = native_join(per_user, cust, on="user_id",
                         right_on="c_custkey", join_type="full_outer",
                         rows_hint=est)

    def fin(b: pa.Table) -> pa.Table:
        # Ray's right_on join emits ONE coalesced key column (user_id)
        import pyarrow.compute as pc

        uid = pc.cast(b.column("user_id"), pa.int64())
        n_ev = pc.fill_null(pc.cast(b.column("n_events"), pa.int64()), 0)
        cts = pc.fill_null(pc.cast(b.column("_cents"), pa.int64()), 0)
        nat = pc.fill_null(pc.cast(b.column("c_nationkey"), pa.int64()), -1)
        sumv = pc.round(pc.divide(pc.cast(cts, pa.float64()), 100.0),
                        ndigits=2)
        return pa.Table.from_arrays([uid, n_ev, sumv, nat],
                                    names=["uid", "n_events", "sum_value",
                                           "c_nationkey"])

    return joined.map_batches(fin, batch_format="pyarrow")


SQL_Q78 = """
WITH ev AS (SELECT user_id, COUNT(*) AS n_events,
                   SUM(ROUND(value * 100)::BIGINT) AS cents
            FROM events GROUP BY user_id)
SELECT COALESCE(ev.user_id, c.c_custkey)::BIGINT AS uid,
       COALESCE(ev.n_events, 0)::BIGINT AS n_events,
       ROUND(COALESCE(ev.cents, 0) / 100.0, 2) AS sum_value,
       COALESCE(c.c_nationkey, -1)::BIGINT AS c_nationkey
FROM ev FULL OUTER JOIN customer c ON ev.user_id = c.c_custkey
"""


def q79_shuffle_order(sf_dir: str):
    """Deterministic corpus pseudo-shuffle — every document gets its
    global training-order index (rank by (md5(id), id)), the
    reproducible shuffle a training run replays identically on any
    engine.  Distributed as a range-bucketed rank: the md5 top byte
    range-partitions the hash space, bucket counts make the exclusive
    prefix, ONE bucket exchange sorts locally and adds the offset
    (stages/packing.global_order_by_hash)."""
    from ..stages.packing import global_order_by_hash

    ds = _rp(sf_dir, "documents", columns=["doc_id"])
    return global_order_by_hash(ds, "doc_id")


SQL_Q79 = """
SELECT doc_id,
       (ROW_NUMBER() OVER (ORDER BY md5(doc_id::VARCHAR), doc_id) - 1)::BIGINT
         AS ord
FROM documents
"""


# The sensitive-term pattern set: real pipelines load these per policy
# (emails / phones / ids); the corpus-frequent stand-in terms keep the
# gate non-trivial while the email pattern exercises the real PII shape.
_REDACT_TERMS = r"\b(?:spark|query|table)\b"
# local part bounded to RFC 5321's 64 chars: with an unbounded `+`,
# Python re retries the local part from EVERY position inside a long
# local-class run with no '@' (minified JS / base64 blobs: 52 s per
# 200 KB run, quadratic); {1,64} caps per-position work at 64 chars,
# making the scan linear.  The bound is applied to BOTH engines (the
# SQL twin uses the identical pattern — RE2 supports it), so the two
# automata stay in lockstep; a lookbehind-anchor variant was tried
# and REJECTED by the randomized sweep (it mis-blocks a match that
# starts immediately after a consumed adjacent match).
_REDACT_EMAIL = r"[A-Za-z0-9._%+-]{1,64}@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"


def q80_pii_scrub(sf_dir: str):
    """PII / sensitive-term scrub — per-document pattern hit counts +
    redacted text, the compliance pass every published training corpus
    runs.  Pure vectorized regex map (compiled once per pattern by
    pandas' re cache), zero exchange; patterns are RE2-compatible so
    the DuckDB twin runs the identical automaton."""
    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])

    def scrub(b: pd.DataFrame) -> pd.DataFrame:
        t = b["text"]
        return pd.DataFrame({
            "doc_id": b["doc_id"].to_numpy(dtype="int64"),
            "n_terms": t.str.count(_REDACT_TERMS).astype("int64"),
            "n_emails": t.str.count(_REDACT_EMAIL).astype("int64"),
            "redacted": t.str.replace(_REDACT_TERMS, "<TERM>", regex=True),
        })

    return ds.map_batches(scrub, batch_format="pandas")


SQL_Q80 = r"""
SELECT doc_id,
       len(regexp_extract_all(text, '\b(?:spark|query|table)\b'))::BIGINT
         AS n_terms,
       len(regexp_extract_all(
         text, '[A-Za-z0-9._%+-]{1,64}@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))::BIGINT
         AS n_emails,
       regexp_replace(text, '\b(?:spark|query|table)\b', '<TERM>', 'g')
         AS redacted
FROM documents
"""


def q81_pixel_roundtrip(sf_dir: str):
    """Real-decoder round-trip ON THE DRIVER GATE: a deterministic
    gradient raster per doc_id (format cycles BMP 24-bit / GIF LZW /
    PNG / LOSSLESS WEBP; pixel (x,y) = (x+y+id) % 256 on every
    channel; PNG docs further split by id % 16 into plain 8-bit /
    Adam7 interlaced / 16-bit high-byte / 16-bit interlaced layouts —
    all lossless, so the twin is unchanged) is ENCODED and then
    DECODED by the pure-Python decoders
    (functions/raster.py, functions/png.py, functions/vp8l.py), and
    the decoded dimensions + integer-exact pixel
    mean (ppm) are hash-checked against a closed-form SQL twin that
    derives the same stats from the formula — no image library on
    either side, so a decoder bug (bit unpacking, row order, palette,
    LZW width growth) breaks the gate.  Docs with doc_id % 7 == 0
    emit a SECOND row (fmt='webp-lossy'): a flat-value LOSSY VP8 key
    frame (sources/synth.encode_webp_lossy_flat — bool-encoded RFC
    6386 header, one Y2-DC token, skipped MBs, loop filter live) is
    decoded through functions/vp8.py; the flat reconstruction keeps
    the mean closed-form ((298*(v-16)+128)>>8 gray via the pinned
    YUV->RGB rule).  Per-payload Python loop is the
    media pattern (each payload is an opaque byte blob), actor-scale
    parallel via map_batches."""
    from ..functions.png import decode_png
    from ..functions.raster import decode_bmp, decode_gif
    from ..functions.vp8l import decode_webp
    from ..sources.synth import encode_webp_lossy_flat, gradient_image

    ds = _rp(sf_dir, "documents", columns=["doc_id"])

    def rt(b: pd.DataFrame) -> pd.DataFrame:
        rows = {"doc_id": [], "fmt": [], "width": [], "height": [],
                "mean_ppm": []}
        for d in b["doc_id"].to_numpy(dtype="int64"):
            fmt, payload, _, _ = gradient_image(int(d))
            px = (decode_bmp(payload) if fmt == "bmp"
                  else decode_gif(payload) if fmt == "gif"
                  else decode_webp(payload) if fmt == "webp"
                  else decode_png(payload))
            h, w = px.shape[0], px.shape[1]
            s = int(px.astype(np.int64).sum())
            rows["doc_id"].append(int(d))
            rows["fmt"].append(fmt)
            rows["width"].append(w)
            rows["height"].append(h)
            rows["mean_ppm"].append(s * 1_000_000 // (w * h * 3))
            if d % 7 == 0:
                lw, lh = 16 + int(d) % 17, 16 + int(d) % 13
                lossy = encode_webp_lossy_flat(
                    int(d) % 256, lw, lh,
                    filter_level=(int(d) >> 1) % 64,
                    filter_type=(int(d) >> 2) & 1)
                px = decode_webp(lossy)
                h2, w2 = px.shape[0], px.shape[1]
                s2 = int(px.astype(np.int64).sum())
                rows["doc_id"].append(int(d))
                rows["fmt"].append("webp-lossy")
                rows["width"].append(w2)
                rows["height"].append(h2)
                rows["mean_ppm"].append(s2 * 1_000_000 // (w2 * h2 * 3))
        out = pd.DataFrame(rows)
        for c in ("width", "height", "mean_ppm"):
            out[c] = out[c].astype("int64")
        return out

    return ds.map_batches(rt, batch_format="pandas")


SQL_Q81 = """
WITH g AS (SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h
           FROM documents),
px AS (
  SELECT g.doc_id, g.w, g.h, ((xs.x + ys.y + g.doc_id) % 256)::BIGINT AS v
  FROM g,
       unnest(generate_series(0, g.w - 1)) AS xs(x),
       unnest(generate_series(0, g.h - 1)) AS ys(y))
SELECT doc_id,
       CASE doc_id % 4 WHEN 0 THEN 'bmp' WHEN 1 THEN 'gif'
            WHEN 2 THEN 'png' ELSE 'webp' END AS fmt,
       w AS width, h AS height,
       ((SUM(v) * 3 * 1000000) // (w * h * 3))::BIGINT AS mean_ppm
FROM px GROUP BY doc_id, w, h
UNION ALL
SELECT doc_id, 'webp-lossy' AS fmt,
       (16 + doc_id % 17)::BIGINT AS width,
       (16 + doc_id % 13)::BIGINT AS height,
       (LEAST(255, GREATEST(0,
           (298 * ((doc_id % 256) - 16) + 128) // 256))
        * 1000000)::BIGINT AS mean_ppm
FROM documents WHERE doc_id % 7 = 0
"""


def q82_jpeg_roundtrip(sf_dir: str):
    """Baseline-JPEG decoder ON THE DRIVER GATE (companion to q81),
    now covering SUBSAMPLED COLOR and PROGRESSIVE: even docs encode a
    block-gradient grayscale JPEG (8×8 block (i, j) = (i+j+id) % 256)
    — BASELINE (sources/synth.encode_jpeg_gray_dc) when id % 16 == 0,
    HIERARCHICAL (DHP, T.81 Annex J — the full three-frame pyramid
    through sources/synth.encode_jpeg_hierarchical: lossless first
    frame, EXP reference doubling, differential DCT, differential
    lossless; Huffman SOF3/5/7 or arithmetic SOF11/13/15 frames
    alternating by id//16 — reconstruction is EXACT, so the same
    closed-form pixels apply) when id % 16 == 8,
    PROGRESSIVE (SOF2, the full Annex-G scan script through
    sources/synth.encode_jpeg_progressive with the same DC-only
    coefficients, so pixels stay closed-form) when id % 8 == 2,
    ARITHMETIC (SOF9 through the T.81 Annex D QM-coder path,
    sources/synth.encode_jpeg_arith, same DC-only coefficients) when
    id % 8 == 6, ARITHMETIC PROGRESSIVE (SOF10 — the full Annex-G
    scan script with QM-coded DC first/refine + banded AC scans,
    sources/synth.encode_jpeg_arith_progressive, same DC-only
    coefficients) when id % 16 == 10, and
    LOSSLESS (T.81 Annex H, a PER-PIXEL gradient — the one
    mode where arbitrary pixels round-trip exactly — with predictor
    1-7 and point transform cycling by id) when id % 8 == 4:
    Huffman SOF3 (sources/synth.encode_jpeg_lossless) on
    id % 16 == 4, ARITHMETIC SOF11 (the Annex H Da/Db-conditioned
    QM model, sources/synth.encode_jpeg_arith_lossless) on
    id % 16 == 12; odd docs encode a DC-only
    YCbCr JPEG at 4:2:0 (id % 4 == 1) or 4:2:2 (id % 4 == 3) chroma
    sampling with CROPPED frame dims (partial-MCU path,
    sources/synth.encode_jpeg_color_dc).  Every payload is DECODED by
    the pure-Python Huffman + IDCT decoder (functions/jpeg.py) — MCU
    walk per T.81 §A.2.3, pinned replication chroma upsampling — and
    dims + the integer-exact pixel mean hash-check against a
    closed-form SQL twin that replays the block grids, the
    bit-identical float YCbCr→RGB math (explicit half-even rounding;
    no value in the 8-bit domain differs) and the crop.  A bug
    anywhere in the entropy decode, DC prediction, MCU interleave,
    upsampling anchor or IDCT breaks the gate."""
    from ..functions.jpeg import decode_jpeg, decode_jpeg_gray
    from ..sources.synth import (
        encode_jpeg_arith,
        encode_jpeg_arith_lossless,
        encode_jpeg_arith_progressive,
        encode_jpeg_color_dc,
        encode_jpeg_gray_dc,
        encode_jpeg_hierarchical,
        encode_jpeg_lossless,
        encode_jpeg_progressive,
    )

    ds = _rp(sf_dir, "documents", columns=["doc_id"])

    def rt(b: pd.DataFrame) -> pd.DataFrame:
        rows = {"doc_id": [], "kind": [], "width": [], "height": [],
                "mean_ppm": []}
        for d in b["doc_id"].to_numpy(dtype="int64"):
            d = int(d)
            if d % 8 == 4:
                # LOSSLESS: a PER-PIXEL gradient — lossless is
                # the one mode that round-trips arbitrary pixels, so
                # the gate pattern needs no block structure.  Predictor
                # and point transform cycle with the id; the entropy
                # coder alternates by id: Huffman (SOF3) on
                # id % 16 == 4, ARITHMETIC (SOF11 — the Annex H
                # Da/Db-conditioned QM model) on id % 16 == 12.
                w, h = 8 + d % 9, 8 + (d // 2) % 7
                i = np.arange(h, dtype=np.int64)[:, None]
                j = np.arange(w, dtype=np.int64)[None, :]
                img = ((i + 3 * j + d) % 256).astype(np.uint8)
                pt = (d // 8) % 2
                if d % 16 == 12:
                    payload = encode_jpeg_arith_lossless(
                        img, predictor=1 + d % 7, pt=pt)
                    kind = "gray_arith_lossless"
                else:
                    payload = encode_jpeg_lossless(
                        img, predictor=1 + d % 7, pt=pt)
                    kind = "gray_lossless"
                px = decode_jpeg_gray(payload)
                assert px.shape == (h, w)
                nch = 1
            elif d % 2 == 0:
                bx, by = 1 + d % 3, 1 + (d // 2) % 2
                i = np.arange(by, dtype=np.int64)[:, None]
                j = np.arange(bx, dtype=np.int64)[None, :]
                blocks = ((i + j + d) % 256).astype(np.uint8)
                if d % 8 == 6:  # same pixels, ARITHMETIC (SOF9) coding
                    cz = np.zeros((by, bx, 64), dtype=np.int64)
                    cz[..., 0] = 8 * (blocks.astype(np.int64) - 128)
                    payload = encode_jpeg_arith([cz])
                    kind = "gray_arith"
                elif d % 16 == 10:  # ARITHMETIC PROGRESSIVE (SOF10)
                    cz = np.zeros((by, bx, 64), dtype=np.int64)
                    cz[..., 0] = 8 * (blocks.astype(np.int64) - 128)
                    payload = encode_jpeg_arith_progressive([cz])
                    kind = "gray_arith_prog"
                elif d % 4 == 2:  # same pixels, progressive scan script
                    cz = np.zeros((by, bx, 64), dtype=np.int64)
                    cz[..., 0] = 8 * (blocks.astype(np.int64) - 128)
                    payload = encode_jpeg_progressive([cz], [(1, 1)])
                    kind = "gray_prog"
                elif d % 16 == 8:  # HIERARCHICAL (DHP, Annex J): the
                    # same pixels through the full three-frame pyramid
                    # — lossless first frame, EXP, differential DCT,
                    # differential lossless — exact reconstruction, so
                    # the closed-form twin is unchanged; entropy
                    # family alternates (SOF3/5/7 vs SOF11/13/15).
                    img = np.repeat(np.repeat(blocks, 8, axis=0),
                                    8, axis=1).astype(np.uint8)
                    payload = encode_jpeg_hierarchical(
                        img, arith=bool((d // 16) % 2))
                    kind = "gray_hier"
                else:
                    payload = encode_jpeg_gray_dc(blocks)
                    kind = "gray"
                px = decode_jpeg_gray(payload)
                h, w = px.shape
                nch = 1
            else:
                hy, vy = (2, 2) if d % 4 == 1 else (2, 1)
                mx, my = 1 + d % 3, 1 + (d // 3) % 2
                iy = np.arange(vy * my, dtype=np.int64)[:, None]
                jy = np.arange(hy * mx, dtype=np.int64)[None, :]
                ic = np.arange(my, dtype=np.int64)[:, None]
                jc = np.arange(mx, dtype=np.int64)[None, :]
                yb = (3 * iy + 5 * jy + d) % 256
                cbb = (7 * ic + 11 * jc + 2 * d) % 256
                crb = (13 * ic + 17 * jc + 3 * d) % 256
                w = 8 * hy * mx - d % 8
                h = 8 * vy * my - (d // 2) % 8
                px = decode_jpeg(encode_jpeg_color_dc(
                    yb, cbb, crb, hy, vy, w=w, h=h))
                kind = "ycbcr420" if d % 4 == 1 else "ycbcr422"
                assert px.shape == (h, w, 3)
                nch = 3
            s = int(px.astype(np.int64).sum())
            rows["doc_id"].append(d)
            rows["kind"].append(kind)
            rows["width"].append(w)
            rows["height"].append(h)
            rows["mean_ppm"].append(s * 1_000_000 // (w * h * nch))
        out = pd.DataFrame(rows)
        for c in ("doc_id", "width", "height", "mean_ppm"):
            out[c] = out[c].astype("int64")
        return out

    return ds.map_batches(rt, batch_format="pandas")


def _sql_rint(x: str) -> str:
    """DuckDB expression for round-half-to-EVEN of a double (np.rint):
    this DuckDB has no round_even(), and round() is half-away — the
    two differ exactly at .5, which the 8-bit YCbCr domain does hit
    (512 blue / 476 green combinations)."""
    f = f"floor({x})"
    return (f"CAST(CASE WHEN {x} - {f} > 0.5 THEN {f} + 1 "
            f"WHEN {x} - {f} < 0.5 THEN {f} "
            f"WHEN CAST({f} AS BIGINT) % 2 = 0 THEN {f} "
            f"ELSE {f} + 1 END AS BIGINT)")


def _sql_chan(pre: str) -> str:
    return f"GREATEST(0, LEAST(255, {_sql_rint(pre)}))"


SQL_Q82 = f"""
WITH g AS (SELECT doc_id, 1 + doc_id % 3 AS bx, 1 + (doc_id // 2) % 2 AS by
           FROM documents WHERE doc_id % 2 = 0 AND doc_id % 8 <> 4),
ll AS (SELECT doc_id, 8 + doc_id % 9 AS w, 8 + (doc_id // 2) % 7 AS h,
              (doc_id // 8) % 2 AS pt
       FROM documents WHERE doc_id % 8 = 4),
llpx AS (
  SELECT doc_id, w, h, pt,
         ((i.i + 3 * j.j + doc_id) % 256)::BIGINT AS v
  FROM ll,
       unnest(generate_series(0, h - 1)) AS i(i),
       unnest(generate_series(0, w - 1)) AS j(j)),
llrows AS (
  SELECT doc_id,
         CASE WHEN doc_id % 16 = 12 THEN 'gray_arith_lossless'
              ELSE 'gray_lossless' END AS kind,
         w::BIGINT AS width, h::BIGINT AS height,
         ((SUM(v - CASE WHEN pt = 1 THEN v % 2 ELSE 0 END) * 1000000)
          // (w * h))::BIGINT AS mean_ppm
  FROM llpx GROUP BY doc_id, w, h),
bl AS (
  SELECT g.doc_id, g.bx, g.by, ((i.i + j.j + g.doc_id) % 256)::BIGINT AS v
  FROM g,
       unnest(generate_series(0, g.by - 1)) AS i(i),
       unnest(generate_series(0, g.bx - 1)) AS j(j)),
grows AS (
  SELECT doc_id,
         CASE WHEN doc_id % 8 = 6 THEN 'gray_arith'
              WHEN doc_id % 16 = 10 THEN 'gray_arith_prog'
              WHEN doc_id % 4 = 2 THEN 'gray_prog'
              WHEN doc_id % 16 = 8 THEN 'gray_hier'
              ELSE 'gray' END AS kind,
         (bx * 8)::BIGINT AS width, (by * 8)::BIGINT AS height,
         ((SUM(v) * 64 * 1000000) // (bx * by * 64))::BIGINT AS mean_ppm
  FROM bl GROUP BY doc_id, bx, by),
c AS (SELECT doc_id AS d,
             2 AS hy,
             CASE WHEN doc_id % 4 = 1 THEN 2 ELSE 1 END AS vy,
             1 + doc_id % 3 AS mx, 1 + (doc_id // 3) % 2 AS my
      FROM documents WHERE doc_id % 2 = 1),
cdim AS (
  SELECT d, hy, vy,
         8 * hy * mx - d % 8 AS w,
         8 * vy * my - (d // 2) % 8 AS h
  FROM c),
cpx AS (
  SELECT d, w, h,
    ((3 * (y.y // 8) + 5 * (x.x // 8) + d) % 256)::DOUBLE AS yv,
    ((7 * (y.y // (8 * vy)) + 11 * (x.x // (8 * hy)) + 2 * d) % 256)::DOUBLE
        - 128.0 AS cbd,
    ((13 * (y.y // (8 * vy)) + 17 * (x.x // (8 * hy)) + 3 * d) % 256)::DOUBLE
        - 128.0 AS crd
  FROM cdim,
       unnest(generate_series(0, h - 1)) AS y(y),
       unnest(generate_series(0, w - 1)) AS x(x)),
pre AS (
  SELECT d, w, h,
    yv + CAST(1.402 AS DOUBLE) * crd AS pr,
    (yv - CAST(0.344136 AS DOUBLE) * cbd) - CAST(0.714136 AS DOUBLE) * crd
        AS pg,
    yv + CAST(1.772 AS DOUBLE) * cbd AS pb
  FROM cpx),
crows AS (
  SELECT d AS doc_id,
         CASE WHEN d % 4 = 1 THEN 'ycbcr420' ELSE 'ycbcr422' END AS kind,
         w::BIGINT AS width, h::BIGINT AS height,
         ((SUM({_sql_chan('pr')} + {_sql_chan('pg')} + {_sql_chan('pb')})
           * 1000000) // (w * h * 3))::BIGINT AS mean_ppm
  FROM pre GROUP BY d, w, h)
SELECT * FROM grows UNION ALL SELECT * FROM crows
UNION ALL SELECT * FROM llrows
"""


def q83_wav_roundtrip(sf_dir: str):
    """Audio modality ON THE DRIVER GATE (companion to q81/q82): per
    doc a deterministic oscillating waveform
    (s(t) = 2·((t·k) % 2000) − 1999, k = 613 + id % 977 — odd values,
    never zero) is ENCODED as a real RIFF/WAVE payload
    (sources/synth.encode_wav_pcm16) and DECODED by the pure-Python
    WAV reader (functions/audio.py); sample count, integer sum,
    |x|-sum and zero-crossing count hash-check against a closed-form
    LAG-window SQL twin.  The on-wire layout cycles by id % 6 —
    PCM 16/24/32-bit, IEEE float32 (k/32768 values, the pinned trunc
    rule reverses exactly), and WAVE_FORMAT_EXTENSIBLE wrapping
    PCM16/float32 — every layout decodes to the SAME integers, so the
    twin is layout-independent."""
    from ..functions.audio import decode_wav, wav_feature
    from ..sources.synth import encode_wav_pcm16

    ds = _rp(sf_dir, "documents", columns=["doc_id"])
    layouts = ("pcm16", "pcm24", "pcm32", "float32",
               "ext_pcm16", "ext_float32")

    def rt(b: pd.DataFrame) -> pd.DataFrame:
        rows = {"doc_id": [], "n_samples": [], "sum_amp": [],
                "sum_abs": [], "zero_crossings": []}
        for d in b["doc_id"].to_numpy(dtype="int64"):
            d = int(d)
            n = 64 + d % 37
            k = 613 + d % 977
            t = np.arange(n, dtype=np.int64)
            s = (2 * ((t * k) % 2000) - 1999).astype(np.int16)
            samples, _rate, _bits = decode_wav(
                encode_wav_pcm16(s, layout=layouts[d % 6]))
            f = wav_feature(samples)
            rows["doc_id"].append(d)
            for c in ("n_samples", "sum_amp", "sum_abs", "zero_crossings"):
                rows[c].append(f[c])
        out = pd.DataFrame(rows)
        for c in out.columns:
            out[c] = out[c].astype("int64")
        return out

    return ds.map_batches(rt, batch_format="pandas")


SQL_Q83 = """
WITH g AS (SELECT doc_id, 64 + doc_id % 37 AS n, 613 + doc_id % 977 AS k
           FROM documents),
s AS (SELECT g.doc_id, t.t, 2 * ((t.t * g.k) % 2000) - 1999 AS v
      FROM g, unnest(generate_series(0, g.n - 1)) AS t(t)),
x AS (SELECT doc_id, v,
             LAG(v) OVER (PARTITION BY doc_id ORDER BY t) AS pv
      FROM s)
SELECT doc_id,
       COUNT(*)::BIGINT AS n_samples,
       SUM(v)::BIGINT AS sum_amp,
       SUM(ABS(v))::BIGINT AS sum_abs,
       (COUNT(*) FILTER (WHERE pv IS NOT NULL AND pv * v < 0))::BIGINT
         AS zero_crossings
FROM x GROUP BY doc_id
"""


def q84_video_frames(sf_dir: str):
    """Video modality ON THE DRIVER GATE (completes the q81/q82/q83
    family): per doc a real MJPEG AVI (3 + id % 5 single-block JPEG
    frames, frame f's block value = (f·37 + id) % 256) is built by
    sources/synth.encode_avi_mjpeg, the RIFF container is walked and
    every 2nd frame DECODED by the pure-Python JPEG decoder
    (functions/avi.sample_mjpeg_frames); the decoded per-frame pixel
    value hash-checks against a closed-form generate_series twin.
    With this all four payload modalities (document/PDF, image, audio,
    video) run REAL decode on the gate."""
    from ..functions.avi import sample_mjpeg_frames
    from ..sources.synth import encode_avi_mjpeg, encode_jpeg_gray_dc

    ds = _rp(sf_dir, "documents", columns=["doc_id"])

    def rt(b: pd.DataFrame) -> pd.DataFrame:
        rows = {"doc_id": [], "frame_no": [], "px_val": []}
        for d in b["doc_id"].to_numpy(dtype="int64"):
            d = int(d)
            frames = [
                encode_jpeg_gray_dc(
                    np.array([[(f * 37 + d) % 256]], dtype=np.uint8))
                for f in range(3 + d % 5)
            ]
            for f_no, px in sample_mjpeg_frames(encode_avi_mjpeg(frames),
                                                every_n=2):
                s = int(px.astype(np.int64).sum())
                rows["doc_id"].append(d)
                rows["frame_no"].append(f_no)
                rows["px_val"].append(s // px.size)
        out = pd.DataFrame(rows)
        for c in out.columns:
            out[c] = out[c].astype("int64")
        return out

    return ds.map_batches(rt, batch_format="pandas")


SQL_Q84 = """
WITH g AS (SELECT doc_id, 3 + doc_id % 5 AS f FROM documents)
SELECT doc_id, t.t AS frame_no,
       ((t.t * 37 + doc_id) % 256)::BIGINT AS px_val
FROM g, unnest(generate_series(0, g.f - 1, 2)) AS t(t)
"""


def q85_resize_thumbnails(sf_dir: str):
    """Resize stage ON THE DRIVER GATE (the brief's decode / featurize
    / resize / frame-sample family): q81's gradient rasters are
    decoded and downsampled by the integer-exact nearest-neighbor rule
    ``src = (dst * src_dim) // dst_dim`` (stages/multimodal.
    resize_nearest) to a 6×5 thumbnail; the thumbnail's integer pixel
    mean hash-checks against a closed-form SQL twin that applies the
    same floor mapping to the gradient formula.  A wrong index map,
    row order or channel layout breaks the gate."""
    from ..sources.synth import gradient_image
    from ..stages.multimodal import decode_payload, resize_nearest

    ds = _rp(sf_dir, "documents", columns=["doc_id"])
    oh, ow = 6, 5

    def rt(b: pd.DataFrame) -> pd.DataFrame:
        rows = {"doc_id": [], "fmt": [], "mean_ppm": []}
        for d in b["doc_id"].to_numpy(dtype="int64"):
            d = int(d)
            fmt, payload, _, _ = gradient_image(d)
            th = resize_nearest(decode_payload(payload), oh, ow)
            s = int(th.astype(np.int64).sum())
            rows["doc_id"].append(d)
            rows["fmt"].append(fmt)
            rows["mean_ppm"].append(s * 1_000_000 // (oh * ow * 3))
        out = pd.DataFrame(rows)
        out["mean_ppm"] = out["mean_ppm"].astype("int64")
        return out

    return ds.map_batches(rt, batch_format="pandas")


SQL_Q85 = """
WITH g AS (SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h
           FROM documents),
px AS (
  SELECT g.doc_id,
         (((j.j * g.w) // 5 + (i.i * g.h) // 6 + g.doc_id) % 256)::BIGINT
           AS v
  FROM g,
       unnest(generate_series(0, 5)) AS i(i),
       unnest(generate_series(0, 4)) AS j(j))
SELECT doc_id,
       CASE doc_id % 4 WHEN 0 THEN 'bmp' WHEN 1 THEN 'gif'
            WHEN 2 THEN 'png' ELSE 'webp' END AS fmt,
       ((SUM(v) * 3 * 1000000) // (6 * 5 * 3))::BIGINT AS mean_ppm
FROM px GROUP BY doc_id
"""


def q86_cms_estimates(sf_dir: str):
    """Count-min-sketch token-frequency estimates ON THE DRIVER GATE
    (stages/sketch.cms_estimate_tokens): the 4×256 counter table is an
    order-free SUM sketch, so both engines build it bit-identically
    from the shared md5 hash and the estimates (min over rows —
    OVERcounts on collisions, never under) hash-check exactly.  Width
    16 vs a ~31-token vocabulary makes 2/3 of the estimates collide
    (measured), so the gate proves the sketch math, not just counting.
    Scale: every block reduces to ≤ 4×256 partial rows regardless of
    corpus size — the whole point of a sketch at 100 TB."""
    from ..stages.sketch import cms_estimate_tokens

    ds = _rp(sf_dir, "documents", columns=["text"])
    # width 16 on a ~31-token vocabulary: 21/31 estimates measurably
    # OVERcount at sf0.01 — the gate exercises collision behavior
    return cms_estimate_tokens(ds, "text", depth=4, width=16)


SQL_Q86 = r"""
WITH toks AS (SELECT unnest(regexp_extract_all(lower(text), '\S+')) AS t
              FROM documents),
counters AS (
  SELECT j.j, ('0x' || substr(md5(t || '#' || j.j), 1, 8))::BIGINT % 16
           AS h, COUNT(*) AS c
  FROM toks, unnest([0, 1, 2, 3]) AS j(j)
  GROUP BY 1, 2),
probe AS (SELECT DISTINCT t FROM toks)
SELECT p.t AS token, MIN(c.c)::BIGINT AS est
FROM probe p
JOIN counters c
  ON c.h = ('0x' || substr(md5(p.t || '#' || c.j), 1, 8))::BIGINT % 16
GROUP BY p.t
"""


def q87_hll_registers(sf_dir: str):
    """HyperLogLog register table for COUNT(DISTINCT l_orderkey) ON
    THE DRIVER GATE (stages/sketch.hll_registers, p=6): registers are
    order-free MAXes of an md5-derived rank, so the m=64 register
    values hash-check exactly against a bin()/ltrim leading-zero twin.
    The float estimate finalize (bias-corrected harmonic mean) is the
    consumer's one-liner over these 64 ints; the registers are the
    exact mergeable artifact a 256-node cluster would combine."""
    from ..stages.sketch import hll_registers

    ds = _rp(sf_dir, "lineitem", columns=["l_orderkey"])
    return hll_registers(ds, "l_orderkey")


SQL_Q87 = """
WITH k AS (SELECT DISTINCT l_orderkey FROM lineitem),
h AS (SELECT ('0x' || substr(md5(l_orderkey::VARCHAR), 1, 8))::BIGINT AS hv
      FROM k)
SELECT (hv % 64)::BIGINT AS bucket,
       MAX(26 - length(ltrim(bin(hv // 64), '0')) + 1)::BIGINT AS register
FROM h GROUP BY 1
"""


def q88_interleave_order(sf_dir: str):
    """Data-MIXING schedule: proportional source interleaving — every
    document's global training position such that each source appears
    ~proportionally in every prefix (q67 decides WHAT to keep, this
    decides in WHAT ORDER it is consumed).  Two range-bucketed rank
    passes (stages/packing.interleave_order): within-source
    pseudo-shuffle rank, then rank by the quantized ideal position
    ``((2r+1)<<20) // (2·n_s)``.  Hash-checked against the double
    ROW_NUMBER window twin."""
    from ..stages.packing import interleave_order

    ds = _rp(sf_dir, "documents", columns=["doc_id", "source"])
    return interleave_order(ds, "doc_id", "source")


SQL_Q88 = """
WITH r AS (SELECT doc_id, source,
                  ROW_NUMBER() OVER (PARTITION BY source
                    ORDER BY md5(doc_id::VARCHAR), doc_id) - 1 AS r,
                  COUNT(*) OVER (PARTITION BY source) AS n_s
           FROM documents)
SELECT doc_id, source,
       (ROW_NUMBER() OVER (
          ORDER BY ((2 * r + 1) * 1048576) // (2 * n_s), source, doc_id)
        - 1)::BIGINT AS ord
FROM r
"""


def q89_windowed_hll(sf_dir: str):
    """Sketch × window composition: HyperLogLog registers per hopping
    window (q34's window-replica explode feeding q87's register MAX).
    THE streaming-cardinality shape at 10¹² events — and unlike q72's
    exact count-distinct, MAX is IDEMPOTENT, so a (window, user) pair
    recurring across blocks needs no global dedup exchange at all:
    per-batch partial maxima combine associatively and that is the
    whole algorithm.  p=4 (16 registers/window) keeps the demo table
    small; hash-checked against the bin()/ltrim rho twin."""
    from ..stages.distinct import grouped_reduce

    hop_us = 1_800_000_000
    m = 2  # 1 h window / 30 min hop
    p_reg = 16  # 2^4 registers
    ds = _rp(sf_dir, "events", columns=["ts", "user_id"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        te = b["ts"].to_numpy(dtype="datetime64[us]").astype("int64")
        wmax = te // hop_us * hop_us
        ws = np.concatenate([wmax - j * hop_us for j in range(m)])
        users = np.tile(b["user_id"].to_numpy(dtype="int64"), m)
        d = (pd.DataFrame({"window_start": ws, "u": users})
             .drop_duplicates())
        h = md5_head32(md5_hex(d["u"].astype(str)))
        suffix = h // p_reg
        bl = np.zeros(len(suffix), dtype="int64")
        nz = suffix > 0
        bl[nz] = np.floor(np.log2(suffix[nz])).astype("int64") + 1
        g = pd.DataFrame({
            "window_start": d["window_start"].to_numpy(),
            "bucket": (h % p_reg).astype("int64"),
            "register": 28 - bl + 1,
        })
        return (g.groupby(["window_start", "bucket"], sort=False)
                .max().reset_index())

    return grouped_reduce(ds.map_batches(partial, batch_format="pandas"),
                          ["window_start", "bucket"], ["register"],
                          how="max", num_buckets=4)


SQL_Q89 = """
WITH e AS (SELECT user_id,
                  unnest(generate_series(
                    (epoch_us(ts) // 1800000000 - 1) * 1800000000,
                    (epoch_us(ts) // 1800000000) * 1800000000,
                    1800000000)) AS w
           FROM events),
d AS (SELECT DISTINCT w, user_id FROM e),
h AS (SELECT w, ('0x' || substr(md5(user_id::VARCHAR), 1, 8))::BIGINT AS hv
      FROM d)
SELECT w AS window_start, (hv % 16)::BIGINT AS bucket,
       MAX(28 - length(ltrim(bin(hv // 16), '0')) + 1)::BIGINT AS register
FROM h GROUP BY 1, 2
"""


def q90_link_rank(sf_dir: str):
    """ITERATIVE distributed graph scoring ON THE DRIVER GATE —
    PageRank-style link authority, the crawl-quality weighting shape
    (rank URLs by incoming-link mass before sampling a training mix;
    the CommonCrawl-style harmonic/page-rank filter).  A deterministic
    3-out-degree link graph over doc ids (dst = md5_head32(doc_id*3+j)
    % n, j in 0..2 — the synthetic twin of a real link table) runs 5
    synchronous rounds of stages/graph.link_rank: per round ONE
    co-partitioned hash join (ranks keyed src) and ONE coarse-bucket
    grouped_sum (contributions keyed dst), all INTEGER ppb arithmetic
    (floor division) so the unrolled-CTE DuckDB twin replays every
    round bit-for-bit.  Slim tables only — (node, rank) and (dst,
    contrib) int64 rows; at 10^11 URLs the loop never touches text."""
    from ..functions.textstats import md5_head32, md5_hex
    from ..stages.graph import link_rank

    docs = _rp(sf_dir, "documents", columns=["doc_id"])
    n = docs.count()  # parquet metadata count, no scan

    def edges(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].to_numpy(dtype="int64")
        src = np.repeat(ids, 3)
        key = src * 3 + np.tile(np.arange(3, dtype="int64"), len(ids))
        h = md5_head32(md5_hex(pd.Series(key).astype(str)))
        return pd.DataFrame({"src": src, "dst": h % n})

    def nodes(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": b["doc_id"].astype("int64")})

    return link_rank(docs.map_batches(edges, batch_format="pandas"),
                     docs.map_batches(nodes, batch_format="pandas"),
                     n_nodes=n, iters=5, rows_hint=3 * n)


def _q90_sql(iters: int = 5) -> str:
    """Unrolled-CTE twin of q90: the SAME integer-ppb rounds (SUM of
    r//3 inflow per dst, base + 85%·inflow//100, LEFT JOIN keeping
    no-inlink nodes) so values hash-match exactly."""
    n = "(SELECT COUNT(*) FROM documents)"
    parts = [f"""
WITH nodes AS (SELECT doc_id AS node FROM documents),
edges AS (
  SELECT node AS src,
         (('0x' || substr(md5(CAST(node * 3 + t.j AS VARCHAR)), 1, 8))::BIGINT
          % {n}) AS dst
  FROM nodes, range(3) t(j)),
r0 AS (SELECT node, (1000000000 // {n})::BIGINT AS r FROM nodes)"""]
    for i in range(1, iters + 1):
        parts.append(f""",
s{i} AS (SELECT e.dst AS node, SUM(r.r // 3)::BIGINT AS s
        FROM edges e JOIN r{i - 1} r ON r.node = e.src GROUP BY e.dst),
r{i} AS (SELECT nodes.node,
               ((15 * (1000000000 // {n})) // 100
                + (85 * COALESCE(s.s, 0)) // 100)::BIGINT AS r
        FROM nodes LEFT JOIN s{i} s ON s.node = nodes.node)""")
    parts.append(f"\nSELECT node, r AS rank_ppb FROM r{iters}")
    return "".join(parts)


SQL_Q90 = _q90_sql()


def q91_lm_perplexity(sf_dir: str):
    """CCNet-style bigram-LM quality scoring (Wenzek et al. 2020) —
    train a cheap LM on the corpus, score every document's perplexity,
    the filter large-scale pipelines run between dedup and mixing.
    stages/lm.bigram_lm_score: per-batch (w1, w2, cnt) partials →
    ONE vocabulary-sized grouped_sum (documents never shuffle), then a
    PINNED integer micro-bits LUT (floor(log2((c1+V)/(c12+1))·10⁶),
    add-one smoothing) broadcast via ray.put and a ZERO-exchange
    scoring pass — a doc's bigrams live in its own row, so per-batch
    groupby(doc) sums are final.  Above 2M distinct bigrams the LUT
    stays distributed and scoring goes through a bucket hash_join
    (equivalence-tested).  Integer sums are order-free, so the twin
    hash-matches exactly; the single float (one log2 per DISTINCT
    bigram) is floor-quantized identically on both engines."""
    from ..stages.lm import bigram_lm_score

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    return bigram_lm_score(ds, id_col="doc_id", text_col="text")


SQL_Q91 = r"""
WITH raw AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS l
             FROM documents),
     toks AS (SELECT doc_id, unnest(l) AS tok,
                     generate_subscripts(l, 1) AS pos
              FROM raw),
     v AS (SELECT COUNT(DISTINCT tok) AS v FROM toks),
     pairs AS (SELECT a.doc_id, a.tok AS w1, b.tok AS w2
               FROM toks a JOIN toks b
                 ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
     big AS (SELECT w1, w2, COUNT(*) AS c12 FROM pairs GROUP BY w1, w2),
     lefts AS (SELECT w1, SUM(c12) AS c1 FROM big GROUP BY w1),
     lut AS (SELECT big.w1, big.w2,
                    CAST(floor(log2((c1 + v) / (c12 + 1.0)) * 1000000)
                         AS BIGINT) AS ubits
             FROM big JOIN lefts ON big.w1 = lefts.w1 CROSS JOIN v)
SELECT p.doc_id,
       COUNT(*)::BIGINT AS n_bigrams,
       SUM(ubits)::BIGINT AS score_ubits,
       (SUM(ubits) // COUNT(*))::BIGINT AS avg_ubits
FROM pairs p JOIN lut ON p.w1 = lut.w1 AND p.w2 = lut.w2
GROUP BY p.doc_id
"""


def _seed_centroids(sf_dir: str, k: int) -> "np.ndarray":
    """The pinned k-means seed rule shared by q92/q98/q99 (and their
    twins' c0 CTE): the k lowest vec_ids, row-filter pushed into the
    parquet read, quantized to int64 micro-units."""
    from ..stages.kmeans import SCALE, _quantize

    tbl = pq.read_table(
        _t(sf_dir, "embeddings"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", k)],
    ).to_pandas().sort_values("vec_id")
    return _quantize(tbl["embedding"], SCALE)


def q92_kmeans(sf_dir: str):
    """ITERATIVE distributed k-means over the embedding corpus — the
    trainer that completes the ANN family (q35's IVF scorer consumes
    centroids; this is where they come from, and the generic "cluster
    the embeddings, then balance / dedup / mix per cluster" curation
    pass).  stages/kmeans.kmeans_quantized: 3 Lloyd rounds, each ONE
    streaming pass — centroids broadcast via ray.put, every batch
    assigns by exact int64 micro-unit distance (ties → lowest cid)
    and collapses to a k×(dim+1) partial, so the per-round combine
    moves blocks × k × 65 slim int rows and vectors never shuffle.
    Updates use sign-magnitude TRUNCATING division (DuckDB ``//``
    semantics; Python's floors negatives) and empty clusters keep
    their centroid, so the unrolled-CTE twin replays every round
    bit-for-bit.  Init: the k=8 lowest vec_ids (row-filter pushed
    into the parquet read)."""
    from ..stages.kmeans import kmeans_quantized

    ds = _rp(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return kmeans_quantized(ds, _seed_centroids(sf_dir, 8), iters=3)


def _kmeans_rounds_sql(k: int, iters: int) -> str:
    """The shared unrolled-Lloyd CTE body (quantized q, seed c0, then
    d/a/s/c per round) — q92 appends the centroid report, q98 appends
    the within-cluster pair scan over one extra assignment round."""
    parts = [f"""
WITH q AS (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
                  CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                       AS BIGINT) AS x
           FROM embeddings),
c0 AS (SELECT vec_id AS cid, dim, x AS c FROM q WHERE vec_id < {k})"""]
    for i in range(1, iters + 1):
        parts.append(f""",
d{i} AS (SELECT q.vec_id, c.cid,
               SUM((q.x - c.c) * (q.x - c.c)) AS dist
         FROM q JOIN c{i - 1} c ON q.dim = c.dim
         GROUP BY q.vec_id, c.cid),
a{i} AS (SELECT vec_id, cid FROM (
           SELECT vec_id, cid,
                  ROW_NUMBER() OVER (PARTITION BY vec_id
                                     ORDER BY dist, cid) AS rn
           FROM d{i}) WHERE rn = 1),
s{i} AS (SELECT a.cid, q.dim, SUM(q.x) AS sx, COUNT(*) AS n
         FROM a{i} a JOIN q ON q.vec_id = a.vec_id
         GROUP BY a.cid, q.dim),
c{i} AS (SELECT p.cid, p.dim,
                COALESCE((s.sx // s.n)::BIGINT, p.c) AS c
         FROM c{i - 1} p LEFT JOIN s{i} s
           ON s.cid = p.cid AND s.dim = p.dim)""")
    return "".join(parts)


def _q92_sql(k: int = 8, iters: int = 3) -> str:
    """Unrolled-CTE twin of q92: the SAME quantization (floor of one
    double multiply), exact integer distances with the (dist, cid)
    tie-break, toward-zero ``//`` centroid updates and keep-on-empty
    rule, so every round replays bit-for-bit."""
    parts = [_kmeans_rounds_sql(k, iters)]
    parts.append(f""",
m AS (SELECT cid, COUNT(DISTINCT vec_id) AS n_members FROM a{iters}
      GROUP BY cid)
SELECT c.cid, COALESCE(m.n_members, 0)::BIGINT AS n_members,
       c.dim, c.c::BIGINT AS cval
FROM c{iters} c LEFT JOIN m ON m.cid = c.cid""")
    return "".join(parts)


SQL_Q92 = _q92_sql()


def q93_bpe_train(sf_dir: str):
    """Distributed BPE tokenizer training — the "train the tokenizer
    on the corpus" pass of an LLM data pipeline (stages/bpe.py).  One
    streaming word-count pass (per-batch value_counts partials → one
    vocabulary-sized grouped_sum — the standard histogram trick:
    corpus size never enters the merge loop), then 10 merge rounds
    over the histogram Dataset: per-batch weighted pair counts,
    driver combine (pair space is vocabulary-sized), winning pair
    (max count, ties to the lexicographically smallest) broadcast
    into a left-greedy apply pass.  Iterative and stateful — not
    SQL-expressible — so the twin is the committed golden of the
    INDEPENDENT plain-dict trainer (tests/oracle_impl.oracle_bpe_train
    via tools/make_goldens.py --approx-sf), the q17/q23 mechanism."""
    from ..stages.bpe import bpe_train

    ds = _rp(sf_dir, "documents", columns=["text"])
    return bpe_train(ds, merges=10)


SQL_Q93 = f"""
SELECT merge_rank, lhs, rhs, pair_count
FROM read_parquet('{_GOLDEN_DIR}/q93_sf0.01.parquet')
"""


def q94_bpe_encode(sf_dir: str):
    """BPE train→APPLY over the corpus (stages/bpe.bpe_encode_counts)
    — the companion to q93: after training, the apply side never
    touches per-document strings.  Training already segmented every
    DISTINCT word, so the per-word token count is a vocabulary-sized
    LUT broadcast once via ray.put; scoring is a single ZERO-exchange
    map_batches (explode words → LUT map → per-doc sum; a doc's words
    live in its own row, so per-batch sums are final — the q91 shape).
    Output: (doc_id, n_words, n_bpe_tokens) for every document, zeros
    for wordless ones.  Twin: committed independent-oracle golden
    (tests/oracle_impl.oracle_bpe_encode), the q93 mechanism."""
    from ..stages.bpe import bpe_encode_counts

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    return bpe_encode_counts(ds, merges=10)


SQL_Q94 = f"""
SELECT doc_id, n_words, n_bpe_tokens
FROM read_parquet('{_GOLDEN_DIR}/q94_sf0.01.parquet')
"""


#: pinned BM25 gate queries — rare + mid + common df terms so the idf
#: spectrum is exercised ('dup' is the corpus's one rare token)
_Q95_QUERIES: dict[int, list[str]] = {
    1: ["dup", "key", "fast"],
    2: ["hash", "join", "merge"],
    3: ["window", "sort", "order"],
    4: ["vector", "scan", "column", "stream"],
}


def q95_bm25(sf_dir: str):
    """BM25 lexical retrieval (stages/retrieval.bm25_topk) — top-10
    documents per query for a pinned 4-query set, the first-stage
    retriever of the decontamination / targeted-curation loop (the
    embedding rerank is q20/q21/q35).  Two streaming passes, zero wide
    exchange: a vocabulary-restricted (term, df) grouped_sum with the
    corpus totals riding as sentinel rows, then a broadcast-idf scoring
    pass keeping per-batch local top-k (exact under the pinned
    (score desc, doc_id asc) order).  Arithmetic is integer-exact: with
    k1=6/5, b=3/4 each contribution is the floor division
    idf_ubits*22*T*tf // (10*T*tf + 3*T + 9*N*dl) — the twin runs the
    identical expression in HUGEINT; the only float is one log2 per
    distinct query term, floor-quantized to micro-bits on both engines
    (the q91 LUT discipline)."""
    from ..stages.retrieval import bm25_topk

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    return bm25_topk(ds, _Q95_QUERIES, k=10)


_Q95_VALUES = ", ".join(
    f"({q}, '{t}')" for q, ts in sorted(_Q95_QUERIES.items()) for t in sorted(set(ts))
)

SQL_Q95 = rf"""
WITH qt(query_id, term) AS (VALUES {_Q95_VALUES}),
     raw AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS l
             FROM documents),
     dl AS (SELECT doc_id, COALESCE(len(l), 0)::BIGINT AS dl FROM raw),
     tot AS (SELECT COUNT(*)::BIGINT AS n, COALESCE(SUM(dl), 0)::BIGINT AS t
             FROM dl),
     toks AS (SELECT doc_id, unnest(l) AS tok FROM raw),
     qtoks AS (SELECT doc_id, tok AS term FROM toks
               WHERE tok IN (SELECT term FROM qt)),
     df AS (SELECT term, COUNT(DISTINCT doc_id)::BIGINT AS df
            FROM qtoks GROUP BY term),
     idf AS (SELECT term,
                    CAST(floor(log2(1.0 + (n - df + 0.5) / (df + 0.5))
                               * 1000000) AS BIGINT) AS idf
             FROM df CROSS JOIN tot),
     tf AS (SELECT doc_id, term, COUNT(*)::BIGINT AS tf
            FROM qtoks GROUP BY doc_id, term),
     contrib AS (SELECT qt.query_id, tf.doc_id,
                        CAST((idf.idf::HUGEINT * 22 * tot.t * tf.tf)
                             // (10::HUGEINT * tot.t * tf.tf + 3 * tot.t
                                 + 9 * tot.n * dl.dl) AS BIGINT) AS c
                 FROM tf
                 JOIN idf USING (term)
                 JOIN qt ON qt.term = tf.term
                 JOIN dl ON dl.doc_id = tf.doc_id
                 CROSS JOIN tot),
     scores AS (SELECT query_id, doc_id, SUM(c)::BIGINT AS score_ubits
                FROM contrib GROUP BY query_id, doc_id),
     ranked AS (SELECT query_id, doc_id, score_ubits,
                       ROW_NUMBER() OVER (PARTITION BY query_id
                                          ORDER BY score_ubits DESC,
                                                   doc_id ASC) AS rank
                FROM scores)
SELECT query_id::BIGINT AS query_id, rank::BIGINT AS rank,
       doc_id::BIGINT AS doc_id, score_ubits
FROM ranked WHERE rank <= 10
"""


def q96_dsir(sf_dir: str):
    """DSIR importance weighting (Xie et al. 2023) — hashed-unigram
    importance ratios against the lang='en' target slice
    (stages/dsir.py).  One fixed-bucket grouped_sum (documents never
    shuffle), a 1024-entry int64 LUT broadcast via ray.put, then a
    ZERO-exchange scoring pass.  Integer-exact: the word→bucket hash
    is the q32 polynomial (8-term powers VALUES table in the twin),
    per-doc scores are order-free int sums, and the per-bucket log2
    is floor-quantized to micro-bits on both engines."""
    from ..stages.dsir import dsir_scores

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    return dsir_scores(ds, id_col="doc_id", text_col="text",
                       target_col="lang", target_value="en")


def _q96_sql(n_buckets: int = 1024) -> str:
    from ..stages.dsir import _MOD, _POWS

    pw = ", ".join(f"({j + 1}, {p}::HUGEINT)" for j, p in enumerate(_POWS))
    return rf"""
WITH pw(j, p) AS (VALUES {pw}),
raw AS (SELECT doc_id, lang, regexp_extract_all(lower(text), '\S+') AS l
        FROM documents),
tk AS (SELECT doc_id, lang, unnest(l) AS tok,
              generate_subscripts(l, 1) AS pos
       FROM raw),
hb AS (SELECT t.doc_id, t.lang,
              ((SUM(CASE WHEN pw.j <= length(t.tok)
                     THEN unicode(substr(t.tok, pw.j, 1))::HUGEINT
                     ELSE 0 END * pw.p) % {_MOD}::HUGEINT)
               % {n_buckets})::BIGINT AS bucket
       FROM tk t CROSS JOIN pw
       GROUP BY t.doc_id, t.lang, t.pos),
cnt AS (SELECT bucket,
               COUNT(*) FILTER (WHERE lang = 'en') AS ct,
               COUNT(*) AS cr
        FROM hb GROUP BY bucket),
tot AS (SELECT SUM(ct) AS tt, SUM(cr) AS tr FROM cnt),
lut AS (SELECT bucket,
               CAST(floor(log2(
                 ((ct + 1) * (tr + {n_buckets}))::DOUBLE /
                 ((cr + 1) * (tt + {n_buckets}))::DOUBLE) * 1000000)
                    AS BIGINT) AS ubits
        FROM cnt CROSS JOIN tot)
SELECT d.doc_id,
       COUNT(h.bucket)::BIGINT AS n_words,
       COALESCE(SUM(l.ubits), 0)::BIGINT AS dsir_ubits
FROM documents d
LEFT JOIN hb h ON h.doc_id = d.doc_id
LEFT JOIN lut l ON l.bucket = h.bucket
GROUP BY d.doc_id
"""


SQL_Q96 = _q96_sql()


#: pinned tagging dictionary (q97) — shared verbatim by both engines
TAG_PHRASES = [
    "table", "hash join", "row scan", "data", "query", "slow",
    "fast merge", "customer", "spark", "order data", "window",
    "value part",
]


def q97_keyword_tags(sf_dir: str):
    """Dictionary tagging (stages/tagging.py): per-document counts for
    a pinned phrase dictionary via ONE Aho-Corasick pass per document
    (automaton built once per actor — the ST2 pattern; per-batch cost
    O(bytes + matches) regardless of dictionary size).  Counts are
    pinned to per-phrase non-overlapping leftmost-greedy == Python
    ``str.count`` == the twin's replace-length formula (randomized
    equivalence sweep in tests/test_tagging.py)."""
    from ..stages.tagging import keyword_tags

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    return keyword_tags(ds, TAG_PHRASES, id_col="doc_id",
                        text_col="text", concurrency=(1, 4))


def _q97_sql() -> str:
    vals = ", ".join("('" + p.replace("'", "''") + "')" for p in TAG_PHRASES)
    return f"""
WITH ph(phrase) AS (VALUES {vals}),
d AS (SELECT doc_id, lower(text) AS t FROM documents)
SELECT doc_id, phrase,
       ((length(t) - length(replace(t, phrase, ''))) // length(phrase)
        )::BIGINT AS cnt
FROM d CROSS JOIN ph
WHERE length(t) - length(replace(t, phrase, '')) > 0
"""


SQL_Q97 = _q97_sql()


def q98_semdedup(sf_dir: str):
    """SemDeDup (Abbas et al. 2023, stages/semdedup.py): k-means
    clusters (the q92 integer-exact trainer, k=8 / 3 rounds / lowest-id
    seeds), one extra assignment pass against the FINAL centroids,
    then per-cluster exact integer cosine pair scans (τ = 0.35,
    τ² = 49/400) marking ``removed(i) ⇔ ∃ j < i in-cluster with
    cos ≥ τ``.  Vectors shuffle ONCE, keyed cid.  The twin replays
    training via the shared unrolled-Lloyd CTE plus a HUGEINT pair
    scan over the extra assignment round."""
    from ..stages.semdedup import semdedup

    ds = _rp(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return semdedup(ds, _seed_centroids(sf_dir, 8), iters=3)


def _q98_sql(k: int = 8, iters: int = 3, tau_num: int = 49,
             tau_den: int = 400) -> str:
    # one extra unrolled round: a{iters+1} is the assignment against
    # the FINAL trained centroids c{iters} (its s/c CTEs go unused)
    it = iters + 1
    rounds = _kmeans_rounds_sql(k, it)
    return rounds + f""",
nrm AS (SELECT vec_id, SUM(x * x)::HUGEINT AS n2 FROM q GROUP BY vec_id),
pr AS (SELECT a1.vec_id AS i, a2.vec_id AS j, a1.cid
       FROM a{it} a1 JOIN a{it} a2
         ON a1.cid = a2.cid AND a2.vec_id < a1.vec_id),
dp AS (SELECT pr.i, pr.j, SUM(qi.x * qj.x)::HUGEINT AS dot
       FROM pr JOIN q qi ON qi.vec_id = pr.i
               JOIN q qj ON qj.vec_id = pr.j AND qj.dim = qi.dim
       GROUP BY pr.i, pr.j),
rem AS (SELECT DISTINCT dp.i AS vec_id
        FROM dp JOIN nrm ni ON ni.vec_id = dp.i
                JOIN nrm nj ON nj.vec_id = dp.j
        WHERE dp.dot > 0
          AND dp.dot * dp.dot * {tau_den} >= {tau_num} * ni.n2 * nj.n2)
SELECT a.vec_id, a.cid::BIGINT AS cid,
       (CASE WHEN r.vec_id IS NULL THEN 0 ELSE 1 END)::BIGINT AS removed
FROM a{it} a LEFT JOIN rem r ON r.vec_id = a.vec_id
"""


SQL_Q98 = _q98_sql()


def q99_cluster_balance(sf_dir: str):
    """Cluster-balanced selection — the "cluster the corpus, then cap
    each cluster" curation pass (the balance half of the SemDeDup/
    DeepCore recipe): train k-means (the shared q92 integer-exact
    loop), assign every vector with ONE slim streaming pass
    (stages/kmeans.assign_with_distance — vectors never shuffle,
    only (id, cid, dist) int64 rows), keep the 16 closest-to-centroid
    members per cluster via grouped_topk (ties → lowest vec_id).
    The twin replays training through the shared unrolled-Lloyd CTE
    and ranks the extra assignment round's exact distances."""
    from ..stages.kmeans import assign_with_distance, kmeans_quantized
    from ..stages.topk import grouped_topk

    ds = _rp(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    cent = kmeans_quantized(ds, _seed_centroids(sf_dir, 8), iters=3)
    cmat = (cent.pivot(index="cid", columns="dim", values="cval")
            .sort_index().to_numpy().astype("int64"))
    slim = assign_with_distance(ds, cmat)
    return grouped_topk(slim, ["cid"], "dist", k=16, tie_cols=["vec_id"],
                        ascending=True, with_rank="rnk",
                        num_buckets=8)


def _q99_sql(k: int = 8, iters: int = 3, keep: int = 16) -> str:
    it = iters + 1
    rounds = _kmeans_rounds_sql(k, it)
    return rounds + f""",
ad AS (SELECT d.vec_id, d.cid, d.dist
       FROM d{it} d JOIN a{it} a ON a.vec_id = d.vec_id AND a.cid = d.cid),
rk AS (SELECT vec_id, cid, dist,
              ROW_NUMBER() OVER (PARTITION BY cid
                                 ORDER BY dist, vec_id) AS rnk
       FROM ad)
SELECT vec_id, cid::BIGINT AS cid, dist::BIGINT AS dist, rnk::BIGINT AS rnk
FROM rk WHERE rnk <= {keep}
"""


SQL_Q99 = _q99_sql()


def q100_source_temperature(sf_dir: str):
    """Temperature-scaled source mixing (stages/mixing.py) — the
    mT5/PaLM α-sampling rule at the one temperature with an EXACT
    integer form, α = 1/2: per-source weights ``isqrt(tokens_s)``
    (SQL replays isqrt as floor(sqrt) corrected by ±1 integer
    comparisons), document quotas ``budget·w // Σw``, selection =
    the quota_s first docs per source under the pinned
    ``(md5(str(doc_id)), doc_id)`` order (the q66 idiom).  One
    token-count pass + one slim grouped_topk; documents never
    shuffle."""
    from ..stages.mixing import temperature_mix

    ds = _rp(sf_dir, "documents", columns=["doc_id", "source", "text"])
    return temperature_mix(ds, budget_docs=200)


SQL_Q100 = r"""
WITH tok AS (SELECT source, SUM(len(regexp_extract_all(text, '\S+'))) AS toks
             FROM documents GROUP BY source),
s0 AS (SELECT source, toks,
              CAST(floor(sqrt(toks::DOUBLE)) AS BIGINT) AS s0
       FROM tok),
w AS (SELECT source,
             (s0 - CASE WHEN s0 * s0 > toks THEN 1 ELSE 0 END
                 + CASE WHEN (s0 + 1) * (s0 + 1) <= toks THEN 1 ELSE 0 END
              ) AS w
      FROM s0),
tw AS (SELECT SUM(w) AS sw FROM w),
q AS (SELECT source, (200 * w) // sw AS quota FROM w CROSS JOIN tw),
r AS (SELECT doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                         doc_id) AS rnk
      FROM documents)
SELECT r.doc_id, r.source, r.rnk::BIGINT AS rnk
FROM r JOIN q USING (source)
WHERE r.rnk <= q.quota
"""


def q101_duplicate_spans(sf_dir: str):
    """Duplicate-substring span detection (stages/substring.py) — the
    window-hash form of Lee et al. 2022's ExactSubstr dedup: flag
    every 16-char window whose content repeats anywhere in the corpus
    (the q32 Karp-Rabin contract, no padding), merge flagged windows
    into maximal per-document intervals, report the cut a removal
    pass would make.  One corpus-character-scale (h, cnt) grouped_sum
    + a measured broadcast/bucket-join flag pass; text never shuffles
    on the broadcast path."""
    from ..stages.substring import duplicate_span_stats

    ds = _rp(sf_dir, "documents", columns=["doc_id", "text"])
    return duplicate_span_stats(ds, id_col="doc_id", text_col="text")


# the q32 powers table (257^(16-j) mod 2^61, j = 1..16) replayed here
# with the SAME VALUES form; no padding — sub-16-char docs have no
# windows and pass through uncut via the LEFT JOIN
SQL_Q101 = f"""
WITH pw(j, p) AS (VALUES {_RFP_POWS}),
docs AS (SELECT doc_id, text, length(text) AS L FROM documents),
win AS (SELECT doc_id, unnest(generate_series(1, L - 15)) AS i
        FROM docs WHERE L >= 16),
h AS (SELECT w.doc_id, w.i,
        (SUM(unicode(substr(d.text, w.i + pw.j - 1, 1))::HUGEINT * pw.p)
         % {_RFP_MOD}::HUGEINT)::BIGINT AS hv
      FROM win w JOIN docs d USING (doc_id) CROSS JOIN pw
      GROUP BY w.doc_id, w.i),
dup AS (SELECT hv FROM h GROUP BY hv HAVING COUNT(*) > 1),
f AS (SELECT doc_id, i FROM h JOIN dup USING (hv)),
isl AS (SELECT doc_id, i,
               CASE WHEN i - LAG(i) OVER (PARTITION BY doc_id ORDER BY i)
                         < 16 THEN 0 ELSE 1 END AS b
        FROM f),
g AS (SELECT doc_id, i,
             SUM(b) OVER (PARTITION BY doc_id ORDER BY i) AS grp
      FROM isl),
iv AS (SELECT doc_id, MIN(i) AS s, MAX(i) + 16 AS e
       FROM g GROUP BY doc_id, grp),
agg AS (SELECT doc_id, SUM(e - s) AS cut, COUNT(*) AS n_spans
        FROM iv GROUP BY doc_id)
SELECT d.doc_id, d.L::BIGINT AS n_chars,
       COALESCE(agg.cut, 0)::BIGINT AS cut_chars,
       (d.L - COALESCE(agg.cut, 0))::BIGINT AS kept_chars,
       COALESCE(agg.n_spans, 0)::BIGINT AS n_cut_spans
FROM docs d LEFT JOIN agg USING (doc_id)
"""


# ===========================================================================
# registry
# ===========================================================================

QUERIES: dict[str, tuple] = {
    "q01_filter_project": (q01_filter_project, SQL_Q01),
    "q02_groupby_agg": (q02_groupby_agg, SQL_Q02),
    "q03_sort_limit": (q03_sort_limit, SQL_Q03),
    "q04_join_broadcast": (q04_join_broadcast, SQL_Q04),
    "q05_join_hash": (q05_join_hash, SQL_Q05),
    "q06_distinct": (q06_distinct, SQL_Q06),
    "q07_agg_events": (q07_agg_events, SQL_Q07),
    "q08_window_bucket": (q08_window_bucket, SQL_Q08),
    "q09_topk_per_group": (q09_topk_per_group, SQL_Q09),
    "q10_union": (q10_union, SQL_Q10),
    "q11_langid": (q11_langid, SQL_Q11),
    "q12_quality": (q12_quality, SQL_Q12),
    "q13_tokens_by_source": (q13_tokens_by_source, SQL_Q13),
    "q14_fingerprint": (q14_fingerprint, SQL_Q14),
    "q15_dedup_exact": (q15_dedup_exact, SQL_Q15),
    "q16_dedup_exact_text": (q16_dedup_exact_text, SQL_Q16),
    "q17_minhash_pairs": (q17_minhash_pairs, SQL_Q17),
    "q18_simhash_pairs": (q18_simhash_pairs, SQL_Q18),
    "q19_jaccard_pairs": (q19_jaccard_pairs, SQL_Q19),
    "q20_knn_bruteforce": (q20_knn_bruteforce, SQL_Q20),
    "q21_knn_lsh": (q21_knn_lsh, SQL_Q21),
    "q22_embedding_dups": (q22_embedding_dups, SQL_Q22),
    "q23_extract": (q23_extract, SQL_Q23),
    "q24_detect_spans": (q24_detect_spans, SQL_Q24),
    "q25_media_meta": (q25_media_meta, SQL_Q25),
    "q26_sessionize": (q26_sessionize, SQL_Q26),
    "q27_asof_join": (q27_asof_join, SQL_Q27),
    "q28_json_extract": (q28_json_extract, SQL_Q28),
    "q29_multijoin": (q29_multijoin, SQL_Q29),
    "q30_mixed_extract": (q30_mixed_extract, SQL_Q30),
    "q31_frame_sample": (q31_frame_sample, SQL_Q31),
    "q32_rolling_fingerprint": (q32_rolling_fingerprint, SQL_Q32),
    "q33_bpe_tokens": (q33_bpe_tokens, SQL_Q33),
    "q34_hopping_window": (q34_hopping_window, SQL_Q34),
    "q35_knn_ivf": (q35_knn_ivf, SQL_Q35),
    "q36_curation": (q36_curation, SQL_Q36),
    "q37_range_join": (q37_range_join, SQL_Q37),
    "q38_vocab_topk": (q38_vocab_topk, SQL_Q38),
    "q39_dup_clusters": (q39_dup_clusters, SQL_Q39),
    "q40_dedup_canonical": (q40_dedup_canonical, SQL_Q40),
    "q41_stratified_sample": (q41_stratified_sample, SQL_Q41),
    "q42_contamination": (q42_contamination, SQL_Q42),
    "q43_pack_bins": (q43_pack_bins, SQL_Q43),
    "q44_repetition_stats": (q44_repetition_stats, SQL_Q44),
    "q45_source_quantiles": (q45_source_quantiles, SQL_Q45),
    "q46_asof_tolerance": (q46_asof_tolerance, SQL_Q46),
    "q47_posting_lists": (q47_posting_lists, SQL_Q47),
    "q48_normalized_dedup": (q48_normalized_dedup, SQL_Q48),
    "q49_grouped_topk": (q49_grouped_topk, SQL_Q49),
    "q50_duplicate_ngrams": (q50_duplicate_ngrams, SQL_Q50),
    "q51_chunk_documents": (q51_chunk_documents, SQL_Q51),
    "q52_weighted_sample": (q52_weighted_sample, SQL_Q52),
    "q53_tfdf_top_terms": (q53_tfdf_top_terms, SQL_Q53),
    "q54_centroid_exemplars": (q54_centroid_exemplars, SQL_Q54),
    "q55_funnel": (q55_funnel, SQL_Q55),
    "q56_customers_no_orders": (q56_customers_no_orders, SQL_Q56),
    "q57_user_cumspend": (q57_user_cumspend, SQL_Q57),
    "q58_percent_rank": (q58_percent_rank, SQL_Q58),
    "q59_distinct_users": (q59_distinct_users, SQL_Q59),
    "q60_length_token_corr": (q60_length_token_corr, SQL_Q60),
    "q61_customer_order_profile": (q61_customer_order_profile, SQL_Q61),
    "q62_trim_outliers": (q62_trim_outliers, SQL_Q62),
    "q63_inter_event_gaps": (q63_inter_event_gaps, SQL_Q63),
    "q64_modal_user": (q64_modal_user, SQL_Q64),
    "q65_semantic_filter": (q65_semantic_filter, SQL_Q65),
    "q66_hash_split": (q66_hash_split, SQL_Q66),
    "q67_token_budget_mix": (q67_token_budget_mix, SQL_Q67),
    "q68_leakage_matrix": (q68_leakage_matrix, SQL_Q68),
    "q69_zscore": (q69_zscore, SQL_Q69),
    "q70_event_pivot": (q70_event_pivot, SQL_Q70),
    "q71_lang_entropy": (q71_lang_entropy, SQL_Q71),
    "q72_hopping_distinct_users": (q72_hopping_distinct_users, SQL_Q72),
    "q73_retention_cohorts": (q73_retention_cohorts, SQL_Q73),
    "q74_salted_join": (q74_salted_join, SQL_Q74),
    "q75_grouping_sets": (q75_grouping_sets, SQL_Q75),
    "q76_embedding_norms": (q76_embedding_norms, SQL_Q76),
    "q77_collocations": (q77_collocations, SQL_Q77),
    "q78_full_outer_recon": (q78_full_outer_recon, SQL_Q78),
    "q79_shuffle_order": (q79_shuffle_order, SQL_Q79),
    "q80_pii_scrub": (q80_pii_scrub, SQL_Q80),
    "q81_pixel_roundtrip": (q81_pixel_roundtrip, SQL_Q81),
    "q82_jpeg_roundtrip": (q82_jpeg_roundtrip, SQL_Q82),
    "q83_wav_roundtrip": (q83_wav_roundtrip, SQL_Q83),
    "q84_video_frames": (q84_video_frames, SQL_Q84),
    "q85_resize_thumbnails": (q85_resize_thumbnails, SQL_Q85),
    "q86_cms_estimates": (q86_cms_estimates, SQL_Q86),
    "q87_hll_registers": (q87_hll_registers, SQL_Q87),
    "q88_interleave_order": (q88_interleave_order, SQL_Q88),
    "q89_windowed_hll": (q89_windowed_hll, SQL_Q89),
    "q90_link_rank": (q90_link_rank, SQL_Q90),
    "q91_lm_perplexity": (q91_lm_perplexity, SQL_Q91),
    "q92_kmeans": (q92_kmeans, SQL_Q92),
    "q93_bpe_train": (q93_bpe_train, SQL_Q93),
    "q94_bpe_encode": (q94_bpe_encode, SQL_Q94),
    "q95_bm25": (q95_bm25, SQL_Q95),
    "q96_dsir": (q96_dsir, SQL_Q96),
    "q97_keyword_tags": (q97_keyword_tags, SQL_Q97),
    "q98_semdedup": (q98_semdedup, SQL_Q98),
    "q99_cluster_balance": (q99_cluster_balance, SQL_Q99),
    "q100_source_temperature": (q100_source_temperature, SQL_Q100),
    "q101_duplicate_spans": (q101_duplicate_spans, SQL_Q101),
}
