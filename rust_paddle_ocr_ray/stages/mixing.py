"""Temperature-scaled source mixing — the multilingual/multi-source
sampling rule of mT5/PaLM-style pipelines: sample source s
proportionally to ``tokens_s^α`` with α < 1, upweighting small
sources so the mix isn't dominated by the largest crawl slice.

α is PINNED to 1/2 because that is the temperature with an EXACT
integer form: ``w_s = isqrt(tokens_s)`` (``math.isqrt`` on the Ray
side; on the SQL side ``floor(sqrt(x))`` corrected by ±1 integer
comparisons, which repairs the ≤1-ulp float error of double sqrt —
so both engines compute the identical integer).  Per-source document
quotas are then ``quota_s = budget · w_s // Σ w`` and the selected
documents are the quota_s FIRST documents of each source under the
pinned pseudo-random order ``(md5(str(doc_id)), doc_id)`` — the q66
hash-split idiom, engine-independent and reproducible.

Scale shape: ONE streaming token-count pass (per-batch partials →
a source-vocabulary-sized grouped_sum), the tiny (source, quota)
table broadcast via ray.put, then grouped_topk over slim
``(doc_id, source, h)`` rows — per block at most ``max_quota`` rows
per source survive the local stage, so the exchange carries
``≤ blocks × sources × max_quota`` slim rows and documents never
shuffle.

No reference analog; training-data catalog (SURVEY §2.5+).
"""

from __future__ import annotations

import math

import pandas as pd


def temperature_mix(docs, budget_docs: int, id_col: str = "doc_id",
                    source_col: str = "source", text_col: str = "text"):
    """Select ``quota_s = budget_docs · isqrt(tokens_s) // Σ isqrt``
    documents per source under the pinned md5 order (module
    docstring).  Returns a Dataset of ``(id_col, source_col, rnk)``
    rows — ``rnk`` is the 1-based per-source hash rank of each
    selected document."""
    import ray

    from ..functions.textstats import md5_hex
    from .distinct import grouped_sum
    from .merge import _get_broadcast
    from .topk import grouped_topk

    def tok_partial(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            source_col: b[source_col],
            "toks": b[text_col].str.count(r"\S+").astype("int64"),
        })

    tok = grouped_sum(docs.map_batches(tok_partial, batch_format="pandas"),
                      source_col, ["toks"], num_buckets=4).to_pandas()
    w = tok["toks"].map(lambda t: math.isqrt(int(t))).astype("int64")
    sw = int(w.sum())
    if sw == 0:
        raise ValueError("temperature_mix: zero tokens in every source")
    quota = {s: (budget_docs * int(wi)) // sw
             for s, wi in zip(tok[source_col], w)}
    max_q = max(quota.values())
    ref = ray.put(quota)

    def key_rows(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: b[id_col].astype("int64"),
            source_col: b[source_col],
            "h": md5_hex(b[id_col].astype("int64").astype(str)),
        })

    # the rank pass needs only (id, source): project text away so the
    # second read moves two slim columns, not the corpus
    ranked = grouped_topk(
        docs.select_columns([id_col, source_col])
            .map_batches(key_rows, batch_format="pandas"),
        [source_col], "h", k=max(max_q, 1), tie_cols=[id_col],
        ascending=True, with_rank="rnk", num_buckets=8)

    def keep(b: pd.DataFrame) -> pd.DataFrame:
        q = _get_broadcast(ref)
        lim = b[source_col].map(q).fillna(0).astype("int64")
        out = b[b["rnk"] <= lim]
        return pd.DataFrame({
            id_col: out[id_col].to_numpy(dtype="int64"),
            source_col: out[source_col].to_numpy(),
            "rnk": out["rnk"].to_numpy(dtype="int64"),
        })

    return ranked.map_batches(keep, batch_format="pandas")
