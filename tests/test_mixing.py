"""Temperature-scaled source mixing (stages/mixing.py, catalog q100).

The plain-Python oracle replays the exact isqrt weights, floor
quotas, and the pinned (md5, doc_id) per-source order.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from rust_paddle_ocr_ray.stages.mixing import temperature_mix


def _mk(n=40, sources=("a", "b", "c")):
    rng = np.random.default_rng(5)
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype="int64"),
        "source": [sources[i % len(sources)] for i in range(n)],
        "text": [" ".join(f"w{j}" for j in range(rng.integers(0, 12)))
                 for _ in range(n)],
    })


def _reference(df: pd.DataFrame, budget: int) -> pd.DataFrame:
    toks = {s: int(g["text"].str.count(r"\S+").sum())
            for s, g in df.groupby("source")}
    w = {s: math.isqrt(t) for s, t in toks.items()}
    sw = sum(w.values())
    quota = {s: budget * wi // sw for s, wi in w.items()}
    rows = []
    for s, g in df.groupby("source"):
        order = sorted(
            g["doc_id"],
            key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d))
        for rnk, d in enumerate(order[:quota[s]], 1):
            rows.append({"doc_id": d, "source": s, "rnk": rnk})
    return (pd.DataFrame(rows).sort_values(["source", "rnk"])
            .reset_index(drop=True))


def test_matches_plain_python(ray_session):
    df = _mk()
    out = (temperature_mix(rd.from_pandas(df), budget_docs=15)
           .to_pandas().sort_values(["source", "rnk"]).reset_index(drop=True))
    want = _reference(df, 15)
    pd.testing.assert_frame_equal(
        out.astype({"doc_id": "int64", "rnk": "int64"}), want)


def test_small_source_upweighted(ray_session):
    # source 'big' has 100x the tokens of 'small'; alpha=1/2 compresses
    # the quota ratio to ~10x, not 100x
    df = pd.DataFrame({
        "doc_id": np.arange(220, dtype="int64"),
        "source": ["big"] * 200 + ["small"] * 20,
        "text": (["w " * 50] * 200) + (["w " * 5] * 20),
    })
    out = temperature_mix(rd.from_pandas(df), budget_docs=110).to_pandas()
    n_big = (out["source"] == "big").sum()
    n_small = (out["source"] == "small").sum()
    # proportional (alpha=1) would give small ~1 of 110; isqrt gives ~10x more
    assert n_small >= 8
    assert n_big > n_small


def test_zero_corpus_raises(ray_session):
    df = pd.DataFrame({"doc_id": [0, 1], "source": ["a", "b"],
                       "text": ["", ""]})
    with pytest.raises(Exception, match="zero tokens"):
        temperature_mix(rd.from_pandas(df), budget_docs=5).to_pandas()
