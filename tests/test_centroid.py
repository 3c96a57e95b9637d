"""label_centroid_topk (stages/similarity.py): ranks must agree with a
direct numpy mean+cosine reference, partial sums must combine across
blocks exactly (one label split over many blocks), and only int columns
leave the stage."""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from rust_paddle_ocr_ray.stages.similarity import label_centroid_topk


def _mk(n=200, d=16, labels=4, seed=6):
    rng = np.random.RandomState(seed)
    centers = rng.randn(labels, d) * 3
    lab = rng.randint(0, labels, n)
    mat = centers[lab] + rng.randn(n, d)
    return pd.DataFrame({
        "vec_id": np.arange(n, dtype="int64"),
        "label": lab.astype("int32"),
        "embedding": [r.astype("float32") for r in mat],
    })


def _reference(df: pd.DataFrame, k: int) -> pd.DataFrame:
    rows = []
    for lab, g in df.groupby("label"):
        m = np.stack(g.embedding.to_numpy()).astype(np.float64)
        c = m.mean(axis=0)
        cos = (m @ c) / (np.linalg.norm(m, axis=1) * np.linalg.norm(c))
        order = np.lexsort((g.vec_id.to_numpy(), -cos))[:k]
        for r, idx in enumerate(order, 1):
            rows.append((lab, int(g.vec_id.iloc[idx]), r))
    return (pd.DataFrame(rows, columns=["label", "vec_id", "rnk"])
            .sort_values(["label", "rnk"]).reset_index(drop=True))


def test_matches_numpy_reference(ray_session):
    df = _mk()
    got = (label_centroid_topk(rd.from_pandas(df).repartition(9),
                               "vec_id", "embedding", "label", k=5)
           .to_pandas().sort_values(["label", "rnk"]).reset_index(drop=True))
    ref = _reference(df, 5)
    got["label"] = got["label"].astype("int32")
    got["rnk"] = got["rnk"].astype("int64")
    ref["label"] = ref["label"].astype("int32")
    ref["rnk"] = ref["rnk"].astype("int64")
    pd.testing.assert_frame_equal(got[ref.columns], ref)
    assert set(got.columns) == {"label", "vec_id", "rnk"}  # no floats escape


def test_label_split_across_blocks(ray_session):
    # one label only, scattered over many blocks: partial-sum combine
    df = _mk(n=97, labels=1, seed=2)
    got = (label_centroid_topk(rd.from_pandas(df).repartition(13),
                               "vec_id", "embedding", "label", k=3)
           .to_pandas().sort_values("rnk").reset_index(drop=True))
    ref = _reference(df, 3)
    assert got.vec_id.tolist() == ref.vec_id.tolist()
