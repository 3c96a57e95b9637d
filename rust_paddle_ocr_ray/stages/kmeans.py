"""Distributed Lloyd's k-means over an embedding column in PINNED
integer arithmetic — the trainer that completes the ANN family
(stages/similarity.py holds the IVF *scorer*; this is where its
centroids come from, and the generic "cluster the corpus embeddings,
then balance / dedup / mix per cluster" pass of training-data
curation).

Exactness contract (the q90 link_rank recipe, applied to vectors):

- vectors quantize ONCE per pass to integer micro-units,
  ``x = floor(float64(e) · scale)`` — float32→float64 widening and
  one double multiply+floor are correctly-rounded identically on
  both engines;
- distances are exact int64 sums of squares (|q| ≤ 5·10⁵ micro-units
  per dim ⇒ per-dim square ≤ 10¹², ×64 dims ≤ 6.4·10¹³ — no
  overflow), assignment tie-breaks to the LOWEST centroid id
  (np.argmin's first-index rule == ``ROW_NUMBER ... ORDER BY dist,
  cid``);
- centroid updates use sign-magnitude TRUNCATING division
  ``sign(s)·(|s| // n)`` — the semantics of DuckDB's integer ``//``
  (Python's floors negatives; the mirror twin must not diverge on
  negative coordinate sums) — and an empty cluster KEEPS its previous
  centroid;
- every round is therefore bit-replayable by an unrolled-CTE DuckDB
  twin (catalog q92).

Scale shape: per round, ONE streaming pass over the vectors —
centroids broadcast via ``ray.put`` (k×dim ints), each batch
assigns vectorized (|x|² − 2x·Cᵀ + |c|² int64 matmul) and collapses
to a k×(dim+1) partial (per-centroid coordinate sums + counts), so
the per-round combine moves ``blocks × k × (dim+1)`` slim int rows
and the vectors NEVER shuffle.  ``combine="driver"`` sums the
partials in one pandas groupby on the driver (the link_rank
DRIVER_COMBINE rule: k×65 keys make an exchange pure fixed cost);
``combine="exchange"`` routes them through one
:func:`~.distinct.grouped_sum` for block counts too large for a
driver pull (~10⁶ blocks at full corpus scale) — both paths are
equivalence-tested bit-identical.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

#: micro-units per 1.0 of embedding coordinate — the quantization the
#: DuckDB twin replays (floor(CAST(v AS DOUBLE) * SCALE))
SCALE = 1_000_000

#: dim value carrying the member COUNT row in the long-form partials
#: (real dims are >= 0)
_COUNT_DIM = -1


def _quantize(col: pd.Series, scale: int) -> np.ndarray:
    return np.floor(
        np.stack(col.to_numpy()).astype("float64") * scale
    ).astype("int64")


def _dist2(x: np.ndarray, c: np.ndarray) -> np.ndarray:
    """The pinned exact-int64 squared-distance matrix (|x|² − 2x·Cᵀ +
    |c|²) — the ONE place the bit-replay arithmetic lives; _assign and
    assign_with_distance must not re-derive it."""
    return ((x * x).sum(axis=1)[:, None]
            - 2 * (x @ c.T)
            + (c * c).sum(axis=1)[None, :])


def _assign(x: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Exact int64 squared-distance argmin; ties take the lowest cid
    (np.argmin returns the first minimum)."""
    return np.argmin(_dist2(x, c), axis=1)


def _trunc_div(s: np.ndarray, n: np.ndarray) -> np.ndarray:
    """sign(s)·(|s| // n): DuckDB's toward-zero integer division
    (Python's // floors negatives — a silent one-off per negative
    coordinate sum if used here)."""
    return np.sign(s) * (np.abs(s) // n)


def kmeans_quantized(vectors, init: np.ndarray, vec_col: str = "embedding",
                     iters: int = 3, scale: int = SCALE,
                     combine: str = "driver") -> pd.DataFrame:
    """``iters`` Lloyd rounds over ``vectors[vec_col]`` starting from
    ``init`` ((k, dim) int64 micro-unit centroids).

    Returns the final centroid table as a DataFrame of
    ``(cid, n_members, dim, cval)`` int64 rows — k×dim coordinate
    rows, ``n_members`` = the last round's assignment counts (the
    memberships that PRODUCED the final centroids; an extra counting
    pass would re-scan the corpus for no training effect)."""
    import ray

    from .merge import _get_broadcast

    if combine not in ("driver", "exchange"):
        raise ValueError(f"unknown combine mode {combine!r}")
    cents = np.asarray(init, dtype="int64")
    k, dim = cents.shape
    counts = np.zeros(k, dtype="int64")

    for _round in range(iters):
        ref = ray.put(cents)

        def partial(b: pd.DataFrame, _ref=ref) -> pd.DataFrame:
            c = _get_broadcast(_ref)
            x = _quantize(b[vec_col], scale)
            a = _assign(x, c)
            acc = np.zeros((k, dim), dtype="int64")
            np.add.at(acc, a, x)
            n = np.bincount(a, minlength=k).astype("int64")
            # long form: k×dim coordinate-sum rows + k count rows
            # (dim == _COUNT_DIM) share one (cid, dim) keyed combine
            return pd.DataFrame({
                "cid": np.concatenate([np.repeat(np.arange(k, dtype="int64"),
                                                 dim),
                                       np.arange(k, dtype="int64")]),
                "dim": np.concatenate([np.tile(np.arange(dim, dtype="int64"),
                                               k),
                                       np.full(k, _COUNT_DIM, dtype="int64")]),
                "s": np.concatenate([acc.ravel(), n]),
            })

        parts = vectors.map_batches(partial, batch_format="pandas")
        if combine == "driver":
            sums = parts.to_pandas().groupby(["cid", "dim"],
                                             as_index=False)["s"].sum()
        else:
            from .distinct import grouped_sum

            sums = grouped_sum(parts, ["cid", "dim"], ["s"],
                               num_buckets=8).to_pandas()
        counts = np.zeros(k, dtype="int64")
        cnt_rows = sums[sums["dim"] == _COUNT_DIM]
        counts[cnt_rows["cid"].to_numpy()] = cnt_rows["s"].to_numpy()
        sx = np.zeros((k, dim), dtype="int64")
        coord = sums[sums["dim"] != _COUNT_DIM]
        sx[coord["cid"].to_numpy(), coord["dim"].to_numpy()] = (
            coord["s"].to_numpy())
        nonempty = counts > 0
        new = cents.copy()  # empty clusters keep their centroid
        new[nonempty] = _trunc_div(sx[nonempty],
                                   counts[nonempty, None])
        cents = new

    return pd.DataFrame({
        "cid": np.repeat(np.arange(k, dtype="int64"), dim),
        "n_members": np.repeat(counts, dim),
        "dim": np.tile(np.arange(dim, dtype="int64"), k),
        "cval": cents.ravel(),
    })


def assign_with_distance(vectors, cmat: np.ndarray,
                         vec_col: str = "embedding",
                         id_col: str = "vec_id", scale: int = SCALE):
    """One streaming assignment pass against trained centroids: a
    Dataset of slim ``(id_col, cid, dist)`` int64 rows — ``dist`` is
    the EXACT squared micro-unit distance to the assigned centroid
    (the same int64 arithmetic as training, so a DuckDB twin's d/a
    round replays it bit-for-bit; ties → lowest cid).  The vectors
    never shuffle: this is the slim front half of any
    "cluster-then-curate" pass (balance caps, exemplar picks,
    per-cluster quotas)."""
    import ray

    from .merge import _get_broadcast

    ref = ray.put(np.ascontiguousarray(cmat.astype("int64")))

    def f(b: pd.DataFrame) -> pd.DataFrame:
        c = _get_broadcast(ref)
        x = _quantize(b[vec_col], scale)
        d2 = _dist2(x, c)
        a = np.argmin(d2, axis=1)
        return pd.DataFrame({
            id_col: b[id_col].to_numpy(dtype="int64"),
            "cid": a.astype("int64"),
            "dist": d2[np.arange(len(a)), a].astype("int64"),
        })

    return vectors.map_batches(f, batch_format="pandas")
