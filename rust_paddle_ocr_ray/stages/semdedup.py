"""SemDeDup — semantic deduplication via k-means clusters (Abbas et
al. 2023): cluster the corpus embeddings, then mark near-duplicate
vectors WITHIN each cluster, keeping the lowest id.  The pass that
removes semantically-redundant documents that exact/MinHash dedup
misses (paraphrases, templated rewrites), at a cost that never goes
all-pairs: candidate pairs exist only inside a cluster.

Shape:

1. **Train** centroids with :func:`~.kmeans.kmeans_quantized` (the
   q92 integer-exact Lloyd loop — vectors never shuffle during
   training).
2. **Assign** every vector against the FINAL centroids (one
   broadcast + one streaming pass; ties → lowest cid, the shared
   ``_assign`` rule).
3. **Co-locate by cluster**: the ONE exchange of the operator —
   vectors shuffle once, keyed cid.  Per cluster, an exact
   integer pair scan marks ``removed(i) ⇔ ∃ j < i in the same
   cluster with cos(i, j) ≥ τ``.

Exactness contract (the q92/q95 discipline):

- vectors quantize once to int64 micro-units (``floor(f64 · 10⁶)``);
- the cosine test is INTEGER: ``dot > 0 ∧ dot² · DEN ≥ NUM · |x|²·|y|²``
  with ``τ² = NUM/DEN`` exactly (τ = 0.35 → 49/400) — ``dot²``
  exceeds int64, so candidates pass a float64 PREFILTER with a 10⁻⁶
  relative margin (float64 error here is ~10⁻¹², six orders inside
  the margin) and only the survivors pay exact Python-int
  arithmetic; the DuckDB twin runs the same inequality in HUGEINT;
- "keep lowest id" is a per-pair EXISTS rule, not a transitive
  closure (stages/cluster.py owns connected components), matching
  SemDeDup's published keep-one-per-pair semantics and staying
  SQL-expressible.

Scale: per-cluster pair cost is O(m²) — real deployments size k so
clusters stay bounded (k ≈ √N); ``max_cluster`` raises LOUDLY above
the bound rather than silently stalling a worker.

No reference analog; training-data catalog (SURVEY §2.5+).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .kmeans import SCALE, _assign, _quantize, kmeans_quantized

#: τ = 0.35 ⇒ τ² = NUM/DEN exactly
TAU_NUM = 49
TAU_DEN = 400

#: per-cluster member bound — the pair scan MATERIALIZES m×m int64/
#: float64 matrices (~24·m² bytes: dot + prefilter + norm outer), so
#: the cap is a MEMORY bound, not just a wall-clock one: 10k members
#: ≈ 2.4 GB per in-flight cluster task.  Above it, raise loudly
#: (resize k — real SemDeDup deployments pick k ≈ √N exactly so
#: clusters stay this size) instead of OOM-killing a worker.
MAX_CLUSTER = 10_000


def _pair_removed(x: np.ndarray, tau_num: int, tau_den: int,
                  chunk: int = 1024) -> np.ndarray:
    """removed[i] ⇔ ∃ j < i with cos(x_i, x_j) ≥ sqrt(num/den), rows
    ordered as given (callers sort by vec_id).  Exact (module
    docstring): float64 prefilter with margin, Python-int confirm.

    The scan is CHUNKED (``chunk`` rows × all-prior columns per
    block), so peak memory is O(chunk·m), not O(m²) — at the
    MAX_CLUSTER cap that is ~0.2 GB of transient int64/float64 per
    in-flight task instead of 2.4 GB; wall-clock keeps the inherent
    O(m²·dim)."""
    m = len(x)
    removed = np.zeros(m, dtype=bool)
    if m < 2:
        return removed
    n2 = np.einsum("ij,ij->i", x, x)
    n2f = n2.astype("float64")
    tau = np.sqrt(tau_num / tau_den)
    for lo in range(1, m, chunk):
        hi = min(lo + chunk, m)
        # int64-safe: |q| ≤ 5·10⁵/dim ⇒ per-pair dot ≤ 6.4e13 (64 dims)
        dot = x[lo:hi] @ x[:hi].T
        approx = dot.astype("float64") / np.sqrt(
            np.outer(n2f[lo:hi], n2f[:hi]))
        ii, jj = np.nonzero((dot > 0) & (approx >= tau - 1e-6))
        for ic, j in zip(ii, jj):
            i = ic + lo
            if j >= i or removed[i]:
                continue
            d = int(dot[ic, j])
            if d * d * tau_den >= tau_num * int(n2[i]) * int(n2[j]):
                removed[i] = True
    return removed


def semdedup(vectors, init: np.ndarray, vec_col: str = "embedding",
             id_col: str = "vec_id", iters: int = 3, scale: int = SCALE,
             tau_num: int = TAU_NUM, tau_den: int = TAU_DEN,
             max_cluster: int = MAX_CLUSTER):
    """SemDeDup over ``vectors`` (module docstring).  ``init`` is the
    (k, dim) int64 micro-unit seed centroid matrix (the q92 rule:
    lowest ids).  Returns a Dataset of ``(id_col, cid, removed)``
    int64 rows, one per vector."""
    import ray

    import pyarrow as pa

    from .merge import _get_broadcast

    cent = kmeans_quantized(vectors, init, vec_col=vec_col, iters=iters,
                            scale=scale)
    cmat = (cent.pivot(index="cid", columns="dim", values="cval")
            .sort_index().to_numpy().astype("int64"))
    ref = ray.put(cmat)

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        c = _get_broadcast(ref)
        x = _quantize(b[vec_col], scale)
        out = pd.DataFrame({id_col: b[id_col].to_numpy(dtype="int64"),
                            "cid": _assign(x, c).astype("int64")})
        out[vec_col] = list(b[vec_col].to_numpy())
        return out

    assigned = vectors.map_batches(assign, batch_format="pandas")

    def per_cluster(g: pd.DataFrame) -> pa.Table:
        g = g.sort_values(id_col).reset_index(drop=True)
        if len(g) > max_cluster:
            raise ValueError(
                f"semdedup cluster of {len(g)} exceeds max_cluster="
                f"{max_cluster}; raise k (clusters must stay bounded)")
        x = _quantize(g[vec_col], scale)
        rem = _pair_removed(x, tau_num, tau_den)
        return pa.Table.from_pydict({
            id_col: g[id_col].to_numpy(dtype="int64"),
            "cid": g["cid"].to_numpy(dtype="int64"),
            "removed": rem.astype("int64"),
        })

    # the operator's single exchange: vectors move once, keyed cid
    return assigned.groupby("cid").map_groups(per_cluster,
                                              batch_format="pandas")
