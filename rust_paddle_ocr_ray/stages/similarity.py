"""Similarity search over an embedding column (``list<float>``).

- Brute-force cosine top-k: the query matrix is broadcast ONCE via
  ``ray.put`` and read in every task (never re-shipped per batch);
  each batch computes a numpy matmul and emits only its LOCAL top-k
  per query, so the global merge handles k*num_batches rows, not the
  corpus.
- LSH-bucketed variant (random hyperplanes): the scale path — queries
  only touch same-bucket rows; recall/cost traded via code bits.
- Embedding near-dup: cosine > tau pairs inside explicit buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..sizing import proportional_pool
from .merge import _get_broadcast


def _norm_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class BruteForceTopK:
    """Actor-pool stage: pulls the broadcast query matrix once per actor."""

    def __init__(self, queries_ref, id_col: str, vec_col: str, k: int):
        import ray

        q = ray.get(queries_ref)  # {"ids": (Q,), "mat": (Q, D)}
        self.q_ids = np.asarray(q["ids"])
        self.q_mat = _norm_rows(np.asarray(q["mat"], dtype=np.float64))
        self.id_col = id_col
        self.vec_col = vec_col
        self.k = k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[self.id_col].to_numpy()
        mat = _norm_rows(np.stack(batch[self.vec_col].to_numpy()).astype(np.float64))
        sims = self.q_mat @ mat.T  # (Q, B)
        # self-matches excluded by id, not by similarity
        out = {"query_id": [], "neighbor_id": [], "sim": []}
        k = min(self.k, mat.shape[0])
        for qi, qid in enumerate(self.q_ids):
            row = sims[qi]
            mask = ids != qid
            cand = np.flatnonzero(mask)
            if cand.size == 0:
                continue
            top = cand[np.argsort(-row[cand], kind="stable")[:k]]
            out["query_id"].extend([qid] * top.size)
            out["neighbor_id"].extend(ids[top].tolist())
            out["sim"].extend(row[top].tolist())
        return pd.DataFrame(out)


def knn_bruteforce(embeddings, queries: dict, id_col: str, vec_col: str, k: int,
                   concurrency=None):
    """Global top-k per query: per-batch local top-k -> tiny global merge.

    ``queries`` = {"ids": array, "mat": 2-D array}; broadcast via ray.put.
    Returns a Dataset of (query_id, neighbor_id, rank, sim).
    """
    import ray

    ref = ray.put(queries)
    partial = embeddings.map_batches(
        BruteForceTopK,
        fn_constructor_kwargs={"queries_ref": ref, "id_col": id_col,
                               "vec_col": vec_col, "k": k},
        batch_format="pandas",
        concurrency=concurrency or proportional_pool(),
    )
    return _topk_merge(partial, k)


class HyperplaneLSH:
    """Random-hyperplane signer: ``bits``-bit bucket code per row."""

    def __init__(self, dim: int, bits: int = 12, seed: int = 7):
        rng = np.random.RandomState(seed)
        self.planes = rng.standard_normal((bits, dim))

    def code(self, mat: np.ndarray) -> np.ndarray:
        proj = mat @ self.planes.T  # (N, bits)
        bits = (proj > 0).astype(np.uint64)
        return (bits << np.arange(bits.shape[1], dtype=np.uint64)[None, :]).sum(axis=1)


def add_lsh_bucket(embeddings, vec_col: str, dim: int, bits: int = 12, seed: int = 7):
    """The scale path for ANN: assign each row an LSH bucket; queries probe
    only their own bucket (plus optional multiprobe neighbors)."""

    def _code(batch: pd.DataFrame) -> pd.DataFrame:
        lsh = HyperplaneLSH(dim, bits, seed)  # deterministic per seed
        mat = np.stack(batch[vec_col].to_numpy()).astype(np.float64)
        batch["bucket"] = lsh.code(mat).astype(np.int64)
        return batch

    return embeddings.map_batches(_code, batch_format="pandas")


def knn_lsh(embeddings, queries: dict, id_col: str, vec_col: str, k: int,
            dim: int, bits: int = 12, seed: int = 7, probes: int = 1):
    """ANN via shared LSH buckets: exact cosine only within the probed
    buckets of each query.  ``probes`` = max Hamming distance of probed
    bucket codes (0 = own bucket only; 1 = standard multiprobe, bits+1
    buckets per query).  Recall/cost dial: fewer bits or more probes ->
    more candidates.  Returns (query_id, neighbor_id, rank, sim)."""
    lsh = HyperplaneLSH(dim, bits, seed)
    q_mat = np.asarray(queries["mat"], dtype=np.float64)
    q_codes = lsh.code(q_mat)
    by_bucket: dict[int, list[int]] = {}
    for qi, c in enumerate(q_codes):
        codes = [int(c)]
        if probes >= 1:
            codes += [int(c) ^ (1 << b) for b in range(bits)]
        if probes >= 2:
            codes += [int(c) ^ (1 << b1) ^ (1 << b2)
                      for b1 in range(bits) for b2 in range(b1 + 1, bits)]
        for code in codes:
            by_bucket.setdefault(code, []).append(qi)

    bucketed = add_lsh_bucket(embeddings, vec_col, dim, bits, seed)
    import ray

    ref = ray.put({"by_bucket": by_bucket, "ids": np.asarray(queries["ids"]),
                   "mat": _norm_rows(q_mat)})

    def probe(batch: pd.DataFrame) -> pd.DataFrame:
        q = _get_broadcast(ref)  # per-worker cache, not a per-batch ray.get
        out = {"query_id": [], "neighbor_id": [], "sim": []}
        for bucket, sub in batch.groupby("bucket"):
            qis = q["by_bucket"].get(int(bucket))
            if not qis:
                continue
            ids = sub[id_col].to_numpy()
            mat = _norm_rows(np.stack(sub[vec_col].to_numpy()).astype(np.float64))
            sims = q["mat"][qis] @ mat.T
            for row, qi in zip(sims, qis):
                qid = q["ids"][qi]
                mask = ids != qid
                cand = np.flatnonzero(mask)
                top = cand[np.argsort(-row[cand], kind="stable")[: min(k, cand.size)]]
                out["query_id"].extend([qid] * top.size)
                out["neighbor_id"].extend(ids[top].tolist())
                out["sim"].extend(row[top].tolist())
        return pd.DataFrame(out)

    partial = bucketed.map_batches(probe, batch_format="pandas")
    return _topk_merge(partial, k)


def _topk_merge(partial, k: int):
    """Tiny global merge shared by every ANN variant: per-query sort of
    the per-batch local top-k candidates (k * num_batches rows total)."""

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "neighbor_id"], ascending=[False, True],
                          kind="stable").head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return partial.groupby("query_id").map_groups(merge, batch_format="pandas")


def kmeans_centroids(sample: np.ndarray, k: int, iters: int = 10,
                     seed: int = 5) -> np.ndarray:
    """Deterministic spherical Lloyd k-means on a (driver-side, bounded)
    training sample — the IVF coarse-quantizer training step.  Rows and
    centroids are L2-normalized so assignment = argmax dot = cosine."""
    x = _norm_rows(np.asarray(sample, dtype=np.float64))
    rng = np.random.RandomState(seed)
    k = min(k, len(x))
    cent = x[rng.choice(len(x), size=k, replace=False)].copy()
    for _ in range(iters):
        assign = (x @ cent.T).argmax(axis=1)
        for j in range(k):
            members = x[assign == j]
            if len(members):
                cent[j] = members.mean(axis=0)
        cent = _norm_rows(cent)
    return cent


def knn_ivf(embeddings, queries: dict, id_col: str, vec_col: str, k: int,
            nlist: int = 32, nprobe: int = 4, train_rows: int = 4096,
            iters: int = 10, seed: int = 5):
    """IVF ANN — the second scale path beside :func:`knn_lsh`: a coarse
    quantizer (spherical k-means over a bounded driver-side training
    sample) partitions the corpus into ``nlist`` cells; every row is
    assigned to its nearest centroid in a vectorized map (centroids
    broadcast once), and each query scans only its ``nprobe`` closest
    cells.  Recall/cost dial: more probes or fewer lists -> more
    candidates.  Returns (query_id, neighbor_id, rank, sim)."""
    import ray

    # Uniform training sample, not limit(): on a sorted / label-clustered
    # corpus the head rows bias the centroids and recall collapses for the
    # tail.  One cheap counted pass + a seeded Bernoulli row sample spreads
    # the ~train_rows training vectors across the whole dataset; the limit
    # is only a memory backstop (binds rarely at 2x the expectation).
    n_total = embeddings.count()
    if n_total <= train_rows:
        train = embeddings.to_pandas()
    else:
        frac = min(1.0, (train_rows * 1.2) / n_total)
        train = (embeddings.random_sample(frac, seed=seed)
                 .limit(train_rows * 2).to_pandas())
    cent = kmeans_centroids(np.stack(train[vec_col].to_numpy()), nlist,
                            iters=iters, seed=seed)
    q_mat = _norm_rows(np.asarray(queries["mat"], dtype=np.float64))
    q_cells = np.argsort(-(q_mat @ cent.T), axis=1)[:, : min(nprobe, len(cent))]
    by_cell: dict[int, list[int]] = {}
    for qi, cells in enumerate(q_cells):
        for c in cells:
            by_cell.setdefault(int(c), []).append(qi)

    ref = ray.put({"cent": cent, "by_cell": by_cell,
                   "ids": np.asarray(queries["ids"]), "mat": q_mat})

    def probe(batch: pd.DataFrame) -> pd.DataFrame:
        q = _get_broadcast(ref)
        ids = batch[id_col].to_numpy()
        mat = _norm_rows(np.stack(batch[vec_col].to_numpy()).astype(np.float64))
        cells = (mat @ q["cent"].T).argmax(axis=1)
        out = {"query_id": [], "neighbor_id": [], "sim": []}
        for cell in np.unique(cells):
            qis = q["by_cell"].get(int(cell))
            if not qis:
                continue
            rows = np.flatnonzero(cells == cell)
            sims = q["mat"][qis] @ mat[rows].T
            sub_ids = ids[rows]
            for srow, qi in zip(sims, qis):
                qid = q["ids"][qi]
                cand = np.flatnonzero(sub_ids != qid)
                if cand.size == 0:
                    continue
                top = cand[np.argsort(-srow[cand], kind="stable")[: min(k, cand.size)]]
                out["query_id"].extend([qid] * top.size)
                out["neighbor_id"].extend(sub_ids[top].tolist())
                out["sim"].extend(srow[top].tolist())
        return pd.DataFrame(out)

    partial = embeddings.map_batches(probe, batch_format="pandas")
    return _topk_merge(partial, k)


def embedding_dup_pairs(embeddings, id_col: str, vec_col: str, bucket_col: str,
                        tau: float = 0.95, max_bucket: int = 2000):
    """Embedding-cosine near-dup: all pairs with cosine > tau inside each
    bucket (e.g. a label or an LSH bucket)."""

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2 or len(g) > max_bucket:
            return pd.DataFrame({"a": [], "b": [], "cos": []})
        g = g.sort_values(id_col, kind="stable")
        ids = g[id_col].to_numpy()
        mat = _norm_rows(np.stack(g[vec_col].to_numpy()).astype(np.float64))
        sims = mat @ mat.T
        ii, jj = np.triu_indices(len(ids), k=1)
        keep = sims[ii, jj] > tau
        return pd.DataFrame({"a": ids[ii[keep]], "b": ids[jj[keep]],
                             "cos": sims[ii[keep], jj[keep]]})

    return embeddings.groupby(bucket_col).map_groups(pairs, batch_format="pandas")


def label_centroid_topk(embeddings, id_col: str, vec_col: str,
                        label_col: str, k: int = 5):
    """Per-label centroid exemplars: the mean vector of every label
    group, then the ``k`` vectors most cosine-similar to their OWN
    label's centroid, ranked (1-based).  The "best exemplars per
    cluster" curation step downstream of any clustering/labeling pass.

    Scale shape (two streaming passes over the table — a re-read beats
    a mid-pipeline materialize):

    1. per-batch partial (label, n, sum-vector) rows — at most
       labels x blocks tiny rows — combined on the DRIVER (labels are
       few by construction; the sum vector is D floats) and broadcast
       once via ``ray.put``.
    2. per-batch cosine of every row against its own label's centroid
       (one vectorized matmul row-gather), then the grouped top-k
       SEMIGROUP combiner keeps <= k candidates per label per batch.

    Only (label, id, rank) leave the second pass — floats stay inside
    (cross-engine float ordering is stable, values are not; the q20
    rank-only contract)."""
    import ray

    from .topk import grouped_topk

    def partial_sums(b: pd.DataFrame) -> pd.DataFrame:
        out = []
        for lab, g in b.groupby(label_col, sort=False):
            m = np.stack(g[vec_col].to_numpy()).astype(np.float64)
            out.append((lab, len(g), m.sum(axis=0).tobytes()))
        return pd.DataFrame(out, columns=["label", "n", "vsum"])

    parts = embeddings.map_batches(partial_sums, batch_format="pandas").take_all()
    acc: dict = {}
    for r in parts:
        n0, s0 = acc.get(r["label"], (0, None))
        v = np.frombuffer(r["vsum"], dtype=np.float64)
        acc[r["label"]] = (n0 + r["n"], v if s0 is None else s0 + v)
    cent = {lab: s / n for lab, (n, s) in acc.items()}
    cent_ref = ray.put(cent)

    def cos_rows(b: pd.DataFrame) -> pd.DataFrame:
        c = _get_broadcast(cent_ref)
        mat = _norm_rows(np.stack(b[vec_col].to_numpy()).astype(np.float64))
        labs = b[label_col].to_numpy()
        cmat = _norm_rows(np.stack([c[l] for l in pd.unique(labs)]))
        lut = {l: i for i, l in enumerate(pd.unique(labs))}
        rows = cmat[[lut[l] for l in labs]]
        return pd.DataFrame({
            label_col: labs,
            id_col: b[id_col].to_numpy(dtype="int64"),
            "cos": np.einsum("ij,ij->i", mat, rows),
        })

    top = grouped_topk(embeddings.map_batches(cos_rows, batch_format="pandas"),
                       [label_col], "cos", k=k, tie_cols=[id_col],
                       with_rank="rnk")
    return top.drop_columns(["cos"])
