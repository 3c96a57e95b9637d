"""Connected-component clustering over a near-duplicate pair graph.

The dedup family (``stages/dedup.py``) emits PAIRS — (a, b) rows saying
two documents are near-duplicates.  Corpus-level deduplication needs the
transitive closure of those pairs: every document assigned a cluster id
(canonically the min doc id in its component) so a downstream keep-one
filter can drop whole duplicate groups, not just one edge at a time.
This is the graph analog of the reference's transitive box merge
(src/det.rs worklist merge — boxes that overlap transitively collapse
into one region); here the nodes are documents and the edges are
near-dup pairs.

Scale shape — two strategies, selected by a MEASURED pair count (the
same pattern as the MinHash verify and the q29 dimension broadcast):

- broadcast (pair_count <= ``broadcast_max_pairs``): the pair list —
  two int64 columns, ~16 bytes/row, NOT documents — is pulled to the
  driver, union-find runs locally (near-linear), and the id -> cluster
  mapping for non-singleton members (only ids that appear in a pair)
  is ``ray.put`` once and read per worker via the broadcast cache.
  Node assignment is then a single map_batches pass: no shuffle at all.
  Real crawl dup-pair counts are O(dup docs), far below corpus size,
  so this is the common path; the cap bounds driver memory.
- distributed (above the cap, or ``strategy="distributed"``): min-label
  propagation.  Labels (id, comp=id) for ids that appear in an edge;
  each round hash-joins the symmetric edge list against the labels and
  takes the per-id min over {own comp} u {neighbour comps}.  Rounds are
  bounded by the component DIAMETER (near-dup clusters are dense — a
  handful of rounds), each round shuffles only slim (id, comp) rows,
  and the per-round ``materialize()`` truncates lineage on a table of
  O(nodes-in-pairs) rows — a tiny fraction of the corpus, never the
  corpus itself.  Convergence is detected by the monotone-decreasing
  sum of labels reaching a fixpoint.

Final assembly unions the propagated labels with (id, id) for every
node and takes the per-id min — singletons keep their own id.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd

logger = logging.getLogger(__name__)

#: pairs are two int64s; 2M pairs ~ 32 MB on the driver — same ballpark
#: as the MinHash verify's bounded broadcast
DEFAULT_BROADCAST_MAX_PAIRS = 2_000_000


def _union_find(a: np.ndarray, b: np.ndarray) -> dict:
    """Driver-local union-find; returns {id: min id in component} for
    every id that appears in a pair (singletons are implicit)."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path compression
            parent[x], x = root, parent[x]
        return root

    for x, y in zip(a.tolist(), b.tolist()):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    ids = set(a.tolist()) | set(b.tolist())
    return {i: find(i) for i in ids}


def connected_components(pairs, nodes, id_col: str = "doc_id",
                         a_col: str = "a", b_col: str = "b",
                         out_col: str = "cluster_id",
                         broadcast_max_pairs: int = DEFAULT_BROADCAST_MAX_PAIRS,
                         max_iters: int = 16, strategy: str | None = None):
    """Assign every row of ``nodes`` the min node id reachable through
    ``pairs`` (its connected component), as (id_col, out_col).

    ``strategy``: None = auto by measured pair count; "broadcast" /
    "distributed" force a path (tests assert the two agree)."""
    import ray

    if strategy is None:
        n_pairs = pairs.count()
        strategy = "broadcast" if n_pairs <= broadcast_max_pairs else "distributed"
        logger.info("connected_components: %d pairs -> %s", n_pairs, strategy)

    if strategy == "broadcast":
        cols = pairs.select_columns([a_col, b_col])
        a_parts, b_parts = [], []
        for batch in cols.iter_batches(batch_format="pandas", batch_size=65536):
            a_parts.append(batch[a_col].to_numpy())
            b_parts.append(batch[b_col].to_numpy())
        if a_parts:
            mapping = _union_find(np.concatenate(a_parts), np.concatenate(b_parts))
        else:
            mapping = {}
        ref = ray.put(mapping)

        def assign(batch: pd.DataFrame) -> pd.DataFrame:
            from .merge import _get_broadcast

            m = _get_broadcast(ref)
            ids = batch[id_col]
            # int64-preserving mapped/unmapped combine: Series.map + fillna
            # would upcast unmapped rows through float64 and corrupt ids
            # >= 2^53 (hash-derived 64-bit doc ids are plausible at scale)
            arr = ids.to_numpy()
            out = arr.copy()
            if m:
                hit = ids.isin(m.keys()).to_numpy()
                if hit.any():
                    out[hit] = [m[i] for i in arr[hit]]
            return pd.DataFrame({id_col: arr, out_col: out})

        return nodes.select_columns([id_col]).map_batches(assign, batch_format="pandas")

    # ---- distributed min-label propagation ------------------------------
    from ray.data.aggregate import Min

    from .join import native_join

    def symmetric(batch: pd.DataFrame) -> pd.DataFrame:
        fwd = pd.DataFrame({"src": batch[a_col], "dst": batch[b_col]})
        rev = pd.DataFrame({"src": batch[b_col], "dst": batch[a_col]})
        return pd.concat([fwd, rev], ignore_index=True)

    edges = pairs.select_columns([a_col, b_col]).map_batches(
        symmetric, batch_format="pandas").materialize()
    n_edges = edges.count()  # metadata count of the materialized table

    def self_label(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"id": batch["src"], "comp": batch["src"]})

    labels = (edges.map_batches(self_label, batch_format="pandas")
              .groupby("id").aggregate(Min("comp", alias_name="comp"))
              .materialize())
    prev_sum = labels.sum("comp") if labels.count() else 0

    for it in range(max_iters):
        if not prev_sum and labels.count() == 0:
            break
        # neighbour proposals: for edge src->dst, dst may adopt src's comp
        prop = native_join(
            edges, labels.map_batches(
                lambda b: b.rename(columns={"id": "src"}), batch_format="pandas"),
            on="src", rows_hint=2 * n_edges,
        ).map_batches(
            lambda b: pd.DataFrame({"id": b["dst"], "comp": b["comp"]}),
            batch_format="pandas",
        )
        labels = (labels.union(prop)
                  .groupby("id").aggregate(Min("comp", alias_name="comp"))
                  .materialize())
        cur_sum = labels.sum("comp")
        if cur_sum == prev_sum:
            logger.info("connected_components converged after %d rounds", it + 1)
            break
        prev_sum = cur_sum
    else:
        logger.warning(
            "connected_components: not converged after %d rounds "
            "(component diameter exceeds max_iters; results are a valid "
            "over-segmentation, rerun with a higher max_iters)", max_iters)

    def self_node(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"id": batch[id_col], "comp": batch[id_col]})

    base = nodes.select_columns([id_col]).map_batches(self_node, batch_format="pandas")
    merged = (base.union(labels)
              .groupby("id").aggregate(Min("comp", alias_name="comp")))
    return merged.map_batches(
        lambda b: b.rename(columns={"id": id_col, "comp": out_col}),
        batch_format="pandas",
    )
