"""Shared actor-pool sizing for every stateful stage.

Pool sizing, measured on the 100k-heavy-page corpus (BASELINE.md): a
stateful ``map_batches`` pool gets a PROPORTIONAL 3/4 share of the
cluster at every size — so throughput-per-cpu is comparable across
cluster sizes (a fixed absolute headroom skewed small clusters) — and
the leftover 1/4 runs the read/filter/finalize/write task stages,
which carry ~10-15% of the work and starve if the pool reserves
everything (a full-width pool measured 2x slower end-to-end).
``min = cap // 2`` skips most of the demand-driven ramp without
pinning (pinning showed regressions under memory noise).

Used by the recognizer (pipelines/extract.py), MinHash signer
(stages/dedup.py), brute-force kNN (stages/similarity.py) and media
featurizer (stages/multimodal.py) so no stage defaults to a fixed
4-actor cap that starves a wide cluster.
"""

from __future__ import annotations


def cluster_cpus(default: int = 4) -> int:
    import ray

    return int(ray.cluster_resources().get("CPU", default)) if ray.is_initialized() else default


#: per-bucket row budget for bucket-exchange operators: one bucket task
#: sorts/merges this many rows in heap (slim 3-5 column rows — ~100 MB)
DEFAULT_ROWS_PER_BUCKET = 2_000_000


def estimate_rows(*datasets) -> int | None:
    """Metadata-only row estimate of the given Datasets (parquet reads
    and other metadata-bearing sources), or None when any input's count
    would require execution — callers fall back to width-based sizing."""
    total = 0
    for ds in datasets:
        try:
            n = ds._meta_count()
        except Exception:
            return None
        if n is None:
            return None
        total += int(n)
    return total


def data_aware_buckets(rows: int | None,
                       rows_per_bucket: int = DEFAULT_ROWS_PER_BUCKET) -> int:
    """Bucket count for a bucket-exchange operator (sessionize, bucketed
    as-of join, hash join): at least ~8 tasks per cpu for overlap, AND at
    least rows/rows_per_bucket so per-bucket heap stays bounded as data
    grows on a fixed-width cluster (a width-only count concentrates a
    linearly growing share of the stream in each task)."""
    width = max(64, 8 * cluster_cpus())
    if rows:
        floor = -(-rows // rows_per_bucket)  # ceil div
        # A MEASURED small input doesn't need 8 tasks/cpu of fixed
        # per-task overhead (~25-40 ms each): scale the count down to
        # one task per cpu / 50k rows per bucket, whichever is larger,
        # and let the width target take over as rows grow past
        # width × 50k.  The rows/rows_per_bucket heap bound always
        # applies.  (Measured: the 256-bucket exchange on a 215k-row
        # sf0.1 join spent more wall in task dispatch than in joining.)
        lower = min(width, max(cluster_cpus(), -(-rows // 50_000)))
        return max(lower, floor)
    return width


def proportional_pool(share: float = 0.75, warm: bool = False) -> tuple[int, int]:
    """(min, max) actor-pool ``concurrency`` for a stateful stage.

    ``warm=False`` (default): min=1 — the pool ramps on demand up to the
    proportional cap.  Right for short per-query stages, where eagerly
    spawning cap worker processes costs more than the ramp saves
    (measured: ~+3-6 s per query at 32 cpus).
    ``warm=True``: min=max=cap — the full pool spawns up front; right
    for the long-running flagship stage where sustained throughput
    dominates and the spawn cost amortizes (pipelines/extract.py;
    measured round 2: eager beat the cap/2 ramp at BOTH 8 and 32 cpus
    on the 100k-page corpus, ~-10-20% wall; the 1/4 cpu headroom for
    read/finalize task stages is preserved by the 3/4 share).

    On SMALL clusters (< 16 cpus) ``warm`` degrades to the ramp: a
    hard ``min == cap`` there can DEADLOCK against resources a
    just-finished pipeline's actor pool is still releasing (observed
    in a 4-cpu test session: the new pool's third actor pended
    forever behind an asynchronously-draining predecessor while the
    read task held the last cpu — Ray Data will not run the stage
    below ``min``).  At that width the warm saving is noise; the
    ramp starts with whatever is free and grows."""
    total = cluster_cpus()
    cap = max(1, int(total * share))
    return (cap, cap) if warm and total >= 16 else (1, cap)
