"""Engine configuration.

The frozen-dataclass analog of the reference's builder config
(`with_rect_border_size` / `with_merge_boxes` / `with_merge_threshold`,
/root/reference/src/det.rs:97-116; `with_min_score` / `with_punct_min_score`,
/root/reference/src/rec.rs:131-142).  All numeric constants keep the
reference defaults:

- ``rect_border_size`` = 10 (src/det.rs:29), CLI uses 12 (src/main.rs:114)
- ``merge_boxes`` = False, ``merge_threshold`` = 1 (src/det.rs:41, src/main.rs:115)
- ``threshold`` = 200 (binarization, src/det.rs:33)
- ``min_box_size`` = 5 (src/det.rs:37)
- ``min_score`` = 0.6, ``punct_min_score`` = 0.1 (src/rec.rs:24-25)

Detection here scores DOM/text blocks instead of pixels; the extra
``density_*`` knobs parameterize the text-density "probability map"
(the analog of the DB det model output, src/det.rs:339-348).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class ExtractConfig:
    # --- detection (src/det.rs constants) ---
    rect_border_size: int = 10          # span expansion in chars (det.rs:29; CLI=12)
    merge_boxes: bool = False           # transitive span merge (det.rs:127-131)
    merge_threshold: int = 1            # +/- chars for horizontal overlap (det.rs:41)
    threshold: int = 200                # keep blocks with score_byte > threshold (det.rs:33)
    min_box_size: int = 5               # drop blocks with visible chars <= this (det.rs:37)

    # --- detection density model (our DB-model analog; spec'd in functions/html.py) ---
    density_length_norm: float = 50.0   # chars at which length_factor saturates
    density_length_floor: float = 0.55  # score floor multiplier at length 0
    boiler_penalty: float = 0.5         # multiplier for nav/footer/header/aside blocks

    # --- recognition (src/rec.rs constants) ---
    min_score: float = 0.6              # regular-char confidence threshold (rec.rs:24)
    punct_min_score: float = 0.1        # punctuation confidence threshold (rec.rs:25)

    # --- scale / skew guards (no reference analog; 100 TB safety) ---
    max_spans_per_page: int = 4096      # cap spans emitted per page (skew guard)
    max_html_bytes: int = 16 * 1024 * 1024  # pages larger than this are truncated
    # optional block split between detect and recognize: cap span rows
    # per block (repartition(target_num_rows_per_block=...)) so one
    # pathological page cannot serialize a recognition wave.  None (the
    # default) keeps the streaming fast path; set it when ds.stats()
    # shows span-count skew stalling the recognizer.  Safe for the merge
    # combiner: batch-boundary versions route through the bucket
    # exchange (stages/merge.py).
    skew_split_rows: int | None = None

    # --- pipeline shape ---
    # D3 url dedup (SURVEY §2.7):
    #   "planned"  — key-only scan finds dup urls + winning warc_ts; unique
    #                urls bypass the merge shuffle, only dups exchange
    #                (default: crawls are mostly-unique, shuffle ~dup-rate)
    #   "at_merge" — every partial flows through the bucket groupby (the
    #                single-exchange reference formulation)
    #   "off"      — input urls asserted unique; pure streaming merge
    dedup_mode: str = "planned"
    # planning scans at or below this many input rows run driver-local
    # (threaded pyarrow key scan; ~60 B/row of driver memory) — the
    # distributed plan's fixed multi-wave latency dominates below this
    plan_local_max_rows: int = 20_000_000
    # driver bound for the planned-dedup winner structure: above this
    # many dup urls the exact url->winning-ts dict (O(dups) driver
    # memory) degrades to a fixed-size bloom filter of dup urls
    # (O(bits)); losers are then parsed and deduped in the merge
    # exchange instead of dropped pre-parse.  None = never degrade.
    dedup_max_winners: int | None = 2_000_000
    detect_batch_size: int = 64         # pages per detection batch (multi-MB html rows)
    # spans per recognition batch.  None = block-sized batches: detection's
    # 64-page output blocks flow straight through, and (crucially) when Ray
    # fuses detect->recognize into one actor-pool stage the fused operator
    # inherits detection's bundling instead of stalling to collect a huge
    # span batch (a fixed span batch_size here was measured to collapse the
    # fused stage to ONE task on small corpora — parallelism = 1).
    recognize_batch_size: int | None = None
    merge_num_buckets: int = 256        # coarse url-hash buckets for the merge shuffle
    # recognizer actor-pool size: None = autoscale (1, cluster_cpus - 2).
    # A fixed pool that reserves EVERY cpu deadlocks the pipeline: the read
    # task never gets a cpu to produce the first block while the idle pool
    # holds its reservation.  Always leave headroom for read/shuffle tasks.
    recognize_concurrency: int | tuple[int, int] | None = None
    recognize_num_cpus: float = 1.0

    def cli(self) -> "ExtractConfig":
        """The reference CLI configuration (src/main.rs:113-117):
        border=12, merge_boxes=False, merge_threshold=1."""
        from dataclasses import replace

        return replace(self, rect_border_size=12, merge_boxes=False, merge_threshold=1)


DEFAULT_CONFIG = ExtractConfig()
CLI_CONFIG = ExtractConfig().cli()
