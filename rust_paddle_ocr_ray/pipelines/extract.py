"""The flagship det -> rec -> merge pipeline (SURVEY.md §3.1).

Ray-Data-first layout:

    read_parquet(pages)                         # pruned to needed columns
      -> map_batches(detect, pyarrow, zero-copy)   # stateless tasks
      -> map_batches(Recognizer, concurrency=N)    # stateful actor pool
      -> groupby(url).map_groups(merge)            # the ONE wide shuffle
      -> write_parquet / consume

Library code never calls ray.init (driver contract, __ray_entry__.py).
"""

from __future__ import annotations

import ray.data as rd
from ray.data import Dataset

from ..config import CLI_CONFIG, ExtractConfig
from ..sizing import proportional_pool
from ..stages.detect import make_detector
from ..stages.merge import merge_extracted, plan_url_dedup
from ..stages.recognize import Recognizer

PAGE_COLUMNS = ["url", "warc_ts", "html", "lang"]


class ExtractPipeline:
    """Pipeline facade — the ``OcrEngine`` analog without the singleton
    (SURVEY.md §2.3 ST4: explicit object, parallelism owned by Ray Data)."""

    def __init__(self, config: ExtractConfig = CLI_CONFIG):
        self.config = config

    # --- sources -----------------------------------------------------------
    def read_pages(self, paths, override_num_blocks: int | None = None) -> Dataset:
        """S1: parquet pages source, pruned to the columns detection needs.

        ``override_num_blocks``: optional block-count override; leave None
        to let block size follow ``DataContext.target_max_block_size``
        (the knob to shrink when straggler tasks appear — forcing a block
        count on the read itself was measured to degrade badly at scale)."""
        if override_num_blocks is not None:
            return rd.read_parquet(
                paths, columns=PAGE_COLUMNS, override_num_blocks=override_num_blocks
            )
        return rd.read_parquet(paths, columns=PAGE_COLUMNS)

    def synthetic_pages(self, n: int, seed: int = 42) -> Dataset:
        """Distributed deterministic corpus (no driver-side loop)."""
        from ..sources.synth import pages_batch

        return rd.range(n).map_batches(
            lambda b: pages_batch(b, seed=seed), batch_format="pyarrow", batch_size=256
        )

    # --- stages ------------------------------------------------------------
    def detect(self, pages: Dataset) -> Dataset:
        cfg = self.config
        return pages.map_batches(
            make_detector(cfg),
            batch_format="pyarrow",
            batch_size=cfg.detect_batch_size,
            zero_copy_batch=True,
        )

    def split_for_skew(self, spans: Dataset) -> Dataset:
        """Optional span-count skew guard (SURVEY.md §4): when
        ``cfg.skew_split_rows`` is set, cap rows per block between detect
        and recognize so a pathological page's thousands of spans spread
        over multiple recognition tasks instead of serializing one."""
        if self.config.skew_split_rows:
            return spans.repartition(
                target_num_rows_per_block=self.config.skew_split_rows
            )
        return spans

    def recognize(self, spans: Dataset) -> Dataset:
        cfg = self.config
        spans = self.split_for_skew(spans)
        concurrency = cfg.recognize_concurrency
        if concurrency is None:
            # proportional 3/4-share pool; rationale + measurements in sizing.py
            concurrency = proportional_pool(warm=True)
        return spans.map_batches(
            Recognizer,
            fn_constructor_kwargs={"cfg": cfg},
            batch_format="pyarrow",
            batch_size=cfg.recognize_batch_size,
            zero_copy_batch=True,
            concurrency=concurrency,
            num_cpus=cfg.recognize_num_cpus,
        )

    def _splits_possible(self) -> bool:
        """Static check: can a page version's span run straddle a block
        boundary?  Delegates to ``stages.recognize.streaming_merge_safe``
        — the recognizer evaluates the SAME predicate to decide whether
        to enforce the per-page byte model strictly (a model-violating
        page raises instead of silently splitting).  Streaming is safe
        when the worst-case single page (text bound + enforced
        span-count cap x per-span allowance) fits the greedy
        page-aligned yield cap of 0.45x target; below that — or with
        the explicit ``skew_split_rows`` page splitter — the merge
        routes batch-boundary partials through the bucket exchange
        instead of streaming."""
        from ray.data import DataContext

        from ..stages.recognize import streaming_merge_safe

        target = DataContext.get_current().target_max_block_size
        return not streaming_merge_safe(self.config, target)

    def merge(self, recognized: Dataset, tie_urls: frozenset | None = None) -> Dataset:
        return merge_extracted(
            recognized,
            num_buckets=self.config.merge_num_buckets,
            tie_urls=tie_urls,
            splits_possible=self._splits_possible(),
        )

    # --- end-to-end --------------------------------------------------------
    def run(self, pages: Dataset, keys: Dataset | None = None) -> Dataset:
        """pages -> extracted.  ``keys``: optional (url, warc_ts)-only
        Dataset for the dedup planning scan (pass a column-pruned parquet
        read when you have paths — see ``run_paths``); derived from
        ``pages`` by projection otherwise.

        dedup_mode="planned" (default): key-only planning scan -> drop
        losing page versions before detection (broadcast filter) ->
        combiner partials materialize once (slim, text-only) and
        interior versions finalize with no exchange; only batch-boundary
        partials (block-split safety, ~2 per batch) and exact-warc_ts-tie
        urls (normally none) shuffle.  "at_merge": no planning pass, one
        full exchange.  "off": caller asserts unique urls."""
        mode = self.config.dedup_mode
        if mode == "at_merge":
            return self.merge(self.recognize(self.detect(pages)), tie_urls=None)
        if mode == "off":
            return self.merge(self.recognize(self.detect(pages)), tie_urls=frozenset())

        # "planned"
        import ray

        from ..functions.bloom import BloomFilter
        from ..stages.merge import make_winner_filter

        keys_ds = keys if keys is not None else pages.select_columns(["url", "warc_ts"])
        winners, ties = plan_url_dedup(
            keys_ds, max_winners=self.config.dedup_max_winners
        )
        if isinstance(winners, BloomFilter):
            # Driver-bounded degradation (dup urls > dedup_max_winners):
            # no exact winning ts exists, so losing versions are parsed
            # and the max-ts dedup happens in the merge exchange for
            # bloom-positive urls only — unique (bloom-negative) urls
            # still stream with zero exchange.
            return self.merge(
                self.recognize(self.detect(pages)), tie_urls=winners
            )
        if winners:
            pages = pages.map_batches(
                make_winner_filter(ray.put(winners)),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
        return self.merge(self.recognize(self.detect(pages)), tie_urls=ties)

    def run_paths(self, paths) -> Dataset:
        """Parquet entry point.  The dedup planning scan reads ONLY the
        two key columns; below ``plan_local_max_rows`` it runs as a
        threaded driver-local scan (distributed Ray plan latency >> plan
        work at that size), above it as the distributed plan."""
        if self.config.dedup_mode == "planned":
            import pyarrow.dataset as pds

            from ..stages.merge import plan_url_dedup_local

            n_rows = pds.dataset(paths, format="parquet").count_rows()
            if n_rows <= self.config.plan_local_max_rows:
                import ray

                from ..functions.bloom import BloomFilter
                from ..stages.merge import make_winner_filter

                winners, ties = plan_url_dedup_local(
                    paths, max_winners=self.config.dedup_max_winners
                )
                pages = self.read_pages(paths)
                if isinstance(winners, BloomFilter):
                    # same driver-bounded degradation as the distributed
                    # plan (run()): no exact winning ts exists, so dup
                    # urls dedup inside the merge exchange instead
                    return self.merge(
                        self.recognize(self.detect(pages)), tie_urls=winners
                    )
                if winners:
                    pages = pages.map_batches(
                        make_winner_filter(ray.put(winners)),
                        batch_format="pyarrow",
                        zero_copy_batch=True,
                    )
                return self.merge(self.recognize(self.detect(pages)), tie_urls=ties)
        keys = rd.read_parquet(paths, columns=["url", "warc_ts"])
        return self.run(self.read_pages(paths), keys=keys)
