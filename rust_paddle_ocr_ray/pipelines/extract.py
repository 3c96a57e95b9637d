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
from ..stages.detect import make_detector
from ..stages.merge import merge_extracted
from ..stages.recognize import Recognizer

PAGE_COLUMNS = ["url", "warc_ts", "html", "lang"]


class ExtractPipeline:
    """Pipeline facade — the ``OcrEngine`` analog without the singleton
    (SURVEY.md §2.3 ST4: explicit object, parallelism owned by Ray Data)."""

    def __init__(self, config: ExtractConfig = CLI_CONFIG):
        self.config = config

    # --- sources -----------------------------------------------------------
    def read_pages(self, paths) -> Dataset:
        """S1: parquet pages source, pruned to the columns detection needs."""
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

    def recognize(self, spans: Dataset) -> Dataset:
        cfg = self.config
        concurrency = cfg.recognize_concurrency
        if concurrency is None:
            # autoscaling pool sized to the cluster, leaving headroom so the
            # read / shuffle stages always have cpus (a pool reserving every
            # cpu deadlocks: input task can't run -> pool never gets a batch)
            import ray

            total = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
            concurrency = (1, max(1, total - 2))
        return spans.map_batches(
            Recognizer,
            fn_constructor_kwargs={"cfg": cfg},
            batch_format="pyarrow",
            batch_size=cfg.recognize_batch_size,
            zero_copy_batch=True,
            concurrency=concurrency,
            num_cpus=cfg.recognize_num_cpus,
        )

    def merge(self, recognized: Dataset) -> Dataset:
        return merge_extracted(recognized, num_buckets=self.config.merge_num_buckets)

    # --- end-to-end --------------------------------------------------------
    def run(self, pages: Dataset) -> Dataset:
        return self.merge(self.recognize(self.detect(pages)))

    def run_paths(self, paths) -> Dataset:
        return self.run(self.read_pages(paths))
