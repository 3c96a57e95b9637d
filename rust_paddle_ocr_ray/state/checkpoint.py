"""Per-partition checkpoint / lineage / resume (north_rule: "resumable
from checkpoint with per-partition lineage + metrics").

The reference has NO fault tolerance — a dead worker thread surfaces as
``EngineError("worker thread has terminated")`` and the job restarts
from scratch (/root/reference/src/engine.rs:213-215).  At 10^12
documents a restart-from-scratch is unacceptable, so this module adds
the missing layer around the extraction pipeline:

* the input file list is split into ``num_partitions`` deterministic
  shards (sorted order, contiguous slices);
* each shard runs the full streaming pipeline independently and writes
  its own parquet directory ``part=<k>/`` — never one giant file;
* a sidecar ``_ckpt/partition-<k>.json`` records LINEAGE (exact input
  files, their sizes and mtimes) and METRICS (rows in/out, html bytes,
  wall seconds, docs/sec) and is written ATOMICALLY (tmp + rename)
  only after the partition's data is fully on disk;
* on restart, partitions whose checkpoint validates (inputs unchanged,
  output files present with the recorded row count) are SKIPPED; the
  job finishes the remainder — a killed job resumes mid-dataset.

The driver loop below iterates shards sequentially; each shard is
itself a fully parallel Ray Data pipeline, so the loop is control-plane
only.  On a multi-node cluster, shard granularity (files per
partition) trades recovery cost against scheduling overhead — ~1-5
minutes of work per partition is a good target.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field


def _atomic_write_json(path: str, payload: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    os.replace(tmp, path)


def _file_lineage(paths: list[str]) -> list[dict]:
    out = []
    for p in sorted(paths):
        st = os.stat(p)
        out.append({"path": p, "bytes": st.st_size, "mtime_ns": st.st_mtime_ns})
    return out


def shard_files(files: list[str], num_partitions: int) -> list[list[str]]:
    """Deterministic contiguous shards over the sorted file list."""
    files = sorted(files)
    n = len(files)
    num_partitions = max(1, min(num_partitions, n))
    per = (n + num_partitions - 1) // num_partitions
    return [files[i : i + per] for i in range(0, n, per)]


@dataclass
class CheckpointedRun:
    """Checkpointed, resumable execution of an extraction pipeline over
    a parquet file corpus.

    >>> run = CheckpointedRun(pipeline, out_dir="/data/extracted", num_partitions=64)
    >>> run.execute(["/data/pages/f0.parquet", ...])   # resumes if killed
    """

    pipeline: object  # ExtractPipeline (duck-typed: .run_paths(paths) -> Dataset)
    out_dir: str
    num_partitions: int = 16
    completed: list[int] = field(default_factory=list)
    skipped: list[int] = field(default_factory=list)

    # --- layout -----------------------------------------------------------
    def _part_dir(self, k: int) -> str:
        return os.path.join(self.out_dir, f"part={k}")

    def _ckpt_path(self, k: int) -> str:
        return os.path.join(self.out_dir, "_ckpt", f"partition-{k}.json")

    # --- validation -------------------------------------------------------
    def is_complete(self, k: int, shard: list[str]) -> bool:
        """A partition is complete iff its checkpoint exists, records the
        same input lineage, and the output row count still matches."""
        path = self._ckpt_path(k)
        if not os.path.exists(path):
            return False
        try:
            with open(path) as f:
                ckpt = json.load(f)
        except (OSError, json.JSONDecodeError):
            return False
        if ckpt.get("inputs") != _file_lineage(shard):
            return False
        try:
            import pyarrow as pa
            import pyarrow.dataset as pds

            rows = pds.dataset(self._part_dir(k), format="parquet").count_rows()
        except (OSError, FileNotFoundError, pa.ArrowInvalid):
            return False
        return rows == ckpt.get("rows_out")

    # --- execution --------------------------------------------------------
    def _drop_stale_partitions(self, n_shards: int) -> None:
        """Remove part dirs / checkpoints at k >= n_shards: a re-run with
        a smaller file list or partition count would otherwise leave the
        previous sharding's outputs on disk and ``pds.dataset(out_dir)``
        would mix stale rows into the result."""
        import glob
        import re
        import shutil

        for d in glob.glob(os.path.join(self.out_dir, "part=*")):
            m = re.search(r"part=(\d+)$", d)
            if m and int(m.group(1)) >= n_shards:
                shutil.rmtree(d, ignore_errors=True)
        for f in glob.glob(os.path.join(self.out_dir, "_ckpt", "partition-*.json")):
            m = re.search(r"partition-(\d+)\.json$", f)
            if m and int(m.group(1)) >= n_shards:
                os.remove(f)

    def execute(self, files: list[str]) -> dict:
        """Run all incomplete partitions; returns the job manifest."""
        os.makedirs(os.path.join(self.out_dir, "_ckpt"), exist_ok=True)
        shards = shard_files(files, self.num_partitions)
        self._drop_stale_partitions(len(shards))
        t_job = time.perf_counter()
        for k, shard in enumerate(shards):
            if self.is_complete(k, shard):
                self.skipped.append(k)
                continue
            self._run_partition(k, shard)
            self.completed.append(k)
        manifest = {
            "partitions": len(shards),
            "completed_this_run": self.completed,
            "skipped_resumed": self.skipped,
            "wall_s": round(time.perf_counter() - t_job, 3),
        }
        _atomic_write_json(os.path.join(self.out_dir, "_ckpt", "job.json"), manifest)
        return manifest

    def _run_partition(self, k: int, shard: list[str]) -> None:
        import shutil

        import pyarrow.dataset as pds

        part_dir = self._part_dir(k)
        # idempotent restart: clear any partial output of a killed attempt
        shutil.rmtree(part_dir, ignore_errors=True)
        in_bytes = sum(os.path.getsize(p) for p in shard)
        t0 = time.perf_counter()
        ds = self.pipeline.run_paths(shard)
        ds.write_parquet(part_dir)
        wall = time.perf_counter() - t0
        rows_out = pds.dataset(part_dir, format="parquet").count_rows()
        _atomic_write_json(
            self._ckpt_path(k),
            {
                "partition": k,
                "inputs": _file_lineage(shard),
                "input_bytes": in_bytes,
                "rows_out": rows_out,
                "wall_s": round(wall, 3),
                "docs_per_sec": round(rows_out / wall, 2) if wall > 0 else 0.0,
                "mb_per_sec": round(in_bytes / 1e6 / wall, 2) if wall > 0 else 0.0,
                "finished_unix": int(time.time()),
            },
        )

    # --- metrics rollup (A3 analog) ---------------------------------------
    def metrics(self):
        """All partition checkpoints as one pandas frame (the metrics
        side-table; global rollups are trivial aggregations over it)."""
        import pandas as pd

        rows = []
        ckpt_dir = os.path.join(self.out_dir, "_ckpt")
        for name in sorted(os.listdir(ckpt_dir)):
            if name.startswith("partition-") and name.endswith(".json"):
                with open(os.path.join(ckpt_dir, name)) as f:
                    c = json.load(f)
                rows.append(
                    {
                        "partition": c["partition"],
                        "input_bytes": c["input_bytes"],
                        "rows_out": c["rows_out"],
                        "wall_s": c["wall_s"],
                        "docs_per_sec": c["docs_per_sec"],
                        "mb_per_sec": c["mb_per_sec"],
                    }
                )
        return pd.DataFrame(rows)
