"""Checkpoint / lineage / resume semantics (state/checkpoint.py).

North-rule requirement: a killed job resumes mid-dataset — completed
partitions are skipped (validated via lineage + output row count), and
the resumed output is identical to a clean full run.
"""

from __future__ import annotations

import json
import os
import shutil

import pandas as pd
import pyarrow.dataset as pds
import pyarrow.parquet as pq
import pytest

from rust_paddle_ocr_ray.config import CLI_CONFIG
from rust_paddle_ocr_ray.pipelines.extract import ExtractPipeline
from rust_paddle_ocr_ray.sources.synth import generate_pages
from rust_paddle_ocr_ray.state.checkpoint import CheckpointedRun, shard_files

N_FILES = 4
PAGES_PER_FILE = 60


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("ckpt_corpus")
    files = []
    for s in range(N_FILES):
        tbl = generate_pages(PAGES_PER_FILE, seed=100 + s)
        p = str(d / f"pages-{s}.parquet")
        pq.write_table(tbl, p)
        files.append(p)
    return files


def _read_all(out_dir: str) -> pd.DataFrame:
    df = pds.dataset(out_dir, format="parquet").to_table().to_pandas()
    return df.sort_values("url").reset_index(drop=True).drop(columns=[c for c in df.columns if c.startswith("part")], errors="ignore")


def test_shard_files_deterministic():
    files = [f"/x/{i}.parquet" for i in range(10)]
    shards = shard_files(list(reversed(files)), 3)
    assert [len(s) for s in shards] == [4, 4, 2]
    assert shards[0] == sorted(files)[:4]
    # never more partitions than files
    assert len(shard_files(files[:2], 8)) == 2


def test_full_run_writes_ckpts(ray_session, corpus, tmp_path):
    out = str(tmp_path / "out")
    run = CheckpointedRun(ExtractPipeline(CLI_CONFIG), out_dir=out, num_partitions=N_FILES)
    manifest = run.execute(corpus)
    assert manifest["completed_this_run"] == list(range(N_FILES))
    assert manifest["skipped_resumed"] == []
    for k in range(N_FILES):
        ck = json.load(open(os.path.join(out, "_ckpt", f"partition-{k}.json")))
        assert ck["rows_out"] > 0 and ck["wall_s"] > 0
        assert [i["path"] for i in ck["inputs"]] == [sorted(corpus)[k]]
    m = run.metrics()
    assert len(m) == N_FILES and (m["rows_out"] > 0).all()


def test_resume_skips_completed_and_matches_clean_run(ray_session, corpus, tmp_path):
    clean_dir = str(tmp_path / "clean")
    CheckpointedRun(ExtractPipeline(CLI_CONFIG), out_dir=clean_dir, num_partitions=N_FILES).execute(corpus)
    clean = _read_all(clean_dir)

    # simulate a job killed after partitions 0 and 1: run only those, then resume
    out = str(tmp_path / "resumed")
    first = CheckpointedRun(ExtractPipeline(CLI_CONFIG), out_dir=out, num_partitions=N_FILES)
    shards = shard_files(corpus, N_FILES)
    os.makedirs(os.path.join(out, "_ckpt"), exist_ok=True)
    for k in (0, 1):
        first._run_partition(k, shards[k])
    # partition 2 was mid-write when the job died: partial junk, no ckpt
    os.makedirs(os.path.join(out, "part=2"), exist_ok=True)
    pq.write_table(generate_pages(3, seed=1), os.path.join(out, "part=2", "junk.parquet"))

    resume = CheckpointedRun(ExtractPipeline(CLI_CONFIG), out_dir=out, num_partitions=N_FILES)
    manifest = resume.execute(corpus)
    assert manifest["skipped_resumed"] == [0, 1]
    assert manifest["completed_this_run"] == [2, 3]
    assert _read_all(out).equals(clean)


def test_rerun_with_fewer_partitions_drops_stale(ray_session, corpus, tmp_path):
    """Regression (ADVICE r1): re-running into an existing out_dir with a
    smaller partition count must not leave the previous sharding's
    part=k dirs/checkpoints behind (they would mix stale rows into
    pds.dataset(out_dir))."""
    from rust_paddle_ocr_ray.sources.synth import write_corpus

    # disjoint urls per file (unlike the module corpus, whose repeated
    # urls make cross-file tie metadata legitimately unspecified)
    disjoint = write_corpus(str(tmp_path / "disjoint"), n=120, shards=4)
    out = str(tmp_path / "out3")
    CheckpointedRun(ExtractPipeline(CLI_CONFIG), out_dir=out,
                    num_partitions=N_FILES).execute(disjoint)
    clean_dir = str(tmp_path / "clean3")
    CheckpointedRun(ExtractPipeline(CLI_CONFIG), out_dir=clean_dir,
                    num_partitions=2).execute(disjoint)

    rerun = CheckpointedRun(ExtractPipeline(CLI_CONFIG), out_dir=out, num_partitions=2)
    rerun.execute(disjoint)
    assert not os.path.exists(os.path.join(out, "part=2"))
    assert not os.path.exists(os.path.join(out, "part=3"))
    assert not os.path.exists(os.path.join(out, "_ckpt", "partition-3.json"))

    def _read_sorted(d: str) -> pd.DataFrame:
        # urls repeat across partitions (partitions dedup independently),
        # so sort on every column for a total order
        df = _read_all(d)
        return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)

    pd.testing.assert_frame_equal(_read_sorted(out), _read_sorted(clean_dir))


def test_lineage_change_invalidates(ray_session, corpus, tmp_path):
    out = str(tmp_path / "out2")
    run = CheckpointedRun(ExtractPipeline(CLI_CONFIG), out_dir=out, num_partitions=2)
    run.execute(corpus)
    # different input set for shard 0 -> lineage mismatch -> recompute
    run2 = CheckpointedRun(ExtractPipeline(CLI_CONFIG), out_dir=out, num_partitions=2)
    altered = list(corpus)
    new_file = str(tmp_path / "extra.parquet")
    shutil.copy(sorted(corpus)[0], new_file)
    altered.append(new_file)
    manifest = run2.execute(altered)
    assert 0 in manifest["completed_this_run"]
