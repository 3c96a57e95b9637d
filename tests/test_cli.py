"""CLI facade smoke (cli.py) — runs in a subprocess because the CLI owns
its own Ray session (driver contract)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pyarrow.dataset as pds
import pyarrow.parquet as pq
import pytest

from rust_paddle_ocr_ray.sources.synth import generate_pages

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def corpus_file(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("cli") / "pages.parquet")
    pq.write_table(generate_pages(60, seed=5), p)
    return p


def _cli(*args: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-m", "rust_paddle_ocr_ray", *args],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=240,
        env={**os.environ, "RAY_ADDRESS": "local"},
    )


def test_cli_parquet_mode(corpus_file, tmp_path):
    out = str(tmp_path / "out")
    r = _cli("--input", corpus_file, "--output", out, "--num-cpus", "4")
    assert r.returncode == 0, r.stderr[-2000:]
    ds = pds.dataset(out, format="parquet")
    assert ds.count_rows() > 0
    assert set(ds.schema.names) >= {"url", "extracted_text", "n_spans", "confidence"}


def test_cli_json_mode(corpus_file, tmp_path):
    out = str(tmp_path / "json_out")
    r = _cli("--input", corpus_file, "--output", out, "--mode", "json", "--num-cpus", "4")
    assert r.returncode == 0, r.stderr[-2000:]
    files = [f for f in os.listdir(out) if f.endswith(".json")]
    assert files
    with open(os.path.join(out, files[0])) as f:
        rec = json.loads(f.readline())
    assert {"url", "text", "confidence", "start", "end"} <= set(rec)


def test_cli_text_mode(corpus_file):
    r = _cli("--input", corpus_file, "--mode", "text", "--limit", "2", "--num-cpus", "4")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "== https://" in r.stdout


def test_address_resolution(monkeypatch):
    from rust_paddle_ocr_ray.cli import _resolve_address

    monkeypatch.delenv("RAY_ADDRESS", raising=False)
    assert _resolve_address(None) == "local"
    assert _resolve_address("auto") == "auto"
    monkeypatch.setenv("RAY_ADDRESS", "ray://head:10001")
    assert _resolve_address(None) == "ray://head:10001"  # job-submit env
    assert _resolve_address("local") == "local"          # flag wins
