"""Engine-vs-INDEPENDENT-ORACLE parity for the extraction trio (q23
flagship, q24 detect spans, q30 mixed html/pdf/image) at ANY scale
factor — the committed goldens cover the driver gate's sf0.01 only;
this tool recomputes the oracle (tests/oracle_impl.py) in-process so
no multi-megabyte text goldens need committing for other scales.

    python tools/check_extraction_parity.py [/root/testdata/sf0.1]

Exit 0 = all three byte-identical (sorted-row compare on every
column), 1 otherwise.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sorted(df: pd.DataFrame, by: list[str]) -> pd.DataFrame:
    return df.sort_values(by, kind="mergesort").reset_index(drop=True)


def _diff(name: str, got: pd.DataFrame, want: pd.DataFrame,
          keys: list[str]) -> bool:
    missing = set(want.columns) - set(got.columns)
    extra = set(got.columns) - set(want.columns)
    if missing or extra:
        print(f"{name:8s} SCHEMA MISMATCH missing={sorted(missing)} "
              f"extra={sorted(extra)}")
        return False
    got = _sorted(got[want.columns.tolist()], keys)
    want = _sorted(want, keys)
    if len(got) != len(want):
        print(f"{name:8s} ROWCOUNT MISMATCH engine={len(got)} oracle={len(want)}")
        return False
    for c in want.columns:
        a, b = got[c], want[c]
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            av = a.to_numpy(dtype="float64")
            bv = b.to_numpy(dtype="float64")
            bad = ~(np.isclose(av, bv, rtol=0, atol=1e-9)
                    | (np.isnan(av) & np.isnan(bv)))
        else:
            bad = (a.astype(str) != b.astype(str)).to_numpy()
        if bad.any():
            i = int(np.flatnonzero(bad)[0])
            print(f"{name:8s} VALUE MISMATCH col={c} row={i}: "
                  f"engine={a.iloc[i]!r} oracle={b.iloc[i]!r}")
            return False
    print(f"{name:8s} OK ({len(got)} rows)")
    return True


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from rust_paddle_ocr_ray.config import CLI_CONFIG
    from rust_paddle_ocr_ray.pipelines.catalog import (
        q23_extract,
        q24_detect_spans,
        q30_mixed_extract,
    )
    from rust_paddle_ocr_ray.sources.synth import (
        mixed_pages_from_documents,
        pages_from_documents,
    )
    from tests.oracle_impl import extract_corpus, extract_mixed_corpus

    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"))

    t0 = time.time()
    oracle_rows = extract_corpus(pages_from_documents(docs).to_pylist(),
                                 CLI_CONFIG)
    mixed_rows = extract_mixed_corpus(
        mixed_pages_from_documents(docs).to_pylist(), CLI_CONFIG)
    print(f"oracle computed over {docs.num_rows} docs "
          f"in {time.time() - t0:.1f}s")

    ecols = ["url", "warc_ts", "lang", "extracted_text", "n_spans",
             "confidence"]
    want23 = pd.DataFrame([{k: r[k] for k in ecols} for r in oracle_rows])
    want30 = pd.DataFrame([{k: r[k] for k in ecols} for r in mixed_rows])
    scols = ["block_id", "start", "end", "tstart", "tend", "line_start",
             "line_end", "tag", "depth", "order", "score"]
    want24 = pd.DataFrame(
        [{"url": r["url"], "warc_ts": r["warc_ts"], "lang": r["lang"],
          **{k: s[k] for k in scols}}
         for r in oracle_rows for s in r["spans"]])

    ok = True
    ok &= _diff("q23", q23_extract(sf_dir).to_pandas(), want23, ["url"])
    ok &= _diff("q24", q24_detect_spans(sf_dir).to_pandas(), want24,
                ["url", "block_id", "start"])
    ok &= _diff("q30", q30_mixed_extract(sf_dir).to_pandas(), want30,
                ["url"])
    ray.shutdown()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
