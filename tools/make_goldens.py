"""Generate the committed golden layer (FIXTURES.md §3) — run manually:

    python tools/make_goldens.py

Goldens are computed ONCE by the independent oracle (tests/oracle_impl.py)
over the deterministic synthetic corpus (seed=42) and committed; the test
suite never regenerates them.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rust_paddle_ocr_ray.config import CLI_CONFIG
from rust_paddle_ocr_ray.sources.synth import generate_pages
from tests.oracle_impl import extract_corpus

N_PAGES = 240
SEED = 42
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "golden")


def main() -> None:
    pages = generate_pages(N_PAGES, seed=SEED)
    rows = pages.to_pylist()
    results = extract_corpus(rows, CLI_CONFIG)

    extracted = pa.Table.from_pylist(
        [
            {
                "url": r["url"],
                "warc_ts": r["warc_ts"],
                "lang": r["lang"],
                "extracted_text": r["extracted_text"],
                "n_spans": r["n_spans"],
                "confidence": r["confidence"],
            }
            for r in results
        ]
    )
    spans = pa.Table.from_pylist(
        [
            {
                "url": r["url"],
                "block_id": s["block_id"],
                "start": s["start"],
                "end": s["end"],
                "tstart": s["tstart"],
                "tend": s["tend"],
                "order": s["order"],
                "score": float(s["score"]),
                "tag": s["tag"],
                "text": s["text"],
                "confidence": s["confidence"],
            }
            for r in results
            for s in r["spans"]
        ]
    )
    os.makedirs(OUT, exist_ok=True)
    pq.write_table(extracted, os.path.join(OUT, "extracted.parquet"))
    pq.write_table(spans, os.path.join(OUT, "spans.parquet"))
    print(f"wrote {extracted.num_rows} extracted rows, {spans.num_rows} span rows to {OUT}")


if __name__ == "__main__":
    main()
