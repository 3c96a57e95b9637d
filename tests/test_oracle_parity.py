"""Spec-equivalence: the engine's pure functions vs the independent oracle
on the deterministic corpus (no Ray needed — the distributed layer is
covered by test_golden_e2e.py)."""

from __future__ import annotations

import pytest

from rust_paddle_ocr_ray.config import CLI_CONFIG, ExtractConfig
from rust_paddle_ocr_ray.functions.decode import canonicalize, decode_spans
from rust_paddle_ocr_ray.functions.html import segment_page
from rust_paddle_ocr_ray.sources.synth import build_page

from . import oracle_impl as oracle


def engine_extract(row: dict, cfg: ExtractConfig) -> tuple[list[dict], str]:
    page = row["html"][: cfg.max_html_bytes].decode("utf-8", errors="replace")
    spans = segment_page(page, cfg) if page else []
    route = oracle.route_of(row["lang"])
    texts = [
        canonicalize(s["raw"][s["tstart"] - s["start"] : s["tend"] - s["start"]], route)
        for s in spans
    ]
    out, confs = decode_spans(texts, route, cfg.min_score, cfg.punct_min_score)
    for s, t, c in zip(spans, out, confs):
        s["text"], s["confidence"] = t, float(c)
    return spans, "\n".join(t for t in out if t)


@pytest.mark.parametrize("cfg", [CLI_CONFIG, ExtractConfig(merge_boxes=True)],
                         ids=["cli", "merge-on"])
def test_engine_matches_oracle_on_corpus(cfg):
    for i in range(150):
        row = build_page(42, i)
        g = oracle.extract_page(row["url"], row["warc_ts"], row["html"], row["lang"], cfg)
        spans, extracted = engine_extract(row, cfg)
        assert extracted == g["extracted_text"], f"page {i}: extracted text diverged"
        gspans = g["spans"]
        assert len(spans) == len(gspans), f"page {i}: span count"
        for s, gs in zip(spans, gspans):
            for key in ("start", "end", "tstart", "tend", "line_start", "line_end",
                        "tag", "depth", "order", "text"):
                assert s[key] == gs[key], f"page {i} span {s['order']}: {key}"
            assert float(s["score"]) == float(gs["score"])
            # numpy pairwise summation vs the oracle's sequential sum differ
            # in the last bits; the byte-identical invariant is the TEXT
            assert s["confidence"] == pytest.approx(gs["confidence"], abs=1e-6)
