"""Detection stage: pages -> span rows (stateless ``map_batches``).

The analog of ``Det::find_text_rect`` (/root/reference/src/det.rs:121-132).
Each payload is routed by magic bytes (functions/pdf.sniff_payload):
``%PDF`` payloads take the pure-Python PDF text-block path
(functions/pdf.py — north_rule "PDF/layout parse"); image payloads
(PNG/JPEG/GIF/WEBP) emit one ``tag="image"`` span carrying header
metadata (format + dimensions) when the container header parses, else
the bare sentinel; everything
else is decoded (F7, UTF-8 with replacement), segmented into scored
blocks, thresholded, min-size-filtered, border-expanded and optionally
merged (functions/html.py).  All routes emit FLAT span rows — one row
per detected region, the analog of ``Vec<Rect>`` per image — so Ray
can split heavy pages across downstream blocks (skew handling,
SURVEY.md §4).

Pages with zero detected spans emit one sentinel row (block_id = -1,
empty raw) so the url survives the merge-stage groupby and yields an
empty-extraction row, mirroring the reference's empty-``Vec<String>``
result for blank images (src/main.rs:141-145).

Detection is pure (no model weights) -> plain function, stateless Ray
tasks; SURVEY.md §2.3 ST1.
"""

from __future__ import annotations

import pyarrow as pa

from ..config import ExtractConfig
from ..functions.html import segment_page
from ..functions.pdf import extract_pdf_spans, image_meta_span, sniff_payload

SPANS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("lang", pa.string()),
        ("block_id", pa.int32()),
        ("start", pa.int64()),
        ("end", pa.int64()),
        ("tstart", pa.int64()),
        ("tend", pa.int64()),
        ("line_start", pa.int32()),
        ("line_end", pa.int32()),
        ("tag", pa.string()),
        ("depth", pa.int32()),
        ("order", pa.int32()),
        ("score", pa.float32()),
        ("raw", pa.string()),
    ]
)


def detect_batch(batch: pa.Table, cfg: ExtractConfig) -> pa.Table:
    """One Arrow batch of pages -> one Arrow batch of span rows."""
    urls = batch["url"].to_pylist()
    tss = batch["warc_ts"].to_pylist()
    langs = batch["lang"].to_pylist()
    htmls = batch["html"].to_pylist()

    cols: dict[str, list] = {name: [] for name in SPANS_SCHEMA.names}

    for url, ts, lang, html_bytes in zip(urls, tss, langs, htmls):
        payload = (html_bytes or b"")[: cfg.max_html_bytes]
        kind = sniff_payload(payload)
        if kind == "pdf":
            spans = extract_pdf_spans(payload, cfg)
        elif kind == "image":
            spans = [image_meta_span(payload)]
        else:
            page = payload.decode("utf-8", errors="replace")
            spans = segment_page(page, cfg) if page else []
        if not spans:
            spans = [
                {
                    "block_id": -1, "start": 0, "end": 0, "tstart": 0, "tend": 0,
                    "line_start": 0, "line_end": 0, "tag": "", "depth": 0,
                    "order": -1, "score": 0.0, "raw": "",
                }
            ]
        for s in spans:
            cols["url"].append(url)
            cols["warc_ts"].append(ts)
            cols["lang"].append(lang)
            for k in (
                "block_id", "start", "end", "tstart", "tend", "line_start",
                "line_end", "tag", "depth", "order", "score", "raw",
            ):
                cols[k].append(s[k])

    return pa.Table.from_pydict(
        {name: pa.array(cols[name], type=SPANS_SCHEMA.field(name).type) for name in SPANS_SCHEMA.names}
    )


def make_detector(cfg: ExtractConfig):
    """Bind the config; the returned function is the map_batches body."""

    def _detect(batch: pa.Table) -> pa.Table:
        return detect_batch(batch, cfg)

    return _detect
