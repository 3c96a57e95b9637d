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

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

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


_SENTINEL_SPAN = {
    "block_id": -1, "start": 0, "end": 0, "tstart": 0, "tend": 0,
    "line_start": 0, "line_end": 0, "tag": "", "depth": 0,
    "order": -1, "score": 0.0, "raw": "",
}

# span fields built as numpy arrays (fromiter -> zero-copy pa.array)
_NUMERIC_SPAN_FIELDS = (
    ("block_id", np.int32), ("start", np.int64), ("end", np.int64),
    ("tstart", np.int64), ("tend", np.int64), ("line_start", np.int32),
    ("line_end", np.int32), ("depth", np.int32), ("order", np.int32),
    ("score", np.float32),
)


def detect_batch(batch: pa.Table, cfg: ExtractConfig) -> pa.Table:
    """One Arrow batch of pages -> one Arrow batch of span rows.

    The per-page parse loop is inherent (HTML/PDF tokenizers need Python
    bytes), but the COLUMN build is vectorized: page columns (url,
    warc_ts, lang) are replicated over per-page span counts with one
    ``pc.take`` on the original Arrow arrays (never ``to_pylist``), and
    the numeric span fields are built with ``np.fromiter`` over the flat
    span list — no per-span Python appends (SURVEY §11.2).
    """
    htmls = batch["html"].to_pylist()
    n_pages = len(htmls)
    counts = np.empty(n_pages, dtype=np.int64)
    flat: list[dict] = []

    for i, html_bytes in enumerate(htmls):
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
            spans = [_SENTINEL_SPAN]
        counts[i] = len(spans)
        flat.extend(spans)

    n_spans = len(flat)
    idx = pa.array(np.repeat(np.arange(n_pages, dtype=np.int64), counts))
    cols: dict[str, pa.Array | pa.ChunkedArray] = {
        name: pc.take(batch[name], idx).cast(SPANS_SCHEMA.field(name).type)
        for name in ("url", "warc_ts", "lang")
    }
    for name, np_type in _NUMERIC_SPAN_FIELDS:
        arr = np.fromiter((s[name] for s in flat), dtype=np_type, count=n_spans)
        cols[name] = pa.array(arr, type=SPANS_SCHEMA.field(name).type)
    for name in ("tag", "raw"):
        cols[name] = pa.array([s[name] for s in flat], type=pa.string())

    return pa.Table.from_pydict({name: cols[name] for name in SPANS_SCHEMA.names})


def make_detector(cfg: ExtractConfig):
    """Bind the config; the returned function is the map_batches body."""

    def _detect(batch: pa.Table) -> pa.Table:
        return detect_batch(batch, cfg)

    return _detect
