"""Debug overlay sink — SURVEY §2 S5, the analog of the reference's
draw-boxes-on-the-image example (/root/reference/examples/simple.rs:
96-129, which rasterizes every detected ``Rect`` onto the input photo
and writes a PNG).

The reference overlays rectangles on the source RASTER; this engine's
sources are HTML/PDF byte streams with no raster, so the overlay is a
SCHEMATIC page map: one horizontal band per source line
(``line_start``..``line_end``), box width proportional to the span's
byte length, border redness proportional to the detection score.  The
PNG bytes come from the same pure-public-spec encoder the synthetic
corpus uses (sources/synth.encode_png_rgb) and decode back through
functions/png.decode_png, so the artifact is round-trip testable.

This is DEBUG tooling: a ``groupby(url)`` exchange (every span of a
page on one task) is acceptable here and never appears in the hot
extract path.  At scale you run it on a sampled/filtered slice, not
the full corpus — the output is one PNG per page.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

#: schematic geometry: pixels per source line / per span byte
LINE_HEIGHT = 8
CHAR_PX = 1
MAX_W = 512
MAX_H = 512


def render_overlay(spans: pd.DataFrame) -> tuple[bytes, int, int, int]:
    """Span rows of ONE page -> (png_bytes, width, height, n_spans).

    White canvas sized to the page's line span (clamped to
    ``MAX_W``×``MAX_H``); each real span (block_id >= 0) draws a
    1-px rectangle border colored (255, 255-s, 255-s) where ``s`` is
    the span's score normalized to [0, 255] — detect emits BYTE
    scores (functions/html.block_score, [0, 255]) so those pass
    through; a [0, 1] float normalizes up — deterministic either way,
    so tests assert exact pixels after a PNG round-trip.
    Sentinel-only pages (the zero-span block_id = -1 row) render a
    blank canvas, mirroring the reference's no-boxes output for blank
    inputs (src/main.rs:141-145)."""
    from ..sources.synth import encode_png_rgb

    real = spans[spans["block_id"] >= 0]
    if len(real):
        h = min(MAX_H, LINE_HEIGHT * (int(real["line_end"].max()) + 1))
        w = min(MAX_W, max(CHAR_PX * int((real["end"] - real["start"]).max()),
                           LINE_HEIGHT))
    else:
        h = w = LINE_HEIGHT
    canvas = np.full((h, w, 3), 255, dtype=np.uint8)
    for _, s in real.iterrows():
        y0 = min(h - 1, LINE_HEIGHT * int(s["line_start"]))
        y1 = min(h, LINE_HEIGHT * (int(s["line_end"]) + 1))
        x1 = min(w, max(2, CHAR_PX * int(s["end"] - s["start"])))
        sc = float(s["score"])
        if sc <= 1.0:  # [0,1] float convention -> byte
            sc *= 255.0
        shade = 255 - min(255, max(0, int(round(sc))))
        color = np.array([255, shade, shade], dtype=np.uint8)
        canvas[y0, 0:x1] = color
        canvas[y1 - 1, 0:x1] = color
        canvas[y0:y1, 0] = color
        canvas[y0:y1, x1 - 1] = color
    return encode_png_rgb(canvas), w, h, len(real)


def overlay_pages(spans_ds):
    """Detect-stage span rows -> one overlay PNG row per url:
    ``(url, width, height, n_spans, overlay_png)``.  One groupby(url)
    exchange, then a pure render per group."""

    def _render(g: pd.DataFrame) -> pa.Table:
        png, w, h, n = render_overlay(g)
        return pa.table({
            "url": pa.array([g["url"].iloc[0]], type=pa.string()),
            "width": pa.array([w], type=pa.int32()),
            "height": pa.array([h], type=pa.int32()),
            "n_spans": pa.array([n], type=pa.int32()),
            "overlay_png": pa.array([png], type=pa.binary()),
        })

    return spans_ds.groupby("url").map_groups(_render, batch_format="pandas")
