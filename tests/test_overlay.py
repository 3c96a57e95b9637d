"""Debug overlay sink (stages/overlay.py, SURVEY §2 S5): schematic
span rasters round-trip through the pure-Python PNG pair
(synth.encode_png_rgb -> functions/png.decode_png) with exact border
pixels; sentinel pages render blank; the Ray path emits one row per
url from detect output."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

import ray.data as rd

from rust_paddle_ocr_ray.functions.png import decode_png
from rust_paddle_ocr_ray.stages.overlay import (
    LINE_HEIGHT,
    overlay_pages,
    render_overlay,
)


def _span(url, block_id, start, end, line_start, line_end, score):
    return {
        "url": url, "block_id": block_id, "start": start, "end": end,
        "line_start": line_start, "line_end": line_end, "score": score,
    }


def test_render_overlay_exact_pixels():
    df = pd.DataFrame([
        _span("u", 0, 0, 40, 0, 1, 255.0),   # full-red box (BYTE score)
        _span("u", 1, 100, 120, 3, 3, 0.5),  # half-red box ([0,1] float)
    ])
    png, w, h, n = render_overlay(df)
    assert n == 2
    assert (w, h) == (40, LINE_HEIGHT * 4)
    px = decode_png(png)
    if px.ndim == 2:
        px = np.repeat(px[:, :, None], 3, axis=2)
    assert px.shape == (h, w, 3)
    # box 1: top border row 0, x 0..39, color (255, 0, 0)
    assert (px[0, :40] == np.array([255, 0, 0])).all()
    # bottom border at the last row of line 1
    assert (px[2 * LINE_HEIGHT - 1, :40] == np.array([255, 0, 0])).all()
    # box 2: top border at line 3, width 20, color (255, 127, 127)
    shade = 255 - round(255 * 0.5)
    assert (px[3 * LINE_HEIGHT, :20] == np.array([255, shade, shade])).all()
    # interior of nothing: a pixel outside every border stays white
    assert (px[LINE_HEIGHT, 20] == 255).all()


def test_render_overlay_sentinel_blank():
    df = pd.DataFrame([_span("u", -1, 0, 0, 0, 0, 0.0)])
    png, w, h, n = render_overlay(df)
    assert n == 0
    px = decode_png(png)
    assert px.shape[:2] == (LINE_HEIGHT, LINE_HEIGHT)
    assert (px == 255).all()


def test_overlay_pages_end_to_end(ray_session, tmp_path):
    """detect -> overlay_pages: one PNG row per url, sentinel pages
    included, artifact decodable after a parquet round-trip."""
    from rust_paddle_ocr_ray import CLI_CONFIG
    from rust_paddle_ocr_ray.pipelines.extract import ExtractPipeline
    from rust_paddle_ocr_ray.sources.synth import generate_pages

    pq.write_table(generate_pages(40, seed=3), str(tmp_path / "p.parquet"))
    pipe = ExtractPipeline(CLI_CONFIG)
    spans = pipe.detect(pipe.read_pages(str(tmp_path / "p.parquet")))
    out = overlay_pages(spans)
    out.write_parquet(str(tmp_path / "ovl"))
    df = pq.read_table(str(tmp_path / "ovl")).to_pandas()
    assert df["url"].is_unique
    assert (df["n_spans"] >= 0).all()
    some = df[df["n_spans"] > 0].iloc[0]
    px = decode_png(some["overlay_png"])
    assert px.shape[0] == some["height"] and px.shape[1] == some["width"]
    # real detect scores are bytes (threshold 200): the border must be
    # strongly red, not wrapped-to-near-white (the score-domain bug)
    arr = np.asarray(px)
    assert (arr != 255).any()
    reds = arr[(arr[:, :, 0] == 255) & (arr[:, :, 1] < 255)]
    assert len(reds) and (reds[:, 1] < 64).any()
    blank = df[df["n_spans"] == 0]
    if len(blank):
        bpx = decode_png(blank.iloc[0]["overlay_png"])
        assert (np.asarray(bpx) == 255).all()
