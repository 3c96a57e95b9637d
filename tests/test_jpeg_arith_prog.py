"""Arithmetic-coded PROGRESSIVE JPEG (SOF10): the T.81 Annex G scan
models driven by the Annex D QM-coder
(functions/jpeg_arith.decode_arith_prog_scan) plus the mirror encoder
(sources/synth.encode_jpeg_arith_progressive).

Validation layers (same charter as tests/test_jpeg_arith.py):
- committed goldens: libjpeg SOF10 streams paired with their
  progressive-HUFFMAN twins, coefficient-identity asserted at
  generation — decode must reproduce the independently-validated SOF2
  path's pixels bit-exactly, WITHOUT libjpeg at test time;
- live differential (gated on the gcc+libjpeg oracle): random images
  in both directions through jpeg_simple_progression's scan script
  (multi-level successive approximation, Al up to 2);
- pure round-trips vs the Huffman progressive twin across layouts,
  crops and restart intervals.
"""
from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rust_paddle_ocr_ray.functions.jpeg import decode_jpeg
from rust_paddle_ocr_ray.sources.synth import (encode_jpeg_arith_progressive,
                                               encode_jpeg_progressive)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "jpeg_arith_prog_goldens.parquet")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import jpeg_arith_oracle as jo  # noqa: E402

ZZ = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])


def test_goldens_match_progressive_huffman_twin_pixels():
    """Each committed libjpeg SOF10 stream decodes to exactly the
    pixels of its coefficient-identical SOF2 twin through the
    already-proven Huffman progressive path — no libjpeg needed at
    test time."""
    tbl = pq.read_table(GOLDEN)
    assert tbl.num_rows >= 10
    for row in tbl.to_pylist():
        arith = decode_jpeg(row["arith_jpg"])
        huff = decode_jpeg(row["huffman_jpg"])
        assert arith.shape == huff.shape, row["name"]
        assert arith.shape[:2] == (row["height"], row["width"]), row["name"]
        assert (arith == huff).all(), row["name"]


@pytest.mark.skipif(not jo.available(), reason="libjpeg oracle absent")
def test_live_decode_sweep_vs_libjpeg():
    """libjpeg encodes SOF10 (jpeg_simple_progression scan script:
    spectral bands + two successive-approximation refinement levels),
    we decode: pixels must equal the Huffman progressive twin's."""
    rng = np.random.default_rng(17)
    for trial in range(14):
        w = int(rng.integers(1, 110))
        h = int(rng.integers(1, 110))
        quality = int(rng.integers(2, 100))
        color = trial % 2 == 1
        subsamp = 2 if (color and trial % 4 == 1) else 1
        rrows = (0, 0, 1, 2)[trial % 4]
        kind = trial % 3
        if kind == 0:
            px = rng.integers(0, 256, (h, w, 3) if color else (h, w),
                              dtype=np.uint8)
        elif kind == 1:
            base = ((np.arange(h)[:, None] * 3 + np.arange(w)[None, :] * 2)
                    % 256).astype(np.uint8)
            px = np.stack([base, base[::-1], 255 - base], -1) if color else base
        else:
            px = np.full((h, w, 3) if color else (h, w), 30, np.uint8)
            px[:, : w // 2] = 220
        a = jo.encode(px, quality=quality, arith=True, restart_rows=rrows,
                      subsamp=subsamp, progressive=True)
        hjp = jo.encode(px, quality=quality, arith=False,
                        restart_rows=rrows, subsamp=subsamp,
                        progressive=True)
        got, ref = decode_jpeg(a), decode_jpeg(hjp)
        assert got.shape == ref.shape
        assert (got == ref).all(), (w, h, quality, color, subsamp, rrows)


@pytest.mark.skipif(not jo.available(), reason="libjpeg oracle absent")
def test_live_encode_sweep_read_by_libjpeg():
    """Our SOF10 encoder's streams read back IDENTICAL quantized
    coefficients through jpeg_read_coefficients — the mirror encoder
    is proven against the independent implementation too."""
    rng = np.random.default_rng(23)
    for trial in range(10):
        color = trial % 2 == 1
        samplings = ([(2, 2), (1, 1), (1, 1)]
                     if (color and trial % 4 == 1)
                     else [(1, 1)] * (3 if color else 1))
        mcux, mcuy = int(rng.integers(1, 5)), int(rng.integers(1, 5))
        ri = (0, 0, 2, 3)[trial % 4]
        coefs = []
        for (hi, vi) in samplings:
            c = np.zeros((mcuy * vi, mcux * hi, 64), np.int64)
            mask = rng.random(c.shape) < 0.2
            c[mask] = rng.integers(-900, 900, mask.sum())
            coefs.append(c)
        jpg = encode_jpeg_arith_progressive(
            coefs, samplings if color else None, restart_interval=ri)
        got = jo.coefficients(jpg)
        for want_zz, have_nat in zip(coefs, got):
            nat = np.zeros_like(want_zz)
            nat[:, :, ZZ] = want_zz
            assert have_nat.shape == nat.shape
            assert (have_nat == nat).all()


def test_dc_only_roundtrip_is_lossless():
    """DC-only coefficients through the full SOF10 scan script decode
    to flat blocks — the closed form the q82 gate rows assume."""
    blocks = (np.arange(20, dtype=np.int64).reshape(4, 5) * 13 + 2) % 256
    coefs = np.zeros((4, 5, 64), np.int64)
    coefs[:, :, 0] = 8 * (blocks - 128)
    px = decode_jpeg(encode_jpeg_arith_progressive([coefs]))
    want = np.repeat(np.repeat(blocks.astype(np.uint8), 8, 0), 8, 1)
    assert (px == want).all()


@settings(max_examples=20, deadline=None)
@given(seed=st.integers(0, 9999))
def test_roundtrip_matches_huffman_twin_property(seed):
    """Random sparse coefficients, layouts, crops and restart
    intervals: the SOF10 stream and the SOF2 stream of the same
    coefficients decode to identical pixels (both pure-Python paths,
    each independently oracle-proven)."""
    rng = np.random.default_rng(seed)
    color = bool(rng.integers(0, 2))
    samplings = [(1, 1)] * (3 if color else 1)
    if color and rng.integers(0, 2):
        samplings[0] = (int(rng.integers(1, 3)), int(rng.integers(1, 3)))
    hmax = max(s[0] for s in samplings)
    vmax = max(s[1] for s in samplings)
    mcux, mcuy = int(rng.integers(1, 4)), int(rng.integers(1, 4))
    w = mcux * hmax * 8 - int(rng.integers(0, 8 * hmax - 1))
    h = mcuy * vmax * 8 - int(rng.integers(0, 8 * vmax - 1))
    ri = int(rng.integers(0, 4))
    coefs = []
    for (hi, vi) in samplings:
        c = np.zeros((mcuy * vi, mcux * hi, 64), np.int64)
        mask = rng.random(c.shape) < 0.3
        c[mask] = rng.integers(-1000, 1000, mask.sum())
        coefs.append(c)
    sam = samplings if color else None
    a = decode_jpeg(encode_jpeg_arith_progressive(
        coefs, sam, w=w, h=h, restart_interval=ri))
    huf = decode_jpeg(encode_jpeg_progressive(
        coefs, sam, w=w, h=h, restart_interval=ri))
    assert a.shape == huf.shape
    assert (a == huf).all()


def test_truncated_sof10_degrades():
    """Truncation feeds zero data; decode must terminate (fixed block
    counts per scan) and never hang — wrong pixels or ValueError are
    both acceptable degrade outcomes, crashes are not."""
    blocks = (np.arange(12, dtype=np.int64).reshape(3, 4) * 17) % 256
    coefs = np.zeros((3, 4, 64), np.int64)
    coefs[:, :, 0] = 8 * (blocks - 128)
    jpg = encode_jpeg_arith_progressive([coefs])
    for cut in (len(jpg) - 3, 2 * len(jpg) // 3, len(jpg) // 2):
        try:
            px = decode_jpeg(jpg[:cut] + b"\xff\xd9")
            assert px.shape == (24, 32)
        except ValueError:
            pass
        except IndexError:
            # a cut inside a marker-segment header; the production
            # boundary (stages/multimodal.decode_payload) converts
            # IndexError to the ValueError degrade contract
            pass
