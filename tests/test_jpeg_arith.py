"""Arithmetic-coded JPEG (SOF9): QM-coder decode + mirror encoder.

Validation layers (functions/jpeg_arith.py module doc):
- committed goldens: libjpeg-encoded SOF9 streams paired with their
  Huffman twins, coefficient-identity asserted at generation — the
  arithmetic decode must reproduce the independently-validated
  baseline path's pixels bit-exactly, WITHOUT libjpeg at test time;
- live differential (gated on the gcc+libjpeg oracle): random
  images in both directions — libjpeg encodes / we decode, we encode
  / libjpeg reads back identical quantized coefficients;
- pure round-trips: the synth DC-only arithmetic encoder decodes
  losslessly (the closed form the q82 arithmetic gate rows assume).
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
from rust_paddle_ocr_ray.sources.synth import (encode_jpeg_arith,
                                               encode_jpeg_arith_gray_dc)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "jpeg_arith_goldens.parquet")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import jpeg_arith_oracle as jo  # noqa: E402

ZZ = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])


def test_goldens_match_huffman_twin_pixels():
    """Each committed libjpeg SOF9 stream decodes to exactly the
    pixels of its coefficient-identical Huffman twin through the
    already-proven baseline path — no libjpeg needed at test time."""
    tbl = pq.read_table(GOLDEN)
    for row in tbl.to_pylist():
        arith = decode_jpeg(row["arith_jpg"])
        huff = decode_jpeg(row["huffman_jpg"])
        assert arith.shape == huff.shape, row["name"]
        assert arith.shape[:2] == (row["height"], row["width"]), row["name"]
        assert (arith == huff).all(), row["name"]


def test_qm_table_matches_normative_source():
    """The committed Table D.3 module matches the system libjpeg's
    transcription bit-for-bit (skips where the library is absent)."""
    import ctypes
    import ctypes.util

    from rust_paddle_ocr_ray.functions.qm_table import (NLPS, NMPS, QE,
                                                        SWITCH)
    path = ctypes.util.find_library("jpeg")
    if path is None:
        pytest.skip("no system libjpeg")
    lib = ctypes.CDLL(path)
    raw = (ctypes.c_int64 * 114).in_dll(lib, "jpeg_aritab")
    for i, v in enumerate(raw):
        assert QE[i] == (v >> 16) & 0xFFFF
        assert NMPS[i] == (v >> 8) & 0xFF
        assert NLPS[i] == v & 0x7F
        assert SWITCH[i] == (v >> 7) & 1


@pytest.mark.skipif(not jo.available(), reason="libjpeg oracle absent")
def test_live_decode_sweep_vs_libjpeg():
    """libjpeg encodes, we decode: pixels must equal the baseline
    path's decode of the Huffman twin across gray/color, 4:2:0,
    restarts and the quality range."""
    rng = np.random.default_rng(7)
    for trial in range(20):
        w = int(rng.integers(1, 120))
        h = int(rng.integers(1, 120))
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
        a = jo.encode(px, quality=quality, arith=True,
                      restart_rows=rrows, subsamp=subsamp)
        hjp = jo.encode(px, quality=quality, arith=False,
                        restart_rows=rrows, subsamp=subsamp)
        got, ref = decode_jpeg(a), decode_jpeg(hjp)
        assert got.shape == ref.shape
        assert (got == ref).all(), (w, h, quality, color, subsamp, rrows)


@pytest.mark.skipif(not jo.available(), reason="libjpeg oracle absent")
def test_live_encode_sweep_read_by_libjpeg():
    """We encode, libjpeg reads back: the quantized coefficients must
    be identical — the encoder is proven against the independent
    implementation, not just our own decoder."""
    rng = np.random.default_rng(11)
    for trial in range(10):
        color = trial % 2 == 1
        samplings = ([(2, 2), (1, 1), (1, 1)]
                     if (color and trial % 4 == 1)
                     else [(1, 1)] * (3 if color else 1))
        mcux, mcuy = int(rng.integers(1, 5)), int(rng.integers(1, 5))
        coefs = []
        for (hi, vi) in samplings:
            c = np.zeros((mcuy * vi, mcux * hi, 64), np.int64)
            mask = rng.random(c.shape) < 0.2
            c[mask] = rng.integers(-900, 900, mask.sum())
            coefs.append(c)
        jpg = encode_jpeg_arith(coefs, samplings if color else None)
        got = jo.coefficients(jpg)
        for want_zz, have_nat in zip(coefs, got):
            nat = np.zeros_like(want_zz)
            nat[:, :, ZZ] = want_zz
            assert have_nat.shape == nat.shape
            assert (have_nat == nat).all()


def test_dc_only_roundtrip_is_lossless():
    blocks = (np.arange(20, dtype=np.int64).reshape(4, 5) * 13 + 2) % 256
    px = decode_jpeg(encode_jpeg_arith_gray_dc(blocks))
    want = np.repeat(np.repeat(blocks.astype(np.uint8), 8, 0), 8, 1)
    assert (px == want).all()


def test_own_encoder_own_decoder_with_ac():
    """Full coefficient round-trip through our encoder and decoder
    alone (the oracle-free leg): sparse AC values survive exactly."""
    rng = np.random.default_rng(3)
    c = np.zeros((3, 4, 64), np.int64)
    mask = rng.random(c.shape) < 0.25
    c[mask] = rng.integers(-500, 500, mask.sum())
    jpg = encode_jpeg_arith([c])
    px = decode_jpeg(jpg)
    # independent reconstruction: dequant(=1) + float IDCT per block
    from rust_paddle_ocr_ray.functions.jpeg import ZIGZAG, idct2
    want = np.zeros((24, 32), np.uint8)
    for by in range(3):
        for bx in range(4):
            coef = np.zeros(64)
            coef[ZIGZAG] = c[by, bx]  # zigzag -> natural
            blk = np.clip(np.rint(idct2(coef.reshape(8, 8)) + 128.0),
                          0, 255)
            want[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = blk
    assert (px == want).all()


@settings(max_examples=25, deadline=None)
@given(by=st.integers(1, 3), bx=st.integers(1, 4), seed=st.integers(0, 999))
def test_dc_only_roundtrip_property(by, bx, seed):
    rng = np.random.default_rng(seed)
    blocks = rng.integers(0, 256, (by, bx), dtype=np.int64)
    px = decode_jpeg(encode_jpeg_arith_gray_dc(blocks))
    want = np.repeat(np.repeat(blocks.astype(np.uint8), 8, 0), 8, 1)
    assert (px == want).all()


def test_relabelled_sequential_frame_fails_loudly():
    """Relabeling a SEQUENTIAL arithmetic scan's frame as SOF10 must
    still fail loudly (the Ss=0/Se=63 scan is illegal in a
    progressive frame), never decode wrong."""
    blocks = np.full((1, 1), 99, np.int64)
    jpg = bytearray(encode_jpeg_arith_gray_dc(blocks))
    i = jpg.index(b"\xff\xc9")
    jpg[i + 1] = 0xCA
    with pytest.raises(ValueError, match="Se != 0"):
        decode_jpeg(bytes(jpg))


# --- lossless (SOF11, Annex H over the QM coder) ----------------------

def test_arith_lossless_roundtrip_all_predictors():
    """SOF11 decodes for real: arbitrary pixels round-trip EXACTLY
    through the mirror encoder for every predictor 1-7 (the same
    defining property as the SOF3 suite in test_jpeg.py — the two
    modes share the prediction layer and differ only in the entropy
    coder, whose QM machinery is libjpeg-validated via SOF9/SOF10)."""
    from rust_paddle_ocr_ray.functions.jpeg import decode_jpeg_gray
    from rust_paddle_ocr_ray.sources.synth import (
        encode_jpeg_arith_lossless,
        encode_jpeg_lossless,
    )

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (13, 11), dtype=np.uint8)
    for sel in range(1, 8):
        got = decode_jpeg_gray(encode_jpeg_arith_lossless(
            img, predictor=sel))
        assert (got == img).all(), f"predictor {sel}"
        # pixel parity with the Huffman (SOF3) form of the same image
        huff = decode_jpeg_gray(encode_jpeg_lossless(img, predictor=sel))
        assert (got == huff).all(), f"SOF3/SOF11 split, predictor {sel}"


def test_arith_lossless_point_transform_and_edges():
    from rust_paddle_ocr_ray.functions.jpeg import decode_jpeg_gray
    from rust_paddle_ocr_ray.sources.synth import encode_jpeg_arith_lossless

    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, (10, 7), dtype=np.uint8)
    for pt in range(4):
        got = decode_jpeg_gray(encode_jpeg_arith_lossless(
            img, predictor=4, pt=pt))
        assert (got == (img >> pt) << pt).all(), f"pt {pt}"
    for h, w in ((1, 1), (1, 9), (9, 1)):
        e = rng.integers(0, 256, (h, w), dtype=np.uint8)
        got = decode_jpeg_gray(encode_jpeg_arith_lossless(e, predictor=7))
        assert got.shape == (h, w) and (got == e).all(), (h, w)


def test_arith_lossless_color_both_scan_layouts():
    """3-component SOF11, interleaved single scan AND one scan per
    component, through the module's pinned BT.601 composition."""
    from rust_paddle_ocr_ray.functions.jpeg import (
        _ycbcr_to_rgb,
        decode_jpeg,
    )
    from rust_paddle_ocr_ray.sources.synth import encode_jpeg_arith_lossless

    rng = np.random.default_rng(13)
    img3 = rng.integers(0, 256, (9, 8, 3), dtype=np.uint8)
    want = _ycbcr_to_rgb([img3[:, :, i] for i in range(3)])
    for inter in (True, False):
        got = decode_jpeg(encode_jpeg_arith_lossless(
            img3, predictor=5, interleaved=inter))
        assert got.shape == (9, 8, 3) and (got == want).all(), inter


def test_arith_lossless_nondefault_conditioning():
    """Non-default (L, U) bounds move the Da/Db classification
    boundaries (Annex H over F.1.4.4.1.1); encoder and decoder must
    agree for every legal combination — including L high enough that
    small nonzero diffs classify as 'zero'."""
    from rust_paddle_ocr_ray.functions.jpeg_arith import (
        decode_arith_lossless_scan,
        encode_arith_lossless_scan,
    )

    rng = np.random.default_rng(14)
    img = rng.integers(0, 256, (8, 9), dtype=np.int32)
    for dl, du in ((0, 1), (0, 3), (2, 4), (4, 8)):
        cond = {0: (dl, du)}
        ent = encode_arith_lossless_scan([img], [0], 4, 0, cond)
        planes, _end = decode_arith_lossless_scan(
            ent + b"\xff\xd9", 0, 9, 8, [0], 4, 0, cond)
        assert (planes[0] == img).all(), (dl, du)


def test_arith_lossless_truncation_degrades():
    """Truncation feeds zero data into the QM coder; the fixed h*w
    sample walk must terminate with wrong pixels or ValueError,
    never hang or crash."""
    from rust_paddle_ocr_ray.functions.jpeg import decode_jpeg
    from rust_paddle_ocr_ray.sources.synth import encode_jpeg_arith_lossless

    rng = np.random.default_rng(15)
    img = rng.integers(0, 256, (12, 12), dtype=np.uint8)
    jpg = encode_jpeg_arith_lossless(img, predictor=2)
    for cut in (len(jpg) - 3, len(jpg) * 3 // 4):
        try:
            px = decode_jpeg(jpg[:cut] + b"\xff\xd9")
            assert px.shape == (12, 12)
        except ValueError:
            pass


def test_truncated_arith_degrades():
    """Truncation feeds zero data; decode must terminate (fixed MCU
    count) and never hang — wrong pixels or ValueError are both
    acceptable degrade outcomes, crashes are not."""
    blocks = (np.arange(12, dtype=np.int64).reshape(3, 4) * 17) % 256
    jpg = encode_jpeg_arith_gray_dc(blocks)
    for cut in (len(jpg) - 3, len(jpg) // 2):
        try:
            px = decode_jpeg(jpg[:cut] + b"\xff\xd9")
            assert px.shape == (24, 32)
        except ValueError:
            pass
