"""Baseline-JPEG decoder (functions/jpeg.py) tests: lossless DC-only
round-trips through the real Huffman + IDCT path, an AC-coefficient
stream built byte-by-byte in the test, marker/subset rejections, and
the real_decode dispatch."""

from __future__ import annotations

import numpy as np
import pytest

from rust_paddle_ocr_ray.functions.jpeg import ZIGZAG, decode_jpeg_gray, idct2
from rust_paddle_ocr_ray.sources.synth import encode_jpeg_gray_dc
from rust_paddle_ocr_ray.stages.multimodal import real_decode


def test_dc_only_roundtrip_is_lossless():
    rng = np.random.RandomState(9)
    for shape in [(1, 1), (3, 2), (5, 5)]:
        blocks = rng.randint(0, 256, shape).astype(np.uint8)
        px = decode_jpeg_gray(encode_jpeg_gray_dc(blocks))
        want = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
        np.testing.assert_array_equal(px, want)


def test_dc_extremes_and_ff_stuffing():
    # 0 and 255 produce the largest DC categories; long runs of equal
    # blocks force zero-diffs; the stream routinely contains 0xFF bytes
    blocks = np.array([[0, 255, 0, 255, 255, 255, 255, 255]], dtype=np.uint8)
    data = encode_jpeg_gray_dc(blocks)
    px = decode_jpeg_gray(data)
    want = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
    np.testing.assert_array_equal(px, want)


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body


def test_ac_coefficient_and_zigzag_placement():
    # hand-built single-block scan: DC cat 0 ('00' per Annex K), then
    # AC symbol 0x07 (run 0, size 7; +100 is category 7) with value
    # bits 1100100 -> zigzag k=1 gets +100, then EOB.
    # AC table here: 0x00 -> '0', 0x07 -> '10'.
    dqt = _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = _seg(0xC0, bytes([8]) + (8).to_bytes(2, "big")
               + (8).to_bytes(2, "big") + bytes([1, 1, 0x11, 0]))
    dc_bits = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
    dht_dc = _seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(range(12)))
    dht_ac = _seg(0xC4, bytes([0x10]) + bytes([1, 1] + [0] * 14)
                  + bytes([0x00, 0x07]))
    sos = _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    # bits: DC '00' + AC '10' + value 100 (7 bits: 1100100) + EOB '0'
    # = 0010 1100 1000 -> pad with 1s to 2 bytes
    scan = bytes([0b00101100, 0b10001111])
    data = (b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos + scan
            + b"\xff\xd9")
    px = decode_jpeg_gray(data)
    coef = np.zeros((8, 8))
    coef.reshape(-1)[ZIGZAG[1]] = 100.0
    want = np.clip(np.rint(idct2(coef) + 128.0), 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(px, want)
    assert px.min() != px.max()  # the AC coefficient actually landed


def test_sof1_extended_sequential_decodes_as_baseline():
    """SOF1 (extended sequential) is a strict superset of baseline at
    8-bit precision (T.81 Table B.1: it only adds 12-bit precision
    and Huffman tables 2/3), so relabeling a baseline frame as SOF1
    must decode to identical pixels — and 12-bit precision must stay
    a clean rejection."""
    blocks = (np.arange(12, dtype=np.int64).reshape(3, 4) * 19 + 5) % 256
    data = bytearray(encode_jpeg_gray_dc(blocks))
    want = decode_jpeg_gray(bytes(data))
    i = data.index(b"\xff\xc0")
    data[i + 1] = 0xC1
    got = decode_jpeg_gray(bytes(data))
    assert (got == want).all()
    data[i + 4] = 12  # P=12: extended precision stays declared out
    with pytest.raises(ValueError, match="8-bit"):
        decode_jpeg_gray(bytes(data))


def test_rejects_outside_subset():
    blocks = np.array([[7]], dtype=np.uint8)
    data = bytearray(encode_jpeg_gray_dc(blocks))
    i = data.index(b"\xff\xc0")
    prog = data.copy()
    prog[i + 1] = 0xC2  # progressive SOF
    with pytest.raises(ValueError):
        decode_jpeg_gray(bytes(prog))
    with pytest.raises(ValueError):
        decode_jpeg_gray(b"\xff\xd8\xff\xd9")  # no scan
    with pytest.raises(ValueError):
        decode_jpeg_gray(b"not a jpeg")


def test_real_decode_dispatches_jpeg():
    blocks = np.array([[10, 200], [30, 40]], dtype=np.uint8)
    w, h, feat = real_decode(encode_jpeg_gray_dc(blocks))
    assert (w, h) == (16, 16)
    assert abs(feat[0] - blocks.mean() / 255.0) < 1e-6


def _encode_color_dc(y_blocks: np.ndarray) -> bytes:
    """3-component DC-only encoder for the test: Y from blocks,
    Cb = Cr = constant 128 (chroma DC 0), all at 1x1 sampling."""
    by, bx = y_blocks.shape
    h, w = by * 8, bx * 8
    dqt = _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = _seg(0xC0, bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
               + bytes([3,
                        1, 0x11, 0,
                        2, 0x11, 0,
                        3, 0x11, 0]))
    dc_bits = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
    dht_dc = _seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(range(12)))
    dht_ac = _seg(0xC4, bytes([0x10]) + bytes([1] + [0] * 15) + bytes([0x00]))
    sos = _seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))

    codes = {}
    code = k = 0
    for ln in range(1, 17):
        for _ in range(dc_bits[ln - 1]):
            codes[k] = (code, ln)
            code += 1
            k += 1
        code <<= 1

    out = bytearray()
    acc = nb = 0

    def emit(c, ln):
        nonlocal acc, nb
        acc = (acc << ln) | c
        nb += ln
        while nb >= 8:
            byte = (acc >> (nb - 8)) & 0xFF
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)
            nb -= 8
        acc &= (1 << nb) - 1

    pred_y = 0
    for v in y_blocks.ravel().tolist():
        dcv = 8 * (int(v) - 128)
        diff = dcv - pred_y
        pred_y = dcv
        t = int(abs(diff)).bit_length() if diff else 0
        c, ln = codes[t]
        emit(c, ln)
        if t:
            emit(diff if diff >= 0 else diff + (1 << t) - 1, t)
        emit(0, 1)  # Y EOB
        for _chroma in range(2):  # Cb, Cr: DC diff 0, EOB
            c, ln = codes[0]
            emit(c, ln)
            emit(0, 1)
    if nb:
        emit((1 << (8 - nb)) - 1, 8 - nb)
    return (b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos + bytes(out)
            + b"\xff\xd9")


def test_color_jpeg_1x1_neutral_chroma_is_lossless():
    from rust_paddle_ocr_ray.functions.jpeg import decode_jpeg

    blocks = np.array([[0, 77], [200, 255]], dtype=np.uint8)
    px = decode_jpeg(_encode_color_dc(blocks))
    assert px.shape == (16, 16, 3)
    want = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
    for c in range(3):  # Cb=Cr=128 -> R=G=B=Y exactly
        np.testing.assert_array_equal(px[:, :, c], want)


def test_gray_helper_rejects_color():
    from rust_paddle_ocr_ray.functions.jpeg import decode_jpeg_gray

    with pytest.raises(ValueError):
        decode_jpeg_gray(_encode_color_dc(np.array([[1]], dtype=np.uint8)))


def test_real_decode_dispatches_color_jpeg():
    blocks = np.array([[50, 150]], dtype=np.uint8)
    w, h, feat = real_decode(_encode_color_dc(blocks))
    assert (w, h) == (16, 8)
    assert abs(feat[0] - blocks.mean() / 255.0) < 1e-6


def test_restart_intervals():
    # gray DC-only stream with DRI=2: RSTn every 2 blocks, byte-aligned,
    # DC predictor reset (each segment re-encodes its first block as a
    # full delta from 0)
    blocks = [10, 250, 40, 90, 170]  # 5 blocks, RST0 after 2, RST1 after 4
    dqt = _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = _seg(0xC0, bytes([8]) + (8).to_bytes(2, "big")
               + (40).to_bytes(2, "big") + bytes([1, 1, 0x11, 0]))
    dc_bits = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
    dht_dc = _seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(range(12)))
    dht_ac = _seg(0xC4, bytes([0x10]) + bytes([1] + [0] * 15) + bytes([0x00]))
    dri = _seg(0xDD, (2).to_bytes(2, "big"))
    sos = _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))

    codes = {}
    code = k = 0
    for ln in range(1, 17):
        for _ in range(dc_bits[ln - 1]):
            codes[k] = (code, ln)
            code += 1
            k += 1
        code <<= 1

    out = bytearray()
    acc = nb = 0

    def emit(c, ln):
        nonlocal acc, nb
        acc = (acc << ln) | c
        nb += ln
        while nb >= 8:
            byte = (acc >> (nb - 8)) & 0xFF
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)
            nb -= 8
        acc &= (1 << nb) - 1

    def flush_pad():
        nonlocal acc, nb
        if nb:
            emit((1 << (8 - nb)) - 1, 8 - nb)

    pred = 0
    for i, v in enumerate(blocks):
        if i and i % 2 == 0:
            flush_pad()
            out.extend([0xFF, 0xD0 + (i // 2 - 1) % 8])
            pred = 0
        dcv = 8 * (v - 128)
        diff = dcv - pred
        pred = dcv
        t = int(abs(diff)).bit_length() if diff else 0
        c, ln = codes[t]
        emit(c, ln)
        if t:
            emit(diff if diff >= 0 else diff + (1 << t) - 1, t)
        emit(0, 1)
    flush_pad()
    data = (b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + dri + sos
            + bytes(out) + b"\xff\xd9")
    from rust_paddle_ocr_ray.functions.jpeg import decode_jpeg_gray as dj
    px = dj(data)
    want = np.repeat(np.repeat(np.array([blocks], dtype=np.uint8),
                               8, axis=0), 8, axis=1)
    np.testing.assert_array_equal(px, want)


# --- lossless (SOF3, T.81 Annex H) -------------------------------------

def test_lossless_roundtrip_all_predictors():
    """Every predictor 1-7 reconstructs an arbitrary-pixel image
    EXACTLY (the mode's defining property; lossless needs no block
    structure, unlike the DC-only gates above)."""
    from rust_paddle_ocr_ray.functions.jpeg import decode_jpeg
    from rust_paddle_ocr_ray.sources.synth import encode_jpeg_lossless

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (13, 21)).astype(np.uint8)
    for sel in range(1, 8):
        got = decode_jpeg(encode_jpeg_lossless(img, predictor=sel))
        np.testing.assert_array_equal(got, img)


def test_lossless_point_transform():
    """Pt > 0 codes px >> Pt; the decoder outputs (px >> Pt) << Pt."""
    from rust_paddle_ocr_ray.functions.jpeg import decode_jpeg
    from rust_paddle_ocr_ray.sources.synth import encode_jpeg_lossless

    rng = np.random.RandomState(4)
    img = rng.randint(0, 256, (9, 9)).astype(np.uint8)
    for pt in (1, 2, 5):
        got = decode_jpeg(encode_jpeg_lossless(img, predictor=4, pt=pt))
        np.testing.assert_array_equal(
            got, ((img.astype(np.int64) >> pt) << pt).astype(np.uint8))


def test_lossless_edge_geometries():
    """1×1, single-row and single-column images exercise the
    corner-default / first-line-Ra / first-column-Rb rules alone."""
    from rust_paddle_ocr_ray.functions.jpeg import decode_jpeg
    from rust_paddle_ocr_ray.sources.synth import encode_jpeg_lossless

    rng = np.random.RandomState(5)
    for shape in [(1, 1), (1, 17), (17, 1), (2, 2)]:
        img = rng.randint(0, 256, shape).astype(np.uint8)
        for sel in (1, 2, 4, 7):
            got = decode_jpeg(encode_jpeg_lossless(img, predictor=sel))
            np.testing.assert_array_equal(got, img)


def test_lossless_color_both_scan_layouts():
    """3-component lossless (interleaved single scan AND one scan per
    component) matches the module's pinned BT.601 conversion applied
    to the exact reconstructed planes."""
    from rust_paddle_ocr_ray.functions.jpeg import _ycbcr_to_rgb, decode_jpeg
    from rust_paddle_ocr_ray.sources.synth import encode_jpeg_lossless

    rng = np.random.RandomState(6)
    img = rng.randint(0, 256, (7, 11, 3)).astype(np.uint8)
    want = _ycbcr_to_rgb([img[:, :, i] for i in range(3)])
    for il in (True, False):
        got = decode_jpeg(
            encode_jpeg_lossless(img, predictor=5, interleaved=il))
        np.testing.assert_array_equal(got, want)


def test_lossless_subset_rejections():
    """Declared subset edges raise ValueError: restart intervals,
    subsampled lossless frames, illegal predictor selectors."""
    from rust_paddle_ocr_ray.functions.jpeg import decode_jpeg
    from rust_paddle_ocr_ray.sources.synth import encode_jpeg_lossless

    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    data = bytearray(encode_jpeg_lossless(img, predictor=1))
    # splice a DRI segment right before the SOS
    i = data.index(b"\xff\xda")
    with_dri = data[:i] + b"\xff\xdd\x00\x04\x00\x08" + data[i:]
    with pytest.raises(ValueError, match="restart"):
        decode_jpeg(bytes(with_dri))
    # subsampled lossless: rewrite the SOF3 sampling byte
    sub = data.copy()
    j = sub.index(b"\xff\xc3")
    sub[j + 11] = 0x22  # Hi=Vi=2 (offset: marker2+len2+P1+h2+w2+nc1+cid1)
    with pytest.raises(ValueError, match="subsampled lossless"):
        decode_jpeg(bytes(sub))
    # predictor 0 in SOS (Ss byte sits 3rd-from-last of the header)
    bad = data.copy()
    k = bad.index(b"\xff\xda")
    bad[k + 2 + 2 + 1 + 2] = 0  # len2 + ns1 + (cid, tab)*1 -> Ss
    with pytest.raises(ValueError, match="predictor"):
        decode_jpeg(bytes(bad))


def test_lossless_truncation_degrades():
    """Truncated lossless payloads degrade to ValueError at the
    production boundary (stages/multimodal.decode_payload converts
    internal Index/Key errors per its documented contract)."""
    from rust_paddle_ocr_ray.sources.synth import encode_jpeg_lossless
    from rust_paddle_ocr_ray.stages.multimodal import decode_payload

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (6, 6)).astype(np.uint8)
    data = encode_jpeg_lossless(img, predictor=2)
    for cut in (len(data) - 3, len(data) // 2, 20):
        with pytest.raises(ValueError):
            decode_payload(data[:cut])
