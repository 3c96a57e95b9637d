"""Hypothesis round-trips for the pure-Python codecs: any small image
must survive encode->decode bit-exactly through BMP / GIF / PNG /
DC-JPEG / WAV / MJPEG-AVI — the same property style as the PDF
stream round-trip that caught the round-3 EOL byte-loss bug."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from rust_paddle_ocr_ray.functions.audio import decode_wav
from rust_paddle_ocr_ray.functions.avi import iter_avi_frames
from rust_paddle_ocr_ray.functions.jpeg import decode_jpeg, decode_jpeg_gray
from rust_paddle_ocr_ray.functions.png import decode_png
from rust_paddle_ocr_ray.functions.raster import decode_bmp, decode_gif
from rust_paddle_ocr_ray.sources.synth import (
    encode_avi_mjpeg,
    encode_bmp24,
    encode_gif8,
    encode_jpeg_color_dc,
    encode_jpeg_gray_dc,
    encode_png_rgb,
    encode_wav_pcm16,
)

dims = st.tuples(st.integers(1, 9), st.integers(1, 9))


@st.composite
def rgb_image(draw):
    h, w = draw(dims)
    data = draw(st.binary(min_size=h * w * 3, max_size=h * w * 3))
    return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)


@st.composite
def index_image(draw, n_colors=16):
    h, w = draw(dims)
    data = draw(st.lists(st.integers(0, n_colors - 1),
                         min_size=h * w, max_size=h * w))
    return np.array(data, dtype=np.uint8).reshape(h, w)


PAL16 = np.arange(48, dtype=np.uint8).reshape(16, 3) * 5


@settings(max_examples=40, deadline=None)
@given(rgb_image())
def test_bmp_roundtrip(px):
    np.testing.assert_array_equal(decode_bmp(encode_bmp24(px)), px)


@settings(max_examples=40, deadline=None)
@given(index_image())
def test_gif_roundtrip(idx):
    got = decode_gif(encode_gif8(idx, PAL16))
    np.testing.assert_array_equal(got, PAL16[idx])


@settings(max_examples=40, deadline=None)
@given(rgb_image())
def test_png_roundtrip(px):
    np.testing.assert_array_equal(decode_png(encode_png_rgb(px)), px)


@settings(max_examples=40, deadline=None)
@given(index_image(n_colors=256))
def test_jpeg_dc_roundtrip(blocks):
    px = decode_jpeg_gray(encode_jpeg_gray_dc(blocks))
    want = np.repeat(np.repeat(blocks, 8, axis=0), 8, axis=1)
    np.testing.assert_array_equal(px, want)


@st.composite
def color_jpeg_case(draw):
    hy, vy = draw(st.sampled_from([(2, 2), (2, 1), (1, 2), (1, 1)]))
    my, mx = draw(st.integers(1, 3)), draw(st.integers(1, 3))
    blk = st.integers(0, 255)
    yb = np.array(draw(st.lists(blk, min_size=vy * my * hy * mx,
                                max_size=vy * my * hy * mx)),
                  dtype=np.int64).reshape(vy * my, hy * mx)
    cbb = np.array(draw(st.lists(blk, min_size=my * mx, max_size=my * mx)),
                   dtype=np.int64).reshape(my, mx)
    crb = np.array(draw(st.lists(blk, min_size=my * mx, max_size=my * mx)),
                   dtype=np.int64).reshape(my, mx)
    w = 8 * hy * mx - draw(st.integers(0, 8 * hy - 1))
    h = 8 * vy * my - draw(st.integers(0, 8 * vy - 1))
    return yb, cbb, crb, hy, vy, max(w, 1), max(h, 1)


@settings(max_examples=40, deadline=None)
@given(color_jpeg_case())
def test_jpeg_subsampled_color_roundtrip(case):
    """DC-only YCbCr JPEG at 4:2:0 / 4:2:2 / 4:4:0 / 4:4:4 sampling
    with partial-MCU frame dims decodes EXACTLY to the closed form:
    replicated block values through the pinned nearest upsampling
    anchor and the bit-identical float YCbCr->RGB (np.rint)."""
    yb, cbb, crb, hy, vy, w, h = case
    data = encode_jpeg_color_dc(yb, cbb, crb, hy, vy, w=w, h=h)
    px = decode_jpeg(data)
    x = np.arange(w)
    y = np.arange(h)
    yv = yb[y[:, None] // 8, x[None, :] // 8].astype(np.float64)
    cb = cbb[y[:, None] // (8 * vy),
             x[None, :] // (8 * hy)].astype(np.float64) - 128.0
    cr = crb[y[:, None] // (8 * vy),
             x[None, :] // (8 * hy)].astype(np.float64) - 128.0
    want = np.clip(np.rint(np.stack(
        [yv + 1.402 * cr,
         yv - 0.344136 * cb - 0.714136 * cr,
         yv + 1.772 * cb], axis=2)), 0, 255).astype(np.uint8)
    assert px.shape == (h, w, 3)
    np.testing.assert_array_equal(px, want)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(-32768, 32767), min_size=1, max_size=200),
       st.integers(1, 3))
def test_wav_roundtrip(vals, ch):
    n = (len(vals) // ch) * ch
    if not n:
        vals = vals * ch
        n = ch
    s = np.array(vals[:n], dtype=np.int16).reshape(-1, ch)
    got, rate, bits = decode_wav(encode_wav_pcm16(s, rate=16000))
    assert (rate, bits) == (16000, 16)
    np.testing.assert_array_equal(got, s.astype(np.int32))


@settings(max_examples=25, deadline=None)
@given(st.lists(index_image(n_colors=256), min_size=1, max_size=5))
def test_avi_container_roundtrip(frame_blocks):
    frames = [encode_jpeg_gray_dc(b) for b in frame_blocks]
    assert list(iter_avi_frames(encode_avi_mjpeg(frames))) == frames


# --- fuzz: malformed payloads must DEGRADE (ValueError /
# NotImplementedError via decode_payload), never crash a task ---

MAGICS = [b"\x89PNG\r\n\x1a\n", b"BM", b"GIF89a", b"GIF87a",
          b"\xff\xd8", b"RIFF"]


@settings(max_examples=120, deadline=None)
@given(st.sampled_from(MAGICS), st.binary(min_size=0, max_size=300))
def test_decode_payload_never_crashes_on_garbage(magic, tail):
    import pytest

    from rust_paddle_ocr_ray.stages.multimodal import decode_payload

    with pytest.raises((ValueError, NotImplementedError)):
        decode_payload(magic + tail)
        raise ValueError("decoded garbage — statistically impossible")


@settings(max_examples=60, deadline=None)
@given(st.integers(0, 3), st.data())
def test_decode_payload_truncations_degrade(kind, data):
    import pytest

    from rust_paddle_ocr_ray.stages.multimodal import decode_payload

    px = np.arange(4 * 5 * 3, dtype=np.uint8).reshape(4, 5, 3)
    idx = (px[:, :, 0] % 16).astype(np.uint8)
    payload = [encode_bmp24(px), encode_gif8(idx, PAL16),
               encode_png_rgb(px),
               encode_jpeg_gray_dc(idx[:2, :2])][kind]
    cut = data.draw(st.integers(1, len(payload) - 1))
    try:
        out = decode_payload(payload[:cut])
        # a prefix may still parse (e.g. PNG ignores a lost IEND) —
        # but whatever comes back must be a well-formed pixel array
        assert out.ndim == 3 and out.dtype == np.uint8
    except (ValueError, NotImplementedError):
        pass


@st.composite
def prog_case(draw):
    """Random progressive-JPEG case: sampling layout, sparse zigzag
    coefficients, cropped frame dims, optional restart interval."""
    hy, vy = draw(st.sampled_from([(1, 1), (2, 2), (2, 1), (1, 2)]))
    my = draw(st.integers(1, 2))
    mx = draw(st.integers(1, 3))
    color = draw(st.booleans())

    def grid(by, bx, rng_key):
        n = by * bx * 64
        vals = draw(st.lists(st.integers(-60, 60), min_size=n, max_size=n))
        cz = np.array(vals, dtype=np.int64).reshape(by, bx, 64)
        mask = np.array(
            draw(st.lists(st.booleans(), min_size=n, max_size=n))
        ).reshape(by, bx, 64)
        cz[~mask] = 0  # ~half the coefficients zero -> runs + EOBs
        return cz

    if color:
        coefs = [grid(vy * my, hy * mx, 0), grid(my, mx, 1), grid(my, mx, 2)]
        samp = [(hy, vy), (1, 1), (1, 1)]
    else:
        coefs = [grid(vy * my, hy * mx, 0)]
        samp = [(hy, vy)]
    wfull, hfull = mx * (hy if color else hy) * 8, my * (vy if color else vy) * 8
    w = wfull - draw(st.integers(0, 7))
    h = hfull - draw(st.integers(0, 7))
    ri = draw(st.sampled_from([0, 0, 1, 3]))
    return coefs, samp, w, h, ri


@settings(max_examples=30, deadline=None)
@given(prog_case())
def test_jpeg_progressive_roundtrip(case):
    """Progressive (SOF2) decode must reconstruct exactly the pixels
    the same coefficients produce through the baseline math: dequant
    (unit tables) + matrix IDCT + clip, crop, replication upsample,
    BT.601 — cross-checked here against the decoder's own baseline
    constants via the independent per-block reference in
    tests/test_jpeg_progressive.py; this property run covers layout ×
    crop × restart-interval space."""
    from tests.test_jpeg_progressive import _ref_reconstruct

    coefs, samp, w, h, ri = case
    from rust_paddle_ocr_ray.sources.synth import encode_jpeg_progressive

    data = encode_jpeg_progressive(coefs, samp, w=w, h=h,
                                   restart_interval=ri)
    got = decode_jpeg(data)
    np.testing.assert_array_equal(got, _ref_reconstruct(coefs, samp, w, h))


@st.composite
def lossless_jpeg_case(draw):
    h = draw(st.integers(1, 24))
    w = draw(st.integers(1, 24))
    color = draw(st.booleans())
    n = h * w * (3 if color else 1)
    flat = np.array(draw(st.lists(st.integers(0, 255), min_size=n,
                                  max_size=n)), dtype=np.uint8)
    img = flat.reshape((h, w, 3) if color else (h, w))
    sel = draw(st.integers(1, 7))
    pt = draw(st.integers(0, 3))
    il = draw(st.booleans())
    return img, sel, pt, il


@settings(max_examples=40, deadline=None)
@given(lossless_jpeg_case())
def test_jpeg_lossless_roundtrip(case):
    """SOF3 round-trips ARBITRARY pixels exactly: (px >> pt) << pt per
    plane, any predictor 1-7, interleaved or per-component scans;
    color goes through the module's pinned BT.601 rule applied to the
    exactly-reconstructed planes."""
    from rust_paddle_ocr_ray.functions.jpeg import _ycbcr_to_rgb
    from rust_paddle_ocr_ray.sources.synth import encode_jpeg_lossless

    img, sel, pt, il = case
    got = decode_jpeg(encode_jpeg_lossless(img, predictor=sel, pt=pt,
                                           interleaved=il))
    if img.ndim == 2:
        want = ((img.astype(np.int64) >> pt) << pt).astype(np.uint8)
    else:
        planes = [((img[:, :, i].astype(np.int64) >> pt) << pt
                   ).astype(np.uint8) for i in range(3)]
        want = _ycbcr_to_rgb(planes)
    np.testing.assert_array_equal(got, want)


@settings(max_examples=40, deadline=None)
@given(lossless_jpeg_case())
def test_jpeg_arith_lossless_roundtrip(case):
    """SOF11 (arithmetic lossless, Annex H over the QM coder)
    round-trips ARBITRARY pixels exactly under the same contract as
    the SOF3 property above — same predictors, point transform and
    scan layouts, different entropy coder."""
    from rust_paddle_ocr_ray.functions.jpeg import _ycbcr_to_rgb
    from rust_paddle_ocr_ray.sources.synth import encode_jpeg_arith_lossless

    img, sel, pt, il = case
    got = decode_jpeg(encode_jpeg_arith_lossless(
        img, predictor=sel, pt=pt, interleaved=il))
    if img.ndim == 2:
        want = ((img.astype(np.int64) >> pt) << pt).astype(np.uint8)
    else:
        planes = [((img[:, :, i].astype(np.int64) >> pt) << pt
                   ).astype(np.uint8) for i in range(3)]
        want = _ycbcr_to_rgb(planes)
    np.testing.assert_array_equal(got, want)


@st.composite
def hier_jpeg_case(draw):
    h = draw(st.integers(1, 28))
    w = draw(st.integers(1, 28))
    color = draw(st.booleans())
    n = h * w * (3 if color else 1)
    flat = np.asarray(draw(st.lists(st.integers(0, 255), min_size=n,
                                    max_size=n)), dtype=np.uint8)
    if color:
        img = [flat[i::3].reshape(h, w) for i in range(3)]
    else:
        img = flat.reshape(h, w)
    arith = draw(st.booleans())
    return img, arith


@settings(max_examples=40, deadline=None)
@given(hier_jpeg_case())
def test_jpeg_hierarchical_roundtrip(case):
    """DHP (hierarchical, Annex J) round-trips ARBITRARY pixels
    exactly through the full three-frame pyramid — lossless first
    frame at half resolution, EXP reference doubling (§J.8, with the
    §J.8.1 clip on odd dims), differential DCT corrections, final
    differential lossless frame — in both entropy families
    (SOF3/5/7 Huffman and SOF11/13/15 arithmetic)."""
    from rust_paddle_ocr_ray.functions.jpeg import _ycbcr_to_rgb
    from rust_paddle_ocr_ray.sources.synth import encode_jpeg_hierarchical

    img, arith = case
    got = decode_jpeg(encode_jpeg_hierarchical(img, arith=arith))
    if isinstance(img, list):
        want = _ycbcr_to_rgb([p.astype(np.int32) for p in img])
    else:
        want = img
    np.testing.assert_array_equal(got, want)
