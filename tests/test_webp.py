"""Lossless WebP (VP8L, functions/vp8l.py) round-trips against the
synthetic encoder (sources/synth.encode_webp_lossless): the full
prefix-code machinery, color cache, LZ77 plain-distance references,
and all four transforms must reconstruct pixels bit-exactly.  Lossy
VP8 chunks now dispatch to the real functions/vp8.py decoder (see
tests/test_vp8.py for its differential suite); malformed payloads
degrade with ValueError."""

from __future__ import annotations

import os

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rust_paddle_ocr_ray.functions.vp8l import decode_vp8l, decode_webp
from rust_paddle_ocr_ray.sources.synth import encode_webp_lossless


def _img(seed, h, w, c=3):
    return np.random.default_rng(seed).integers(
        0, 256, size=(h, w, c), dtype=np.uint8)


def test_literals_rgb_roundtrip():
    px = _img(1, 7, 9)
    got = decode_webp(encode_webp_lossless(px))
    np.testing.assert_array_equal(got, px)
    assert got.shape == (7, 9, 3)


def test_literals_rgba_roundtrip():
    px = _img(2, 5, 6, 4)
    got = decode_webp(encode_webp_lossless(px))
    np.testing.assert_array_equal(got, px)
    assert got.shape == (5, 6, 4)


def test_color_cache_roundtrip():
    pal = _img(3, 1, 4)[0]
    px = pal[np.random.default_rng(4).integers(0, 4, size=(16, 16))]
    got = decode_webp(encode_webp_lossless(px, cache_bits=4))
    np.testing.assert_array_equal(got, px)


def test_lz77_runs_roundtrip():
    base = _img(5, 6, 3)
    px = np.repeat(base, 7, axis=1)  # long horizontal runs
    for cb in (0, 3):
        got = decode_webp(encode_webp_lossless(px, rle=True, cache_bits=cb))
        np.testing.assert_array_equal(got, px)


@pytest.mark.parametrize("transform",
                         ["subtract_green", "predictor", "color"])
def test_transform_roundtrip(transform):
    px = _img(6, 11, 13)
    got = decode_webp(encode_webp_lossless(px, transform=transform))
    np.testing.assert_array_equal(got, px)


@pytest.mark.parametrize("ncolors", [2, 4, 13, 40])
def test_palette_roundtrip(ncolors):
    """Color-indexing incl. sub-byte bundling (1/2/4-bit indices) and
    the >16-entry unbundled path."""
    rng = np.random.default_rng(ncolors)
    pal = [(255, int(r), int(g), int(b))
           for r, g, b in rng.integers(0, 256, size=(ncolors, 3))]
    idx = rng.integers(0, ncolors, size=(9, 13))
    px = np.array([[pal[i][1:] for i in row] for row in idx],
                  dtype=np.uint8)
    got = decode_webp(encode_webp_lossless(px, transform="palette",
                                           palette=pal))
    np.testing.assert_array_equal(got, px)


def test_lossy_vp8_dispatches_to_real_decoder():
    """A VP8 chunk routes to functions/vp8.py — a malformed body now
    raises ValueError from the real decoder (the old declared-stub
    NotImplementedError is gone)."""
    riff = (b"RIFF" + (12).to_bytes(4, "little") + b"WEBP"
            + b"VP8 " + (2).to_bytes(4, "little") + b"\x00\x00")
    with pytest.raises(ValueError):
        decode_webp(riff)


def test_malformed_degrades():
    with pytest.raises(ValueError):
        decode_webp(b"RIFF\x00\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        decode_vp8l(b"\x00garbage")
    with pytest.raises(ValueError):
        # valid signature, truncated bitstream
        decode_vp8l(bytes([0x2F, 0x01, 0x02]))


@st.composite
def webp_case(draw):
    h = draw(st.integers(1, 10))
    w = draw(st.integers(1, 10))
    c = draw(st.sampled_from([3, 4]))
    data = draw(st.binary(min_size=h * w * c, max_size=h * w * c))
    px = np.frombuffer(data, dtype=np.uint8).reshape(h, w, c)
    cache_bits = draw(st.sampled_from([0, 0, 2, 5]))
    rle = draw(st.booleans())
    transform = draw(st.sampled_from(
        [None, None, "subtract_green", "predictor", "color"]))
    return px, cache_bits, rle, transform


@settings(max_examples=40, deadline=None)
@given(webp_case())
def test_webp_property_roundtrip(case):
    px, cache_bits, rle, transform = case
    got = decode_webp(encode_webp_lossless(
        px, cache_bits=cache_bits, rle=rle, transform=transform))
    np.testing.assert_array_equal(got, px)


def test_featurizer_dispatch_decodes_vp8l():
    from rust_paddle_ocr_ray.stages.multimodal import decode_payload

    px = _img(9, 6, 8)
    got = decode_payload(encode_webp_lossless(px))
    np.testing.assert_array_equal(got, px)


def test_meta_prefix_groups_roundtrip():
    """Two prefix-code groups selected per 4-px block by a
    checkerboard entropy image — the decoder's meta-prefix path.
    The encoder gives odd groups a ROTATED green code (same length
    multiset, different per-symbol codes), and greens are pinned to
    the symbol range where the two groups' codes genuinely differ
    (>= 92 for the 280-symbol alphabet) — so a decoder that ignores
    the entropy image, swaps block x/y, or always uses group 0
    desyncs instead of silently round-tripping."""
    px = _img(11, 13, 18)
    px[:, :, 1] = 92 + (px[:, :, 1].astype(np.int32) * 164) // 256
    got = decode_webp(encode_webp_lossless(px, meta_bits=2))
    np.testing.assert_array_equal(got, px)


def test_meta_prefix_single_block_regression():
    """Stress-found: an image small enough that the meta entropy
    image has ONE block names only group 0, so the encoder must emit
    exactly max(group)+1 code-table sets or the stream desyncs."""
    px = _img(14, 4, 7, 4)
    got = decode_webp(encode_webp_lossless(px, meta_bits=3))
    np.testing.assert_array_equal(got, px)


def test_simple_prefix_codes_roundtrip():
    """The spec's short simple-code header, exercised on EVERY
    channel tree (each channel gets its own simple code over its
    used symbols): a constant image reads ZERO bits per channel
    symbol; a two-tone image one bit."""
    px = np.zeros((9, 7, 3), dtype=np.uint8)
    px[:, :, 0], px[:, :, 1], px[:, :, 2] = 200, 3, 77
    data = encode_webp_lossless(px, simple=True)
    got = decode_webp(data)
    np.testing.assert_array_equal(got, px)
    # all five trees simple (1 symbol each): header + tables dominate,
    # pixels are free — the stream must stay tiny
    assert len(data) < 64
    rng = np.random.default_rng(12)
    two = np.where(rng.random((8, 8, 1)) < 0.5,
                   np.array([10, 20, 30], dtype=np.uint8),
                   np.array([200, 210, 220], dtype=np.uint8)).astype(np.uint8)
    got = decode_webp(encode_webp_lossless(two, simple=True))
    np.testing.assert_array_equal(got, two)


# --- LZ77 2D proximity distance codes + REAL libwebp encodes ---------
#
# Distance codes <= 120 name a (dx, dy) neighborhood offset
# (vp8l_tables.CODE_TO_DXDY, behaviorally extracted from system
# libwebp by tools/extract_vp8l_plane.py).  Real libwebp encoders map
# every near distance through this table, so virtually all real-world
# lossless WebP files with backward references require it.

GOLDEN_VP8L = os.path.join(os.path.dirname(__file__), "golden",
                           "vp8l_goldens.parquet")


def _oracle():
    try:
        import sys
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools"))
        import webp_oracle as wo
        if wo.available():
            return wo
    except Exception:
        pass
    return None


def _plane_ref_image(code: int, w: int, h: int, seed: int) -> np.ndarray:
    """An image whose tail satisfies the copy relation of plane code
    ``code`` at width ``w`` (first 9 rows random, last rows copies)."""
    from rust_paddle_ocr_ray.functions.vp8l import CODE_TO_DXDY

    dx, dy = CODE_TO_DXDY[code - 1]
    dist = max(1, dy * w + dx)
    rng = np.random.default_rng(seed)
    px = np.zeros((h * w, 3), dtype=np.uint8)
    px[:9 * w] = rng.integers(0, 256, (9 * w, 3), dtype=np.uint8)
    for i in range(9 * w, h * w):
        px[i] = px[i - dist]
    return px.reshape(h, w, 3)


def test_plane_codes_roundtrip_all_120():
    """Every proximity code round-trips through our encoder+decoder."""
    for code in range(1, 121):
        img = _plane_ref_image(code, 17, 12, seed=code)
        got = decode_webp(encode_webp_lossless(img, plane_ref=(9 * 17, code)))
        np.testing.assert_array_equal(got, img)


def test_plane_codes_vs_libwebp_live():
    """Sampled proximity codes at two widths: the system libwebp and
    our decoder must agree on the same bitstream (live differential;
    the committed-golden test below keeps the evidence without it)."""
    wo = _oracle()
    if wo is None:
        pytest.skip("libwebp unavailable")
    for code in (1, 2, 3, 4, 40, 55, 95, 100, 117, 120):
        for w in (17, 23):
            img = _plane_ref_image(code, w, 12, seed=1000 + code)
            data = encode_webp_lossless(img, plane_ref=(9 * w, code))
            np.testing.assert_array_equal(wo.decode_rgb(data), img)
            np.testing.assert_array_equal(decode_webp(data), img)


def test_vp8l_goldens_real_libwebp_encodes():
    """Committed REAL libwebp lossless encodes (WebPEncodeLosslessRGB
    over noise / gradients / tiles / palettes / photo-like / row-copy
    images — every encoder feature class) decode bit-exactly."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(GOLDEN_VP8L)
    assert tbl.num_rows >= 10
    for row in tbl.to_pylist():
        want = np.frombuffer(row["rgb"], dtype=np.uint8).reshape(
            row["height"], row["width"], 3)
        got = decode_webp(row["payload"])
        if got.shape[2] == 4:  # encoder may keep an opaque alpha plane
            assert (got[:, :, 3] == 255).all()
            got = got[:, :, :3]
        np.testing.assert_array_equal(got, want, err_msg=row["name"])


def test_libwebp_lossless_live_sweep():
    """Fresh seeded images through the REAL libwebp lossless encoder:
    our decode must equal both the source pixels and libwebp's own
    decode (skipped when libwebp is absent)."""
    wo = _oracle()
    if wo is None:
        pytest.skip("libwebp unavailable")
    rng = np.random.default_rng(77)
    tile = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    pal = rng.integers(0, 256, (7, 3), dtype=np.uint8)
    imgs = [
        rng.integers(0, 256, (19, 27, 3), dtype=np.uint8),
        np.tile(tile, (5, 7, 1)),
        pal[rng.integers(0, 7, (26, 34))],
        np.repeat(rng.integers(0, 256, (1, 48, 3), dtype=np.uint8),
                  30, axis=0),
    ]
    for img in imgs:
        img = np.ascontiguousarray(img, dtype=np.uint8)
        data = wo.encode_lossless_rgb(img)
        got = decode_webp(data)
        if got.shape[2] == 4:
            got = got[:, :, :3]
        np.testing.assert_array_equal(got, img)
        np.testing.assert_array_equal(wo.decode_rgb(data), img)
