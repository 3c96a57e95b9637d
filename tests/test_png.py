"""Pure-Python PNG pixel decode (functions/png.py): round-trip against
a from-spec encoder written HERE (filter math implemented forward,
independently of the decoder's unfilter), all five filter types and all
five 8-bit color types; plus the multimodal featurizer's real-decode
path (stages/multimodal.py) emitting true dimensions + pixel stats."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from rust_paddle_ocr_ray.functions.png import decode_png, pixel_feature

_CH = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body)))


def _filter_bytes(rows8: np.ndarray, bpp: int, row_filters) -> bytes:
    """Forward-filter byte rows per RFC 2083 §6 (the inverse of the
    decoder's unfilter — forward math needs no reconstruction
    feedback, so a shifted-row formulation is exact)."""
    h, stride = rows8.shape
    out = bytearray()
    prev = np.zeros(stride, dtype=np.int32)

    def shl(a):  # the value bpp bytes to the left, 0 at row start
        return np.concatenate([np.zeros(bpp, dtype=np.int32), a[:-bpp]])

    for y in range(h):
        f = row_filters[y % len(row_filters)]
        out.append(f)
        cur = rows8[y].astype(np.int32)
        left = shl(cur)
        if f == 0:
            filt = cur
        elif f == 1:
            filt = cur - left
        elif f == 2:
            filt = cur - prev
        elif f == 3:
            filt = cur - ((left + prev) >> 1)
        else:  # Paeth
            ul = shl(prev)
            p = left + prev - ul
            pa_ = np.abs(p - left)
            pb_ = np.abs(p - prev)
            pc_ = np.abs(p - ul)
            pred = np.where((pa_ <= pb_) & (pa_ <= pc_), left,
                            np.where(pb_ <= pc_, prev, ul))
            filt = cur - pred
        out.extend((filt & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    return bytes(out)


_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def encode_png(px: np.ndarray, color: int, row_filters, palette=None,
               interlace: int = 0, bitdepth: int = 8,
               trns: bytes | None = None) -> bytes:
    """From-spec encoder: per-row filter chosen from ``row_filters``
    (cycled), filter math applied FORWARD per RFC 2083 §6 —
    structurally independent of the decoder's inverse.  ``bitdepth=16``
    emits left-bit-replicated (v*257) big-endian samples;
    ``interlace=1`` emits Adam7 passes, each filtered independently;
    ``trns`` attaches a palette-transparency chunk."""
    h, w, c = px.shape
    assert c == _CH[color]
    bpp = c * (2 if bitdepth == 16 else 1)

    def byte_rows(sub: np.ndarray) -> np.ndarray:
        sh = sub.shape[0]
        if bitdepth == 16:
            v16 = (sub.astype(np.uint16) * 257).astype(">u2")
            return np.ascontiguousarray(v16).view(np.uint8).reshape(sh, -1)
        return sub.reshape(sh, -1)

    if interlace:
        out = b"".join(
            _filter_bytes(byte_rows(px[y0::dy, x0::dx]), bpp, row_filters)
            for x0, y0, dx, dy in _ADAM7 if px[y0::dy, x0::dx].size)
    else:
        out = _filter_bytes(byte_rows(px), bpp, row_filters)
    ihdr = struct.pack(">IIBBBBB", w, h, bitdepth, color, 0, 0, interlace)
    body = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if palette is not None:
        body += _chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    if trns is not None:
        body += _chunk(b"tRNS", trns)
    comp = zlib.compress(bytes(out))
    # split IDAT in two chunks to exercise concatenation
    mid = len(comp) // 2
    body += _chunk(b"IDAT", comp[:mid]) + _chunk(b"IDAT", comp[mid:])
    return body + _chunk(b"IEND", b"")


@pytest.mark.parametrize("color", [0, 2, 4, 6])
@pytest.mark.parametrize("filters", [[0], [1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_roundtrip_all_filters_and_colors(color, filters):
    rng = np.random.RandomState(color * 10 + filters[0])
    px = rng.randint(0, 256, size=(11, 7, _CH[color]), dtype=np.uint8)
    got = decode_png(encode_png(px, color, filters))
    assert got.shape == px.shape
    assert np.array_equal(got, px), (color, filters)


def test_palette_expands_to_rgb():
    rng = np.random.RandomState(3)
    palette = rng.randint(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.randint(0, 16, size=(6, 9, 1), dtype=np.uint8)
    got = decode_png(encode_png(idx, 3, [0, 1, 4], palette=palette))
    assert got.shape == (6, 9, 3)
    assert np.array_equal(got, palette[idx[:, :, 0]])


def test_unsupported_subsets_raise():
    px = np.zeros((2, 2, 3), dtype=np.uint8)
    good = encode_png(px, 2, [0])
    bad_depth = bytearray(good)
    bad_depth[8 + 8 + 8] = 4  # depth 4 is illegal for color type 2
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(bytes(bad_depth))
    bad_interlace = bytearray(good)
    bad_interlace[8 + 8 + 12] = 2  # only methods 0/1 exist
    with pytest.raises(ValueError, match="interlace"):
        decode_png(bytes(bad_interlace))
    # a header FLIPPED to a supported layout must fail the size check,
    # never mis-decode (16-bit and Adam7 are real paths now)
    flipped16 = bytearray(good)
    flipped16[8 + 8 + 8] = 16
    with pytest.raises(ValueError, match="IDAT size"):
        decode_png(bytes(flipped16))
    flipped_adam = bytearray(good)
    flipped_adam[8 + 8 + 12] = 1
    with pytest.raises(ValueError, match="IDAT|Adam7"):
        decode_png(bytes(flipped_adam))
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"JUNK")


@pytest.mark.parametrize("color", [0, 2, 4, 6])
def test_adam7_interlace_roundtrip(color):
    """Seven independently-filtered passes scatter back bit-exactly,
    mixed filter types, dims hitting partial pass grids."""
    rng = np.random.RandomState(40 + color)
    px = rng.randint(0, 256, size=(13, 11, _CH[color]), dtype=np.uint8)
    got = decode_png(encode_png(px, color, [0, 1, 2, 3, 4], interlace=1))
    np.testing.assert_array_equal(got, px)


@pytest.mark.parametrize("dims", [(1, 1), (2, 3), (3, 2), (1, 9), (9, 1),
                                  (8, 8), (17, 5)])
def test_adam7_tiny_dims(dims):
    """Dims where some Adam7 passes are EMPTY (the spec's ceil grids)."""
    h, w = dims
    rng = np.random.RandomState(h * 16 + w)
    px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
    got = decode_png(encode_png(px, 2, [4], interlace=1))
    np.testing.assert_array_equal(got, px)


@pytest.mark.parametrize("color", [0, 2, 4, 6])
@pytest.mark.parametrize("interlace", [0, 1])
def test_16bit_high_byte_roundtrip(color, interlace):
    """16-bit samples (v*257, the left-bit-replicated form) reduce to
    the exact 8-bit values via the pinned high-byte rule — plain and
    interlaced, byte-wise filtering at bpp = 2*channels."""
    rng = np.random.RandomState(60 + color + interlace)
    px = rng.randint(0, 256, size=(9, 14, _CH[color]), dtype=np.uint8)
    got = decode_png(encode_png(px, color, [0, 1, 2, 3, 4],
                                interlace=interlace, bitdepth=16))
    np.testing.assert_array_equal(got, px)


def test_16bit_palette_is_illegal():
    px = np.zeros((2, 2, 1), dtype=np.uint8)
    pal = np.zeros((2, 3), dtype=np.uint8)
    data = encode_png(px, 3, [0], palette=pal)
    bad = bytearray(data)
    bad[8 + 8 + 8] = 16
    with pytest.raises(ValueError, match="16-bit palette"):
        decode_png(bytes(bad))


def test_palette_trns_expands_to_rgba():
    rng = np.random.RandomState(9)
    pal = rng.randint(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.randint(0, 16, size=(8, 9, 1), dtype=np.uint8)
    got = decode_png(encode_png(idx, 3, [0, 2], palette=pal,
                                trns=bytes([0, 128, 255])))
    assert got.shape == (8, 9, 4)
    alpha = np.full(16, 255, dtype=np.uint8)
    alpha[:3] = [0, 128, 255]
    np.testing.assert_array_equal(got[:, :, :3], pal[idx[:, :, 0]])
    np.testing.assert_array_equal(got[:, :, 3], alpha[idx[:, :, 0]])


def test_pixel_feature_golden():
    """Deterministic stats: a solid-color image has exact mean/std/grid."""
    px = np.full((8, 8, 3), 51, dtype=np.uint8)  # 51/255 = 0.2 exactly
    f = pixel_feature(px, 64)
    assert f.shape == (64,) and f.dtype == np.float32
    assert np.allclose(f[:3], 0.2)      # channel means
    assert np.allclose(f[3], 0.0)       # 4th-channel pad
    assert np.allclose(f[4:8], 0.0)     # stds of a constant image
    assert np.allclose(f[8:24], 0.2)    # 4x4 grid of grayscale means
    assert np.allclose(f[24:], 0.0)     # zero padding to feat_dim


def test_featurizer_real_png_vs_fake_fallback(ray_session):
    """MediaFeaturizer: PNG payloads emit TRUE dimensions + pixel stats;
    non-PNG payloads keep the deterministic fake (honest stub)."""
    import pyarrow as pa

    import ray.data as rd

    from rust_paddle_ocr_ray.stages.multimodal import (
        _fake_decode,
        featurize_media,
    )

    rng = np.random.RandomState(11)
    px = rng.randint(0, 256, size=(5, 13, 3), dtype=np.uint8)
    png = encode_png(px, 2, [0, 2, 4])
    other = b"\xff\xd8\xffJPEG-ish payload without a decoder"
    media = rd.from_arrow(pa.table({
        "media_id": pa.array([1, 2], pa.int64()),
        "payload": pa.array([png, other], pa.binary()),
    }))
    out = featurize_media(media, "payload", "media_id").to_pandas().set_index("media_id")
    # real path: IHDR truth + pixel_feature of the decoded array
    assert int(out.loc[1, "width"]) == 13 and int(out.loc[1, "height"]) == 5
    assert np.allclose(np.asarray(out.loc[1, "feature"], dtype=np.float32),
                       pixel_feature(px, 64))
    # fake path unchanged for undecodable formats
    fw, fh, ffeat = _fake_decode(other, 64)
    assert int(out.loc[2, "width"]) == fw and int(out.loc[2, "height"]) == fh
    assert np.allclose(np.asarray(out.loc[2, "feature"], dtype=np.float32), ffeat)


def _png_subbyte(vals: np.ndarray, bitdepth: int, color: int,
                 palette: np.ndarray | None = None,
                 row_filters=(0,)) -> bytes:
    """From-spec sub-byte encoder: pack MSB-first, byte-wise filters."""
    h, w = vals.shape
    row_bytes = (w * bitdepth + 7) // 8
    raw = bytearray()
    prev = np.zeros(row_bytes, dtype=np.int64)
    for y in range(h):
        bits = []
        for v in vals[y]:
            bits += [int(v) >> (bitdepth - 1 - i) & 1 for i in range(bitdepth)]
        bits += [0] * (row_bytes * 8 - len(bits))
        row = np.packbits(np.array(bits, dtype=np.uint8)).astype(np.int64)
        f = row_filters[y % len(row_filters)]
        raw.append(f)
        if f == 0:
            enc = row
        elif f == 1:  # Sub, bpp=1
            enc = np.empty_like(row)
            left = 0
            for i in range(row_bytes):
                enc[i] = (row[i] - left) & 0xFF
                left = row[i]
        elif f == 2:  # Up
            enc = (row - prev) & 0xFF
        else:
            raise AssertionError("test encoder supports filters 0-2")
        raw += bytes(enc.astype(np.uint8))
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, bitdepth, color, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _chunk(b"PLTE", palette.astype(np.uint8).tobytes())
    return out + _chunk(b"IDAT", zlib.compress(bytes(raw))) + _chunk(b"IEND", b"")


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_subbyte_grey_scaling(depth):
    rng = np.random.RandomState(depth)
    vals = rng.randint(0, 1 << depth, (5, 11)).astype(np.uint8)
    px = decode_png(_png_subbyte(vals, depth, 0, row_filters=(0, 1, 2)))
    scale = 255 // ((1 << depth) - 1)
    np.testing.assert_array_equal(px[:, :, 0], vals * scale)


def test_subbyte_palette_lookup():
    pal = np.array([[9, 8, 7], [1, 2, 3], [200, 100, 50], [0, 0, 255]],
                   dtype=np.uint8)
    vals = np.array([[0, 1, 2, 3, 3, 2, 1], [1, 0, 3, 2, 0, 0, 1]],
                    dtype=np.uint8)
    px = decode_png(_png_subbyte(vals, 2, 3, palette=pal,
                                 row_filters=(2, 1)))
    np.testing.assert_array_equal(px, pal[vals])
