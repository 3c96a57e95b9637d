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


def encode_png(px: np.ndarray, color: int, row_filters, palette=None) -> bytes:
    """From-spec encoder: per-row filter chosen from ``row_filters``
    (cycled), filter math applied FORWARD per RFC 2083 §6 with plain
    per-pixel loops — structurally independent of the decoder."""
    h, w, c = px.shape
    assert c == _CH[color]
    bpp = c
    out = bytearray()
    prev = np.zeros((w, bpp), dtype=np.int32)
    for y in range(h):
        f = row_filters[y % len(row_filters)]
        out.append(f)
        cur = px[y].astype(np.int32)
        left = np.zeros(bpp, dtype=np.int32)
        ul = np.zeros(bpp, dtype=np.int32)
        for x in range(w):
            raw = cur[x]
            if f == 0:
                filt = raw
            elif f == 1:
                filt = raw - left
            elif f == 2:
                filt = raw - prev[x]
            elif f == 3:
                filt = raw - ((left + prev[x]) >> 1)
            else:  # Paeth
                p = left + prev[x] - ul
                pa_ = np.abs(p - left)
                pb_ = np.abs(p - prev[x])
                pc_ = np.abs(p - ul)
                pred = np.where((pa_ <= pb_) & (pa_ <= pc_), left,
                                np.where(pb_ <= pc_, prev[x], ul))
                filt = raw - pred
            out.extend((filt & 0xFF).astype(np.uint8).tobytes())
            left = raw
            ul = prev[x].copy()
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    body = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if palette is not None:
        body += _chunk(b"PLTE", palette.astype(np.uint8).tobytes())
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
    bit16 = bytearray(good)
    bit16[8 + 8 + 8] = 16  # IHDR bit depth byte
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(bytes(bit16))
    interlaced = bytearray(good)
    interlaced[8 + 8 + 12] = 1  # IHDR interlace byte
    with pytest.raises(ValueError, match="interlaced"):
        decode_png(bytes(interlaced))
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"JUNK")


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
