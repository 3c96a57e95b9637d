"""Corrupt-header / decompression-bomb guards for the raster decoders.

SURVEY §12 item 14 campaign, decoder leg: every format's dims come
from attacker-controlled bytes, so a tiny payload claiming huge
dimensions (or a small-dims header hiding a zlib/LZW bomb) must fail
fast with ValueError — the featurizer's degrade contract — instead of
allocating gigabytes or walking h*w decode iterations.  VP8/VP8L
gained these guards earlier (tests/test_vp8.py, functions/vp8l.py);
this file locks the same budget (MAX_PIXELS = 1 << 22) onto PNG, GIF
and JPEG, and proves legitimate decodes still pass through the new
bounded-inflate PNG path.
"""
from __future__ import annotations

import struct
import time
import zlib

import numpy as np
import pytest

from rust_paddle_ocr_ray.functions.jpeg import decode_jpeg
from rust_paddle_ocr_ray.functions.png import PNG_SIG, decode_png
from rust_paddle_ocr_ray.functions.raster import decode_gif

GUARD_SECONDS = 1.0  # generous CI bound; real guard cost is ~microseconds


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body)))


def _png(width: int, height: int, idat: bytes,
         color: int = 0, depth: int = 8) -> bytes:
    ihdr = struct.pack(">IIBBBBB", width, height, depth, color, 0, 0, 0)
    return (PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", idat) + _png_chunk(b"IEND", b""))


def test_png_huge_dims_rejected_fast():
    """A ~100-byte payload claiming 65535x65535 must not allocate the
    16 GiB the header promises."""
    bomb = _png(65535, 65535, zlib.compress(b"\x00" * 16))
    t0 = time.time()
    with pytest.raises(ValueError, match="out of range"):
        decode_png(bomb)
    assert time.time() - t0 < GUARD_SECONDS


def test_png_zlib_bomb_rejected_bounded():
    """Small claimed dims + an IDAT that inflates ~1000x: the bounded
    decompressobj stops at the geometry's byte budget instead of
    materialising the whole stream."""
    bomb = _png(8, 8, zlib.compress(b"\x00" * 50_000_000, 9))
    t0 = time.time()
    with pytest.raises(ValueError, match="inflates past"):
        decode_png(bomb)
    assert time.time() - t0 < GUARD_SECONDS


def test_png_legit_decode_survives_bounded_inflate():
    """The exact-size stream must NOT trip the unconsumed-tail check:
    round-trip a small gray image through the new bounded path."""
    px = np.arange(24, dtype=np.uint8).reshape(4, 6)
    raw = b"".join(b"\x00" + row.tobytes() for row in px)
    out = decode_png(_png(6, 4, zlib.compress(raw)))
    assert out.shape == (4, 6, 1)
    assert (out[:, :, 0] == px).all()


def _gif(iw: int, ih: int) -> bytes:
    # GIF89a, 1x1 logical screen, no global color table, then an
    # image descriptor claiming iw x ih — the guard must fire at the
    # descriptor, before any color-table or LZW work.
    screen = struct.pack("<HH", 1, 1) + bytes([0x00, 0, 0])
    desc = bytes([0x2C]) + struct.pack("<HHHH", 0, 0, iw, ih) + bytes([0])
    return b"GIF89a" + screen + desc + bytes([2, 1, 0x4C, 0]) + b"\x3b"


def test_gif_huge_dims_rejected_fast():
    """LZW expands up to quadratically: a 65500x65500 descriptor on a
    tiny payload must raise before the pixel list is built."""
    t0 = time.time()
    with pytest.raises(ValueError, match="out of range"):
        decode_gif(_gif(65500, 65500))
    assert time.time() - t0 < GUARD_SECONDS


def _jpeg_sof(h: int, w: int, marker: int = 0xC0) -> bytes:
    body = bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0])
    return (b"\xff\xd8" + bytes([0xFF, marker])
            + struct.pack(">H", len(body) + 2) + body + b"\xff\xd9")


@pytest.mark.parametrize("marker", [0xC0, 0xC2, 0xC3, 0xC9])
def test_jpeg_huge_dims_rejected_fast(marker):
    """A crafted DHT can make post-EOI 1-bit padding decode as a valid
    symbol, so the guard must fire at SOF — for baseline, progressive,
    lossless and arithmetic frames alike."""
    t0 = time.time()
    with pytest.raises(ValueError, match="out of range"):
        decode_jpeg(_jpeg_sof(65500, 65500, marker))
    assert time.time() - t0 < GUARD_SECONDS


@pytest.mark.parametrize("h,w", [(0, 8), (8, 0), (0, 0)])
def test_jpeg_zero_dims_rejected(h, w):
    with pytest.raises(ValueError, match="out of range"):
        decode_jpeg(_jpeg_sof(h, w))
