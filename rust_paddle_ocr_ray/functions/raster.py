"""Pure-Python BMP and GIF pixel decoders (public specs only).

Same charter as functions/png.py (RFC 2083 subset): make
``real_decode`` REAL for formats this environment can decode without
image libraries, and raise ``ValueError`` outside the supported subset
so the featurizer degrades to its deterministic fake.

- BMP: Windows BITMAPFILEHEADER + BITMAPINFOHEADER (the documented
  40-byte header), uncompressed (BI_RGB) 8-bit-palette and 24-bit
  images, bottom-up or top-down rows, 4-byte row padding.
- GIF: GIF87a/89a logical screen + first image descriptor,
  global/local color table, variable-code-width LZW per the GIF89a
  specification appendix (LSB-first bit packing, CLEAR/END codes,
  12-bit code cap), interlaced (Appendix-E four-pass scatter) or not.

Both return (height, width, 3) uint8 RGB arrays — the decode analog of
the reference's raster ingestion (/root/reference/src/det.rs:176-230),
which consumes RGB pixels regardless of container.
"""

from __future__ import annotations

import struct

import numpy as np


#: corrupt-header guard, same budget as vp8/vp8l/png/jpeg
MAX_PIXELS = 1 << 22


def _u16le(b: bytes, i: int) -> int:
    return b[i] | (b[i + 1] << 8)


def decode_bmp(data: bytes) -> np.ndarray:
    """BMP payload -> (height, width, 3) uint8 RGB pixels.

    Supported subset: BITMAPINFOHEADER (or larger) with BI_RGB
    compression at 8 bpp (palette) or 24 bpp.  Raises ValueError
    outside it."""
    if data[:2] != b"BM" or len(data) < 54:
        raise ValueError("not a BMP payload")
    pixel_off = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise ValueError("BITMAPCOREHEADER not supported")
    width, height = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    comp = struct.unpack_from("<I", data, 30)[0]
    if comp != 0:
        raise ValueError(f"compressed BMP (biCompression={comp}) not supported")
    if width <= 0 or height == 0:
        raise ValueError("degenerate BMP dimensions")
    top_down = height < 0
    h = abs(height)
    if bpp == 24:
        row_bytes = (width * 3 + 3) & ~3
        end = pixel_off + row_bytes * h
        if end > len(data):
            raise ValueError("truncated BMP pixel data")
        raw = np.frombuffer(data[pixel_off:end], dtype=np.uint8)
        rows = raw.reshape(h, row_bytes)[:, : width * 3]
        px = rows.reshape(h, width, 3)[:, :, ::-1]  # BGR -> RGB
        return np.ascontiguousarray(px if top_down else px[::-1])
    if bpp == 8:
        clr_used = struct.unpack_from("<I", data, 46)[0] or 256
        pal_off = 14 + hdr_size
        pal_raw = np.frombuffer(data[pal_off:pal_off + 4 * clr_used],
                                dtype=np.uint8)
        if pal_raw.size < 4 * clr_used:
            raise ValueError("truncated BMP palette")
        pal = np.zeros((256, 3), dtype=np.uint8)
        pal[:clr_used] = pal_raw.reshape(-1, 4)[:, [2, 1, 0]]  # BGRX -> RGB
        row_bytes = (width + 3) & ~3
        end = pixel_off + row_bytes * h
        if end > len(data):
            raise ValueError("truncated BMP pixel data")
        idx = (np.frombuffer(data[pixel_off:end], dtype=np.uint8)
               .reshape(h, row_bytes)[:, :width])
        px = pal[idx]
        return np.ascontiguousarray(px if top_down else px[::-1])
    raise ValueError(f"BMP bit depth {bpp} not supported")


def _gif_lzw(blocks: bytes, min_code_size: int, max_pixels: int) -> list[int]:
    """GIF-flavor LZW decode (GIF89a spec appendix): LSB-first bit
    stream, CLEAR = 2**min_code_size, END = CLEAR+1, code width grows
    when the table fills, capped at 12 bits."""
    clear = 1 << min_code_size
    end = clear + 1
    roots = [(i,) for i in range(clear)] + [(), ()]

    table = list(roots)
    width = min_code_size + 1
    out: list[int] = []
    prev: tuple | None = None

    acc = 0
    nbits = 0
    pos = 0
    n = len(blocks)
    while len(out) < max_pixels:
        while nbits < width:
            if pos >= n:
                return out  # stream ended without END code: emit what we have
            acc |= blocks[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(roots)
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("GIF LZW: first code not a root")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):
            entry = prev + prev[:1]
        else:
            raise ValueError("GIF LZW: code beyond table")
        out.extend(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
        if len(table) == (1 << width) and width < 12:
            width += 1
        prev = entry
    return out


def decode_gif(data: bytes) -> np.ndarray:
    """GIF payload -> (height, width, 3) uint8 RGB pixels of the FIRST
    frame, interlaced (GIF89a Appendix E pass scatter) or sequential;
    raises ValueError outside the decodable subset."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    pos = 13
    packed = data[10]
    gct = None
    if packed & 0x80:
        m = 2 << (packed & 7)
        gct = np.frombuffer(data[pos:pos + 3 * m], dtype=np.uint8)
        if gct.size < 3 * m:
            raise ValueError("truncated GIF global color table")
        gct = gct.reshape(-1, 3)
        pos += 3 * m
    n = len(data)
    while pos < n:
        b0 = data[pos]
        if b0 == 0x21:  # extension block: label byte + sub-blocks
            pos += 2
            while pos < n and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif b0 == 0x2C:  # image descriptor
            iw, ih = _u16le(data, pos + 5), _u16le(data, pos + 7)
            if iw * ih > MAX_PIXELS:
                # corrupt-header guard: LZW expands up to
                # quadratically, so a ~100 KB bomb could otherwise
                # emit 4G pixels into a Python list
                raise ValueError(
                    f"GIF frame {iw}x{ih} out of range")
            ip = data[pos + 9]
            pos += 10
            lct = None
            if ip & 0x80:
                m = 2 << (ip & 7)
                lct = np.frombuffer(data[pos:pos + 3 * m], dtype=np.uint8)
                if lct.size < 3 * m:
                    raise ValueError("truncated GIF local color table")
                lct = lct.reshape(-1, 3)
                pos += 3 * m
            interlaced = bool(ip & 0x40)
            if not iw or not ih:
                raise ValueError("degenerate GIF image dimensions")
            min_code = data[pos]
            pos += 1
            if not 2 <= min_code <= 11:
                raise ValueError(f"GIF LZW min code size {min_code}")
            chunks = []
            while pos < n:
                ln = data[pos]
                pos += 1
                if ln == 0:
                    break
                chunks.append(data[pos:pos + ln])
                pos += ln
            pal = lct if lct is not None else gct
            if pal is None:
                raise ValueError("GIF image without a color table")
            idx = _gif_lzw(b"".join(chunks), min_code, iw * ih)
            if len(idx) < iw * ih:
                raise ValueError("GIF pixel data ended early")
            pal_full = np.zeros((256, 3), dtype=np.uint8)
            pal_full[: len(pal)] = pal
            arr = np.asarray(idx[: iw * ih], dtype=np.int32).reshape(ih, iw)
            if interlaced:
                # GIF89a appendix E: rows arrive in four passes
                # (every 8th from 0, every 8th from 4, every 4th from
                # 2, every 2nd from 1) — scatter back to display order
                order = np.concatenate([
                    np.arange(0, ih, 8), np.arange(4, ih, 8),
                    np.arange(2, ih, 4), np.arange(1, ih, 2)])
                disp = np.empty_like(arr)
                disp[order] = arr
                arr = disp
            return pal_full[arr]
        elif b0 == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b0:02x}")
    raise ValueError("GIF without an image descriptor")
