"""BMP/GIF pixel decoders (functions/raster.py) against hand-built
payloads with known pixels, plus the real_decode dispatch.  The GIF
test writes a REAL variable-width LZW stream with an independent
minimal encoder (clear-before-every-code keeps the table empty, which
the spec explicitly allows), so the decoder's bit unpacking, clear
handling and palette lookup are exercised end to end."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from rust_paddle_ocr_ray.functions.raster import decode_bmp, decode_gif
from rust_paddle_ocr_ray.stages.multimodal import real_decode


def make_bmp24(px: np.ndarray, top_down: bool = False) -> bytes:
    h, w, _ = px.shape
    row = w * 3
    pad = (-row) % 4
    body = b""
    rows = px if top_down else px[::-1]
    for r in rows:
        body += r[:, ::-1].tobytes() + b"\x00" * pad  # RGB -> BGR
    hdr = b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, (-h if top_down else h),
                       1, 24, 0, len(body), 2835, 2835, 0, 0)
    return hdr + info + body


def make_bmp8(idx: np.ndarray, palette: np.ndarray) -> bytes:
    h, w = idx.shape
    pad = (-w) % 4
    body = b"".join(r.tobytes() + b"\x00" * pad for r in idx[::-1])
    pal = b"".join(bytes([b, g, r, 0]) for r, g, b in palette)
    off = 54 + len(pal)
    hdr = b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(body),
                       2835, 2835, len(palette), 0)
    return hdr + info + pal + body


def _lzw_pack(codes: list[int], width: int) -> bytes:
    acc = nbits = 0
    out = bytearray()
    for c in codes:
        acc |= c << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def make_gif(idx: np.ndarray, palette: np.ndarray,
             min_code_size: int = 2) -> bytes:
    h, w = idx.shape
    n_pal = 1
    while (2 << (n_pal - 1)) < len(palette):
        n_pal += 1
    pal_n = 2 << (n_pal - 1)
    pal = np.zeros((pal_n, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    head = (b"GIF89a" + struct.pack("<HH", w, h)
            + bytes([0x80 | (n_pal - 1), 0, 0]) + pal.tobytes())
    img = b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    codes = [clear]
    for v in idx.ravel().tolist():
        codes += [int(v), clear]  # table stays root-only: fixed width
    codes[-1] = end
    packed = _lzw_pack(codes, min_code_size + 1)
    sub = b""
    for i in range(0, len(packed), 255):
        chunk = packed[i:i + 255]
        sub += bytes([len(chunk)]) + chunk
    return head + img + bytes([min_code_size]) + sub + b"\x00" + b"\x3b"


PAL = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [10, 20, 30]],
               dtype=np.uint8)


def test_bmp24_roundtrip_both_orientations():
    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    for td in (False, True):
        got = decode_bmp(make_bmp24(px, top_down=td))
        np.testing.assert_array_equal(got, px)


def test_bmp8_palette():
    idx = np.array([[0, 1, 2], [3, 0, 1]], dtype=np.uint8)
    got = decode_bmp(make_bmp8(idx, PAL))
    np.testing.assert_array_equal(got, PAL[idx])


def test_bmp_rejects_compressed():
    b = bytearray(make_bmp24(np.zeros((1, 1, 3), dtype=np.uint8)))
    b[30] = 1  # biCompression = BI_RLE8
    with pytest.raises(ValueError):
        decode_bmp(bytes(b))


def test_gif_roundtrip_real_lzw():
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0], [1, 1, 2, 2]],
                   dtype=np.uint8)
    got = decode_gif(make_gif(idx, PAL))
    np.testing.assert_array_equal(got, PAL[idx])


def test_gif_compressed_run_grows_table():
    # a run of equal pixels WITHOUT interleaved clears: the decoder
    # must build table entries, handle the code==len(table) (KwKwK)
    # case, and grow the code width exactly when the table fills.
    # Sequence: 0, 00, 000, 0000, 0 -> 11 zeros; the table reaches 8
    # entries after code 7, so codes 8/0/end are packed at width 4.
    from rust_paddle_ocr_ray.functions.raster import _gif_lzw

    acc = nbits = 0
    out_bytes = bytearray()
    for code, width in [(4, 3), (0, 3), (6, 3), (7, 3),
                        (8, 4), (0, 4), (5, 4)]:
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out_bytes.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out_bytes.append(acc & 0xFF)
    out = _gif_lzw(bytes(out_bytes), 2, 16)
    assert out == [0] * 11


def test_real_decode_dispatch():
    px = np.full((2, 2, 3), 9, dtype=np.uint8)
    w, h, feat = real_decode(make_bmp24(px))
    assert (w, h) == (2, 2) and feat.dtype == np.float32
    idx = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    w, h, feat = real_decode(make_gif(idx, PAL))
    assert (w, h) == (2, 2)
    # mean of channel 0 = mean(255,0,0,10)/255
    assert abs(feat[0] - (255 + 0 + 0 + 10) / 4 / 255.0) < 1e-6
    # a JPEG the T.81-subset decoder can't parse degrades via ValueError
    with pytest.raises(ValueError):
        real_decode(b"\xff\xd8\xff\xe0JFIF-not-decodable")
    # a WebP container with a corrupt VP8 body degrades via ValueError
    # (lossy VP8 decodes for real now — functions/vp8.py)
    with pytest.raises(ValueError):
        real_decode(b"RIFF\x00\x00\x00\x00WEBPVP8 not-decodable")
    # formats with no pure-Python decoder stay the declared stub
    with pytest.raises(NotImplementedError):
        real_decode(b"II*\x00\x08\x00\x00\x00tiff-has-no-decoder")


def test_gif_interlaced_deinterlaces():
    # 8x9 image, value = row index; write rows in interlace pass order
    # with the interlace flag set, expect display order back
    ih, iw = 9, 8
    idx = np.tile(np.arange(ih, dtype=np.uint8)[:, None], (1, iw))
    order = ([r for r in range(0, ih, 8)] + [r for r in range(4, ih, 8)]
             + [r for r in range(2, ih, 4)] + [r for r in range(1, ih, 2)])
    file_rows = idx[order]
    pal = np.repeat(np.arange(16, dtype=np.uint8)[:, None] * 16, 3, axis=1)
    data = bytearray(make_gif(file_rows, pal, min_code_size=4))
    # set the interlace bit in the image descriptor's packed byte
    i = data.index(0x2C)
    assert data[i + 9] in (0x00,)  # no LCT in make_gif output
    data[i + 9] |= 0x40
    got = decode_gif(bytes(data))
    np.testing.assert_array_equal(got, pal[idx])


def test_resize_nearest_floor_mapping():
    from rust_paddle_ocr_ray.stages.multimodal import resize_nearest

    px = np.arange(6 * 4 * 3, dtype=np.uint8).reshape(6, 4, 3)
    th = resize_nearest(px, 3, 2)
    ri = (np.arange(3) * 6) // 3
    ci = (np.arange(2) * 4) // 2
    np.testing.assert_array_equal(th, px[ri][:, ci])
    # upscale replicates
    up = resize_nearest(px[:1, :1], 4, 4)
    assert (up == px[0, 0]).all() and up.shape == (4, 4, 3)
    with pytest.raises(ValueError):
        resize_nearest(px, 0, 2)


def test_media_resizer_stage(ray_session):
    import ray.data as rd

    from rust_paddle_ocr_ray.stages.multimodal import MediaResizer, resize_media

    px = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    payloads = [make_bmp24(px), b"not an image"]
    ds = rd.from_items([{"media_id": i, "payload": p}
                        for i, p in enumerate(payloads)])
    out = (resize_media(ds, "payload", "media_id", out_h=2, out_w=2,
                        concurrency=(1, 2))
           .to_pandas().sort_values("media_id").reset_index(drop=True))
    assert out["real_decode"].tolist() == [True, False]
    assert out.loc[0, "width"] == 4 and out.loc[0, "height"] == 4
    want = px[[0, 2]][:, [0, 2]]
    got = np.frombuffer(out.loc[0, "thumb"], dtype=np.uint8).reshape(2, 2, 3)
    np.testing.assert_array_equal(got, want)
    # fake path still yields a stable 2x2x3 thumb
    assert len(out.loc[1, "thumb"]) == 12


def test_media_resizer_png_emit_roundtrips(ray_session):
    import ray.data as rd

    from rust_paddle_ocr_ray.functions.png import decode_png
    from rust_paddle_ocr_ray.stages.multimodal import resize_media

    px = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    ds = rd.from_items([{"media_id": 0, "payload": make_bmp24(px)}])
    out = resize_media(ds, "payload", "media_id", out_h=4, out_w=4,
                       concurrency=(1, 1), emit="png").to_pandas()
    thumb = decode_png(bytes(out.loc[0, "thumb"]))
    np.testing.assert_array_equal(thumb, px[[0, 2, 4, 6]][:, [0, 2, 4, 6]])
