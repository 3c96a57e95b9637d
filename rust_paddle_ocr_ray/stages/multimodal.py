"""Multimodal plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata.

PNG, BMP, GIF and baseline JPEG payloads decode for REAL — pure-Python
public-spec pixel decoders (functions/png.py: RFC 2083 incl. 1/2/4-bit
grey/palette; functions/raster.py: BITMAPINFOHEADER + GIF89a LZW incl.
interlace; functions/jpeg.py: ITU-T T.81 baseline + progressive +
lossless (SOF3) + arithmetic-coded sequential (SOF9, the Annex D
QM-coder in functions/jpeg_arith.py), grayscale +
YCbCr; functions/vp8l.py: lossless WebP; functions/vp8.py: lossy WebP
VP8 key frames per RFC 6386, bit-exact incl. the in-loop filter),
emitting true width/height and pixel-statistics features.  No media
stubs remain — unknown formats and corrupt payloads take the
deterministic fake path; everything Ray-side is real and tested:
schema, actor-pool signature, small batch sizes for large payloads.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa

from ..functions.png import PNG_SIG, decode_png, pixel_feature
from ..sizing import proportional_pool

MEDIA_META_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("n_bytes", pa.int64()),
        ("sha16", pa.string()),
        ("width", pa.int32()),      # fake (deterministic) until a real decoder exists
        ("height", pa.int32()),
        ("feature", pa.list_(pa.float32())),
    ]
)


def decode_payload(payload: bytes) -> np.ndarray:
    """Dispatch a raster payload to its pure-Python decoder ->
    (h, w, c) uint8 pixels.  ValueError outside a decoder's subset OR
    for any malformed payload (internal Index/struct/zlib errors are
    converted here — a 100 TB crawl WILL contain corrupt files, and a
    task must degrade, not die), NotImplementedError only for formats
    with no decoder at all (PNG/BMP/GIF/JPEG-every-T.81-mode/
    WebP-lossless+lossy all decode for real)."""
    import struct

    from ..functions.jpeg import decode_jpeg
    from ..functions.raster import decode_bmp, decode_gif
    from ..functions.vp8l import decode_webp

    try:
        if payload[:8] == PNG_SIG:
            return decode_png(payload)
        if payload[:2] == b"BM":
            return decode_bmp(payload)
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            return decode_gif(payload)
        if payload[:2] == b"\xff\xd8":
            px = decode_jpeg(payload)
            return px[:, :, None] if px.ndim == 2 else px
        if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
            return decode_webp(payload)  # VP8L and lossy VP8 both real
    except (IndexError, KeyError, OverflowError, struct.error,
            zlib.error) as exc:
        raise ValueError(f"malformed payload: {exc!r}") from exc
    raise NotImplementedError(
        "no decoder for this payload format; the pipeline uses the "
        "deterministic fake decoder"
    )


def resize_nearest(px: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize with the standard floor mapping
    ``src = (dst * src_dim) // dst_dim`` — integer-exact and therefore
    reproducible across engines (bilinear weights are float and
    engine-specific; the featurizer's grid means cover the smooth
    case).  Vectorized fancy indexing, no loops."""
    h, w = px.shape[0], px.shape[1]
    if out_h <= 0 or out_w <= 0:
        raise ValueError("resize target must be positive")
    ri = (np.arange(out_h, dtype=np.int64) * h) // out_h
    ci = (np.arange(out_w, dtype=np.int64) * w) // out_w
    return px[ri][:, ci]


class MediaResizer:
    """Actor-pool resize stage (the brief's decode/featurize/RESIZE/
    frame-sample family): decodes each payload with the pure-Python
    decoders and emits fixed-size nearest-neighbor thumbnails as raw
    RGB bytes; undecodable payloads degrade to a deterministic fake
    thumbnail (digest-seeded), same contract as MediaFeaturizer."""

    def __init__(self, payload_col: str, id_col: str,
                 out_h: int = 16, out_w: int = 16, emit: str = "raw"):
        if emit not in ("raw", "png"):
            raise ValueError("emit must be 'raw' or 'png'")
        self.payload_col = payload_col
        self.id_col = id_col
        self.out_h = out_h
        self.out_w = out_w
        self.emit = emit

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {"media_id": [], "width": [], "height": [],
                "real_decode": [], "thumb": []}
        for mid, payload in zip(batch[self.id_col].to_pylist(),
                                batch[self.payload_col].to_pylist()):
            payload = payload or b""
            try:
                px = decode_payload(payload)
                real = True
            except (NotImplementedError, ValueError, zlib.error):
                d = hashlib.blake2b(payload, digest_size=32).digest()
                side = 8 + d[0] % 8
                seed = hashlib.blake2b(payload, digest_size=64,
                                       person=b"thumb").digest()
                raw = (seed * (side * side // 64 + 1))[: side * side]
                px = np.frombuffer(raw, dtype=np.uint8).reshape(side, side, 1)
                real = False
            c = px.shape[2]
            if c <= 2:  # grey / grey+alpha: replicate luma, drop alpha
                px = np.repeat(px[:, :, :1], 3, axis=2)
            elif c == 4:  # RGBA -> RGB
                px = px[:, :, :3]
            thumb = resize_nearest(px, self.out_h, self.out_w)
            if self.emit == "png":
                # decode -> resize -> RE-ENCODE: the thumbnail artifact
                # a curation pipeline actually writes out
                from ..sources.synth import encode_png_rgb

                blob = encode_png_rgb(thumb)
            else:
                blob = np.ascontiguousarray(thumb).tobytes()
            rows["media_id"].append(mid)
            rows["width"].append(px.shape[1])
            rows["height"].append(px.shape[0])
            rows["real_decode"].append(real)
            rows["thumb"].append(blob)
        return pa.Table.from_pydict(rows, schema=pa.schema([
            ("media_id", pa.int64()), ("width", pa.int32()),
            ("height", pa.int32()), ("real_decode", pa.bool_()),
            ("thumb", pa.binary()),
        ]))


def resize_media(ds, payload_col: str, id_col: str, out_h: int = 16,
                 out_w: int = 16, batch_size: int = 64, concurrency=None,
                 emit: str = "raw"):
    """Resize as an actor-pool map_batches stage (small batches — large
    binary payloads).  ``emit='png'`` re-encodes each thumbnail as a
    PNG blob (the artifact a curation run writes out)."""
    return ds.map_batches(
        MediaResizer,
        fn_constructor_kwargs={"payload_col": payload_col,
                               "id_col": id_col,
                               "out_h": out_h, "out_w": out_w,
                               "emit": emit},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency or proportional_pool(),
    )


def real_decode(payload: bytes, feat_dim: int = 64) -> tuple[int, int, np.ndarray]:
    """The real decode hook -> (width, height, feature).

    PNG (pure-Python RFC 2083, functions/png.py — zlib IDAT + per-row
    unfilter, all five filter types, grey/RGB/palette/alpha at bit
    depths 1/2/4/8), BMP (BITMAPINFOHEADER BI_RGB 8/24-bit), GIF
    (variable-width LZW per the GIF89a spec, first frame, interlaced
    or not), JPEG (functions/jpeg.py — T.81 Huffman + IDCT, baseline
    progressive and lossless, grayscale and YCbCr) and WebP — BOTH halves
    (functions/vp8l.py — VP8L prefix codes, color cache, LZ77, all
    four transforms; functions/vp8.py — lossy VP8 key frames per RFC
    6386 incl. the in-loop filter, bit-exact vs libwebp) — decode for
    REAL.  Unrecognized formats raise NotImplementedError and the
    featurizer degrades to the deterministic fake decoder."""
    px = decode_payload(payload)
    h, w = px.shape[0], px.shape[1]
    return w, h, pixel_feature(px, feat_dim)


def _fake_decode(payload: bytes, feat_dim: int) -> tuple[int, int, np.ndarray]:
    """Deterministic stand-in for decode + feature extraction: dimensions
    and features derived from the payload digest (stable across workers)."""
    d = hashlib.blake2b(payload, digest_size=32).digest()
    width = 64 + d[0] % 192
    height = 64 + d[1] % 192
    raw = np.frombuffer(
        hashlib.blake2b(payload, digest_size=feat_dim, person=b"feat").digest(),
        dtype=np.uint8,
    )
    feature = (raw.astype(np.float32) - 127.5) / 127.5
    return width, height, feature


class MediaFeaturizer:
    """Actor-pool stage over binary payloads.  Use SMALL ``batch_size``
    (payloads are large) and ``batch_format='pyarrow'`` (binary columns
    don't round-trip pandas cleanly)."""

    def __init__(self, payload_col: str, id_col: str, feat_dim: int = 64,
                 use_real_decoder: bool = True):
        self.payload_col = payload_col
        self.id_col = id_col
        self.feat_dim = feat_dim
        self.use_real = use_real_decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        payloads = batch[self.payload_col].to_pylist()
        rows = {k: [] for k in MEDIA_META_SCHEMA.names}
        for mid, payload in zip(ids, payloads):
            payload = payload or b""
            feat = None
            if self.use_real:
                try:
                    w, h, feat = real_decode(payload, self.feat_dim)
                except (NotImplementedError, ValueError, zlib.error):
                    # NotImplementedError: format needs an absent library;
                    # ValueError/zlib.error: outside the PNG spec subset or
                    # corrupt — degrade to the deterministic fake either way
                    feat = None
            if feat is None:
                w, h, feat = _fake_decode(payload, self.feat_dim)
            rows["media_id"].append(mid)
            rows["n_bytes"].append(len(payload))
            rows["sha16"].append(hashlib.sha256(payload).hexdigest()[:16])
            rows["width"].append(w)
            rows["height"].append(h)
            rows["feature"].append(feat.tolist())
        return pa.Table.from_pydict(rows, schema=MEDIA_META_SCHEMA)


def featurize_media(ds, payload_col: str, id_col: str, feat_dim: int = 64,
                    batch_size: int = 64, concurrency=None):
    """Decode / feature-extract as an actor-pool map_batches stage."""
    return ds.map_batches(
        MediaFeaturizer,
        fn_constructor_kwargs={"payload_col": payload_col, "id_col": id_col,
                               "feat_dim": feat_dim},
        batch_format="pyarrow",
        batch_size=batch_size,  # large binary rows -> small batches
        concurrency=concurrency or proportional_pool(),
    )


def frame_sample(ds, payload_col: str, id_col: str, every_n: int = 10,
                 batch_size: int = 16):
    """Video frame-sampling plumbing: emits one row per sampled frame with
    a deterministic fake frame digest (decode itself is the stub above)."""

    def sample(batch: pa.Table) -> pa.Table:
        out = {"media_id": [], "frame_no": [], "frame_sha16": []}
        for mid, payload in zip(batch[id_col].to_pylist(), batch[payload_col].to_pylist()):
            payload = payload or b""
            n_frames = max(1, len(payload) // 1024)  # fake: 1 frame per KiB
            for f in range(0, n_frames, every_n):
                d = hashlib.blake2b(payload + f.to_bytes(4, "little"), digest_size=8)
                out["media_id"].append(mid)
                out["frame_no"].append(f)
                out["frame_sha16"].append(d.hexdigest())
        return pa.Table.from_pydict(out)

    return ds.map_batches(sample, batch_format="pyarrow", batch_size=batch_size)
