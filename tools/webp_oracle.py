"""ctypes oracle bindings for the system libwebp (TEST/TOOLING ONLY).

The production VP8 decoder (functions/vp8.py) is pure Python with no
runtime dependency on this module; libwebp here is the INDEPENDENT
ORACLE used by tests and table-validation tooling:

- ``encode_rgb(...)``   -> a real VP8 (lossy WebP) bitstream for any
  pixel input, with control over filter strength / segments / token
  partitions / quality through the public ``WebPConfig`` advanced API
  (struct layouts mirror the public ``webp/encode.h`` for 1.2.x and
  are SELF-CHECKED at load time by reading back the documented
  ``WebPConfigInit`` defaults -- a layout drift fails loudly, never
  silently).
- ``decode_yuv(...)``   -> libwebp's own reconstruction (Y/U/V planes,
  4:2:0) for differential bit-exact comparison against ours.

Everything degrades to ``OracleUnavailable`` when the shared library
is absent, so test modules can ``pytest.importorskip``-style gate.

Public-knowledge basis: the WebP container and VP8 bitstream are
specified in RFC 6386 + the public libwebp API headers; no private
interfaces are touched (all symbols used are exported public API).
"""

from __future__ import annotations

import ctypes
from ctypes import (
    POINTER, byref, c_float, c_int, c_size_t, c_ubyte, c_uint32,
    c_void_p, cast,
)

import numpy as np


class OracleUnavailable(RuntimeError):
    pass


_LIB = None
_ABI = None


def _load():
    global _LIB, _ABI
    if _LIB is not None:
        return _LIB
    try:
        lib = ctypes.CDLL("libwebp.so.7")
    except OSError as exc:  # pragma: no cover - environment-dependent
        raise OracleUnavailable(f"libwebp.so.7 not loadable: {exc}")
    lib.WebPGetDecoderVersion.restype = c_int
    _LIB = lib
    return lib


# --- struct mirrors of the public webp/encode.h (1.2.x line) ---------

class WebPConfig(ctypes.Structure):
    _fields_ = [
        ("lossless", c_int),
        ("quality", c_float),
        ("method", c_int),
        ("image_hint", c_int),
        ("target_size", c_int),
        ("target_PSNR", c_float),
        ("segments", c_int),
        ("sns_strength", c_int),
        ("filter_strength", c_int),
        ("filter_sharpness", c_int),
        ("filter_type", c_int),
        ("autofilter", c_int),
        ("alpha_compression", c_int),
        ("alpha_filtering", c_int),
        ("alpha_quality", c_int),
        ("pass_", c_int),
        ("show_compressed", c_int),
        ("preprocessing", c_int),
        ("partitions", c_int),
        ("partition_limit", c_int),
        ("emulate_jpeg_size", c_int),
        ("thread_level", c_int),
        ("low_memory", c_int),
        ("near_lossless", c_int),
        ("exact", c_int),
        ("use_delta_palette", c_int),
        ("use_sharp_yuv", c_int),
        ("qmin", c_int),
        ("qmax", c_int),
    ]


WebPWriterFunction = ctypes.CFUNCTYPE(
    c_int, POINTER(c_ubyte), c_size_t, c_void_p)


class WebPPicture(ctypes.Structure):
    _fields_ = [
        ("use_argb", c_int),
        ("colorspace", c_int),
        ("width", c_int),
        ("height", c_int),
        ("y", POINTER(c_ubyte)),
        ("u", POINTER(c_ubyte)),
        ("v", POINTER(c_ubyte)),
        ("y_stride", c_int),
        ("uv_stride", c_int),
        ("a", POINTER(c_ubyte)),
        ("a_stride", c_int),
        ("pad1", c_uint32 * 2),
        ("argb", POINTER(c_uint32)),
        ("argb_stride", c_int),
        ("pad2", c_uint32 * 3),
        ("writer", c_void_p),
        ("custom_ptr", c_void_p),
        ("extra_info_type", c_int),
        ("extra_info", POINTER(c_ubyte)),
        ("stats", c_void_p),
        ("error_code", c_int),
        ("progress_hook", c_void_p),
        ("user_data", c_void_p),
        ("pad3", c_uint32 * 3),
        ("pad4", POINTER(c_ubyte)),
        ("pad5", POINTER(c_ubyte)),
        ("pad6", c_uint32 * 8),
        ("memory_", c_void_p),
        ("memory_argb_", c_void_p),
        ("pad7", c_void_p * 2),
    ]


class WebPMemoryWriter(ctypes.Structure):
    _fields_ = [
        ("mem", POINTER(c_ubyte)),
        ("size", c_size_t),
        ("max_size", c_size_t),
        ("pad", c_uint32 * 1),
    ]


def _probe_abi(lib) -> int:
    """Find the encoder ABI version the .so accepts, then self-check
    that our WebPConfig field layout matches by reading back the
    documented defaults of WebPConfigInit(preset=DEFAULT, quality=75).
    """
    global _ABI
    if _ABI is not None:
        return _ABI
    fn = lib.WebPConfigInitInternal
    fn.restype = c_int
    found = None
    for ver in range(0x0200, 0x0220):
        cfg = WebPConfig()
        if fn(byref(cfg), 0, c_float(75.0), c_int(ver)):
            found = ver
            break
    if found is None:
        raise OracleUnavailable("no accepted WEBP_ENCODER_ABI_VERSION in 0x0200..0x021f")
    # Layout self-check: documented defaults for preset WEBP_PRESET_DEFAULT.
    checks = {
        "lossless": 0, "method": 4, "segments": 4, "sns_strength": 50,
        "filter_strength": 60, "filter_sharpness": 0, "filter_type": 1,
        "autofilter": 0, "pass_": 1, "partitions": 0, "qmin": 0, "qmax": 100,
    }
    bad = {k: getattr(cfg, k) for k, v in checks.items() if getattr(cfg, k) != v}
    if bad or abs(cfg.quality - 75.0) > 1e-6:
        raise OracleUnavailable(
            f"WebPConfig layout drift vs public 1.2.x header: {bad}, q={cfg.quality}")
    _ABI = found
    return found


def encode_rgb(rgb: np.ndarray, quality: float = 75.0, **overrides) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array to a lossy WebP (VP8) payload.

    ``overrides`` set any WebPConfig field by name (e.g.
    ``filter_strength=0, segments=1, partitions=2, autofilter=0``).
    """
    lib = _load()
    abi = _probe_abi(lib)
    h, w, c = rgb.shape
    assert c == 3 and rgb.dtype == np.uint8
    cfg = WebPConfig()
    if not lib.WebPConfigInitInternal(byref(cfg), 0, c_float(quality), c_int(abi)):
        raise OracleUnavailable("WebPConfigInit failed")
    for k, v in overrides.items():
        if not hasattr(cfg, k):
            raise AttributeError(f"unknown WebPConfig field {k}")
        setattr(cfg, k, type(getattr(cfg, k))(v) if isinstance(v, float) else v)
    lib.WebPValidateConfig.restype = c_int
    if not lib.WebPValidateConfig(byref(cfg)):
        raise ValueError(f"invalid WebPConfig overrides: {overrides}")

    pic = WebPPicture()
    if not lib.WebPPictureInitInternal(byref(pic), c_int(abi)):
        raise OracleUnavailable("WebPPictureInit failed")
    pic.width = w
    pic.height = h
    pic.use_argb = 0
    buf = np.ascontiguousarray(rgb)
    lib.WebPPictureImportRGB.restype = c_int
    if not lib.WebPPictureImportRGB(
            byref(pic), buf.ctypes.data_as(POINTER(c_ubyte)), c_int(w * 3)):
        raise ValueError("WebPPictureImportRGB failed")

    wrt = WebPMemoryWriter()
    lib.WebPMemoryWriterInit(byref(wrt))
    pic.writer = cast(lib.WebPMemoryWrite, c_void_p)
    pic.custom_ptr = cast(byref(wrt), c_void_p)
    lib.WebPEncode.restype = c_int
    ok = lib.WebPEncode(byref(cfg), byref(pic))
    err = pic.error_code
    lib.WebPPictureFree(byref(pic))
    if not ok:
        lib.WebPMemoryWriterClear(byref(wrt))
        raise ValueError(f"WebPEncode failed, error_code={err}")
    out = ctypes.string_at(wrt.mem, wrt.size)
    lib.WebPMemoryWriterClear(byref(wrt))
    return out


def encode_rgb_simple(rgb: np.ndarray, quality: float = 75.0) -> bytes:
    """Encode via the simple WebPEncodeRGB API (default config)."""
    lib = _load()
    h, w, c = rgb.shape
    assert c == 3 and rgb.dtype == np.uint8
    out_ptr = POINTER(c_ubyte)()
    lib.WebPEncodeRGB.restype = c_size_t
    buf = np.ascontiguousarray(rgb)
    n = lib.WebPEncodeRGB(
        buf.ctypes.data_as(POINTER(c_ubyte)), c_int(w), c_int(h),
        c_int(w * 3), c_float(quality), byref(out_ptr))
    if n == 0:
        raise ValueError("WebPEncodeRGB failed")
    data = ctypes.string_at(out_ptr, n)
    lib.WebPFree(out_ptr)
    return data


def encode_lossless_rgb(rgb: np.ndarray) -> bytes:
    """Encode via the simple WebPEncodeLosslessRGB API -> a real VP8L
    (lossless WebP) bitstream, the independent-encoder source for the
    functions/vp8l differential sweep."""
    lib = _load()
    h, w, c = rgb.shape
    assert c == 3 and rgb.dtype == np.uint8
    out_ptr = POINTER(c_ubyte)()
    lib.WebPEncodeLosslessRGB.restype = c_size_t
    buf = np.ascontiguousarray(rgb)
    n = lib.WebPEncodeLosslessRGB(
        buf.ctypes.data_as(POINTER(c_ubyte)), c_int(w), c_int(h),
        c_int(w * 3), byref(out_ptr))
    if n == 0:
        raise ValueError("WebPEncodeLosslessRGB failed")
    data = ctypes.string_at(out_ptr, n)
    lib.WebPFree(out_ptr)
    return data


def decode_yuv(data: bytes):
    """Decode a WebP payload to libwebp's own (y, u, v) uint8 planes.

    Returns (y[h,w], u[ch,cw], v[ch,cw]) copies; 4:2:0 with
    cw=(w+1)//2, ch=(h+1)//2.  This is the VP8 reconstruction AFTER
    the in-loop filter -- the exact differential target for
    functions/vp8.decode_vp8.
    """
    lib = _load()
    w = c_int()
    h = c_int()
    u_ptr = POINTER(c_ubyte)()
    v_ptr = POINTER(c_ubyte)()
    stride = c_int()
    uv_stride = c_int()
    lib.WebPDecodeYUV.restype = POINTER(c_ubyte)
    y_ptr = lib.WebPDecodeYUV(
        (c_ubyte * len(data)).from_buffer_copy(data), c_size_t(len(data)),
        byref(w), byref(h), byref(u_ptr), byref(v_ptr),
        byref(stride), byref(uv_stride))
    if not y_ptr:
        raise ValueError("WebPDecodeYUV failed")
    W, H, S, US = w.value, h.value, stride.value, uv_stride.value
    cw, ch = (W + 1) // 2, (H + 1) // 2
    y = np.ctypeslib.as_array(y_ptr, shape=(H, S))[:, :W].copy()
    u = np.ctypeslib.as_array(u_ptr, shape=(ch, US))[:, :cw].copy()
    v = np.ctypeslib.as_array(v_ptr, shape=(ch, US))[:, :cw].copy()
    lib.WebPFree(y_ptr)
    return y, u, v


def decode_rgb(data: bytes) -> np.ndarray:
    """Decode a WebP payload to libwebp's (h, w, 3) RGB (fancy upsampler)."""
    lib = _load()
    w = c_int()
    h = c_int()
    lib.WebPDecodeRGB.restype = POINTER(c_ubyte)
    ptr = lib.WebPDecodeRGB(
        (c_ubyte * len(data)).from_buffer_copy(data), c_size_t(len(data)),
        byref(w), byref(h))
    if not ptr:
        raise ValueError("WebPDecodeRGB failed")
    out = np.ctypeslib.as_array(ptr, shape=(h.value, w.value, 3)).copy()
    lib.WebPFree(ptr)
    return out


def available() -> bool:
    try:
        _probe_abi(_load())
        return True
    except (OracleUnavailable, OSError):
        return False
