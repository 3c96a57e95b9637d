"""Lossy WebP (VP8 key frame, functions/vp8.py) differential suite.

Two layers, per the repo's independent-oracle convention (FIXTURES.md):

1. **Committed goldens** (tests/golden/vp8_goldens.parquet, regenerated
   only via ``python tools/make_goldens.py --vp8``): real libwebp
   encodes at varied settings plus libwebp's OWN post-loop-filter YUV
   reconstruction.  Our pure-Python decoder must match bit-exactly.
   Runs everywhere, no codec library needed at test time.
2. **Live oracle sweep** (skipped when libwebp.so.7 is absent): encode
   fresh seeded images across sizes / qualities / filter profiles /
   segment counts / token-partition counts and compare ``decode_vp8``
   against ``WebPDecodeYUV`` plane-for-plane.

Plus the container dispatch (vp8l.decode_webp now routes VP8 chunks
here) and the malformed-input ValueError contract the featurizer's
degrade path relies on.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rust_paddle_ocr_ray.functions.vp8 import (
    decode_vp8,
    decode_vp8_rgb,
    yuv420_to_rgb,
)
from rust_paddle_ocr_ray.functions.vp8l import decode_webp

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "vp8_goldens.parquet")


def _vp8_chunk(data: bytes) -> bytes:
    """Extract the raw VP8 chunk body from a RIFF WebP container."""
    assert data[:4] == b"RIFF" and data[8:12] == b"WEBP"
    pos = 12
    while pos + 8 <= len(data):
        fourcc = data[pos:pos + 4]
        size = int.from_bytes(data[pos + 4:pos + 8], "little")
        if fourcc == b"VP8 ":
            return data[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)
    raise AssertionError("no VP8 chunk")


def _golden_rows():
    tbl = pq.read_table(GOLDEN)
    for i in range(tbl.num_rows):
        r = {c: tbl[c][i].as_py() for c in tbl.column_names}
        h, w = r["height"], r["width"]
        ch, cw = (h + 1) // 2, (w + 1) // 2
        yield (
            r["name"], r["payload"],
            np.frombuffer(r["y"], np.uint8).reshape(h, w),
            np.frombuffer(r["u"], np.uint8).reshape(ch, cw),
            np.frombuffer(r["v"], np.uint8).reshape(ch, cw),
        )


@pytest.mark.parametrize("name,payload,y,u,v", list(_golden_rows()),
                         ids=lambda p: p if isinstance(p, str) else "")
def test_golden_bit_exact(name, payload, y, u, v):
    gy, gu, gv = decode_vp8(_vp8_chunk(payload))
    np.testing.assert_array_equal(gy, y)
    np.testing.assert_array_equal(gu, u)
    np.testing.assert_array_equal(gv, v)


def test_golden_container_dispatch():
    """decode_webp routes lossy VP8 chunks through functions/vp8.py and
    returns the pinned RGB conversion of the bit-exact planes."""
    name, payload, y, u, v = next(_golden_rows())
    rgb = decode_webp(payload)
    np.testing.assert_array_equal(rgb, yuv420_to_rgb(y, u, v))
    assert rgb.shape == (y.shape[0], y.shape[1], 3)


def test_featurizer_dispatch_decodes_lossy_webp():
    from rust_paddle_ocr_ray.stages.multimodal import decode_payload

    name, payload, y, u, v = next(_golden_rows())
    px = decode_payload(payload)
    assert px.shape == (y.shape[0], y.shape[1], 3)


# --- malformed-input contract (the degrade path at 100 TB) -----------

def test_too_short_raises():
    with pytest.raises(ValueError):
        decode_vp8(b"\x00\x01")


def test_bad_start_code_raises():
    with pytest.raises(ValueError):
        decode_vp8(bytes([0x00, 0x00, 0x00, 0xAA, 0xBB, 0xCC,
                          16, 0, 16, 0]) + b"\x00" * 20)


def test_inter_frame_raises():
    # frame tag bit 0 = 1 -> inter frame; never valid in a WebP file
    with pytest.raises(ValueError):
        decode_vp8(bytes([0x01, 0x00, 0x00]) + b"\x9d\x01\x2a"
                   + bytes([16, 0, 16, 0]) + b"\x00" * 20)


def test_partition_overrun_raises():
    # declared first-partition size larger than the remaining bytes
    tag = (1000 << 5) | 0
    with pytest.raises(ValueError):
        decode_vp8(bytes([tag & 0xFF, (tag >> 8) & 0xFF, tag >> 16])
                   + b"\x9d\x01\x2a" + bytes([16, 0, 16, 0]) + b"\x00" * 8)


def test_truncated_golden_raises():
    """Truncation INTO the first partition (or the token-partition size
    table) raises; truncation of the token data itself decodes to
    deterministic garbage by design — the bool decoder's spec-permitted
    zero-fill past the partition end, same as libwebp's bitstream
    layer."""
    _, payload, *_ = next(_golden_rows())
    body = _vp8_chunk(payload)
    part0 = (body[0] | (body[1] << 8) | (body[2] << 16)) >> 5
    with pytest.raises(ValueError):
        decode_vp8(body[: 10 + part0 - 1])


def test_garbage_degrades_in_dispatch():
    """A corrupt VP8 chunk inside a well-formed container must surface
    as ValueError (featurizer fake path), never a crash."""
    body = bytes([0x00, 0x12, 0x00]) + b"\x9d\x01\x2a" + os.urandom(64)
    riff = (b"RIFF" + (len(body) + 12).to_bytes(4, "little") + b"WEBP"
            + b"VP8 " + len(body).to_bytes(4, "little") + body)
    with pytest.raises(ValueError):
        decode_webp(riff)


# --- live libwebp differential sweep ---------------------------------

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


_WO = _oracle()
needs_libwebp = pytest.mark.skipif(
    _WO is None, reason="system libwebp oracle unavailable")


def _smooth(seed, h, w):
    r = np.random.default_rng(seed)
    base = r.integers(0, 256, size=((h + 7) // 8, (w + 7) // 8, 3),
                      dtype=np.uint8)
    img = np.kron(base, np.ones((8, 8, 1), dtype=np.uint8))[:h, :w, :]
    return np.clip(img.astype(np.int16)
                   + r.integers(-12, 13, size=(h, w, 3)),
                   0, 255).astype(np.uint8)


def _noise(seed, h, w):
    return np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8)


def _check(img, **cfg):
    data = _WO.encode_rgb(img, **cfg)
    y, u, v = decode_vp8(_vp8_chunk(data))
    Y, U, V = _WO.decode_yuv(data)
    np.testing.assert_array_equal(y, Y)
    np.testing.assert_array_equal(u, U)
    np.testing.assert_array_equal(v, V)


@needs_libwebp
@pytest.mark.parametrize("h,w", [(16, 16), (24, 40), (33, 17), (64, 48),
                                 (7, 5), (80, 80), (1, 1), (15, 31)])
@pytest.mark.parametrize("q", [10, 50, 75, 95])
def test_sweep_sizes_qualities(h, w, q):
    _check(_smooth(h * 131 + w, h, w), quality=q)


@needs_libwebp
@pytest.mark.parametrize("q", [25, 60, 90])
def test_sweep_noise_bpred_heavy(q):
    """Noise forces B_PRED 4x4 modes and dense coefficients."""
    _check(_noise(q, 48, 32), quality=q)


@needs_libwebp
@pytest.mark.parametrize("cfg", [
    dict(quality=60, filter_type=0, filter_strength=50),   # simple filter
    dict(quality=60, filter_type=1, filter_strength=60),   # normal filter
    dict(quality=60, filter_strength=0),                   # filter off
    dict(quality=60, autofilter=1),
    dict(quality=60, filter_sharpness=7),
    dict(quality=40, segments=4, sns_strength=90),         # segmentation
    dict(quality=40, segments=2, sns_strength=50),
    dict(quality=80, partitions=1),                        # 2 partitions
    dict(quality=80, partitions=2),                        # 4 partitions
    dict(quality=80, partitions=3),                        # 8 partitions
], ids=lambda c: "-".join(f"{k}{v}" for k, v in c.items()))
def test_sweep_encoder_profiles(cfg):
    _check(_smooth(99, 53, 61), **cfg)
    _check(_noise(7, 37, 29), **cfg)


@needs_libwebp
def test_simple_api_encode():
    data = _WO.encode_rgb_simple(_smooth(11, 45, 45), quality=66)
    y, u, v = decode_vp8(_vp8_chunk(data))
    Y, U, V = _WO.decode_yuv(data)
    np.testing.assert_array_equal(y, Y)
    np.testing.assert_array_equal(u, U)
    np.testing.assert_array_equal(v, V)


@needs_libwebp
def test_rgb_path_shape_and_determinism():
    data = _WO.encode_rgb(_smooth(13, 30, 20), quality=70)
    a = decode_vp8_rgb(_vp8_chunk(data))
    b = decode_vp8_rgb(_vp8_chunk(data))
    assert a.shape == (30, 20, 3) and a.dtype == np.uint8
    np.testing.assert_array_equal(a, b)


# --- synthetic flat lossy encoder (the q81 gate leg) ------------------

def _flat_cases():
    return [(200, 16, 16, 20, 0), (5, 32, 28, 0, 0), (128, 17, 9, 63, 1),
            (77, 48, 48, 30, 1), (255, 20, 24, 10, 0), (0, 16, 16, 40, 0),
            (1, 31, 18, 55, 0), (254, 16, 32, 7, 1)]


def test_synth_lossy_flat_roundtrip():
    """sources/synth.encode_webp_lossy_flat -> functions/vp8.py: flat
    luma `value`, flat chroma 128, exact dims — the closed form the
    q81 'webp-lossy' SQL twin relies on."""
    from rust_paddle_ocr_ray.sources.synth import encode_webp_lossy_flat

    for v, w, h, fl, ft in _flat_cases():
        data = encode_webp_lossy_flat(v, w, h, filter_level=fl,
                                      filter_type=ft)
        y, u, vv = decode_vp8(_vp8_chunk(data))
        assert y.shape == (h, w)
        assert (y == v).all() and (u == 128).all() and (vv == 128).all()


@needs_libwebp
def test_synth_lossy_flat_vs_libwebp():
    """Independence: the system libwebp decodes our synthetic
    bitstreams to the same flat planes — the bool encoder, token
    writer and header are spec-valid, not merely self-consistent."""
    from rust_paddle_ocr_ray.sources.synth import encode_webp_lossy_flat

    for v, w, h, fl, ft in _flat_cases():
        data = encode_webp_lossy_flat(v, w, h, filter_level=fl,
                                      filter_type=ft)
        Y, U, V = _WO.decode_yuv(data)
        assert Y.shape == (h, w)
        assert (Y == v).all() and (U == 128).all() and (V == 128).all()


def test_synth_lossy_flat_value_sweep():
    """Every byte value round-trips (token categories 1-6, both signs,
    zero-residual skip-only frames, clip edges)."""
    from rust_paddle_ocr_ray.sources.synth import encode_webp_lossy_flat

    for v in range(0, 256, 7):
        data = encode_webp_lossy_flat(v, 16, 16)
        y, u, vv = decode_vp8(_vp8_chunk(data))
        assert (y == v).all() and (u == 128).all() and (vv == 128).all()


def test_implausible_dims_rejected_fast():
    """Anti-DoS: a tiny first partition cannot legally carry the mode
    records for a huge MB grid (keyframe mode trees use fixed
    mid-range probs, >= ~2 bits/MB) — reject instead of burning ~25 s
    of zero-fill decode on a 60-byte bomb."""
    import time

    from rust_paddle_ocr_ray.sources.synth import encode_webp_lossy_flat

    data = bytearray(encode_webp_lossy_flat(90, 16, 16))
    body = bytearray(_vp8_chunk(bytes(data)))
    body[6:8] = (2048).to_bytes(2, "little")   # claim 2048x2048
    body[8:10] = (2048).to_bytes(2, "little")
    t0 = time.time()
    with pytest.raises(ValueError, match="implausible"):
        decode_vp8(bytes(body))
    assert time.time() - t0 < 0.1


@settings(max_examples=40, deadline=None)
@given(v=st.integers(0, 255), w=st.integers(1, 64), h=st.integers(1, 64),
       fl=st.integers(0, 63), ft=st.integers(0, 1))
def test_synth_lossy_flat_property(v, w, h, fl, ft):
    """Any (value, dims, filter profile) round-trips to the exact flat
    planes — the closed form the q81 twin assumes holds everywhere,
    not just on the enumerated cases."""
    from rust_paddle_ocr_ray.sources.synth import encode_webp_lossy_flat

    data = encode_webp_lossy_flat(v, w, h, filter_level=fl, filter_type=ft)
    y, u, vv = decode_vp8(_vp8_chunk(data))
    assert y.shape == (h, w)
    assert (y == v).all() and (u == 128).all() and (vv == 128).all()


# --- multi-partition / loop-filter-delta branches ----------------------
#
# Measured on this box: libwebp keyframes are always single-partition
# and never emit loop-filter adjustments, so the goldens and the live
# sweep leave the decoder's partition row-dispatch and lf-delta header
# path unexercised.  The synthetic encoder reaches both (synth.py
# encode_webp_lossy_flat nparts/lf_delta), with the first MB of every
# row coded non-skip so each partition that owns a row is genuinely
# READ (all-EOB token blocks), not just parsed from the size table.

def _branch_cases():
    return [(200, 48, 33, 0, 2, None), (57, 64, 128, 1, 4, None),
            (128, 31, 17, 0, 8, None), (255, 16, 16, 1, 8, None),
            (90, 48, 48, 0, 1, 5), (90, 48, 48, 1, 1, -9),
            (14, 33, 50, 0, 4, 63), (201, 130, 70, 1, 8, -63)]


def test_synth_multipartition_lf_delta_roundtrip():
    """Token partitions 2/4/8 (3-byte size table, MB-row round-robin
    per RFC 6386 §9.5) and ref_lf_delta[0] decode to the same flat
    planes as the single-partition/no-delta form."""
    from rust_paddle_ocr_ray.sources.synth import encode_webp_lossy_flat

    for v, w, h, ft, nparts, lfd in _branch_cases():
        data = encode_webp_lossy_flat(v, w, h, filter_type=ft,
                                      nparts=nparts, lf_delta=lfd)
        y, u, vv = decode_vp8(_vp8_chunk(data))
        assert y.shape == (h, w)
        assert (y == v).all() and (u == 128).all() and (vv == 128).all()


@needs_libwebp
def test_synth_multipartition_lf_delta_vs_libwebp():
    """Independence: libwebp decodes the multi-partition / lf-delta
    synthetic bitstreams to the same flat planes — the size table and
    the lf-adjustment header bits are spec-valid."""
    from rust_paddle_ocr_ray.sources.synth import encode_webp_lossy_flat

    for v, w, h, ft, nparts, lfd in _branch_cases():
        data = encode_webp_lossy_flat(v, w, h, filter_type=ft,
                                      nparts=nparts, lf_delta=lfd)
        Y, U, V = _WO.decode_yuv(data)
        assert Y.shape == (h, w)
        assert (Y == v).all() and (U == 128).all() and (V == 128).all()


@settings(max_examples=40, deadline=None)
@given(v=st.integers(0, 255), w=st.integers(1, 80), h=st.integers(1, 80),
       ft=st.integers(0, 1), nparts=st.sampled_from([1, 2, 4, 8]),
       lfd=st.one_of(st.none(), st.integers(-63, 63)))
def test_synth_multipartition_lf_delta_property(v, w, h, ft, nparts, lfd):
    """Any (value, dims, partition count, lf delta) combination
    round-trips exactly — including heights where some partitions own
    zero MB rows (empty partition bodies in the size table)."""
    from rust_paddle_ocr_ray.sources.synth import encode_webp_lossy_flat

    data = encode_webp_lossy_flat(v, w, h, filter_type=ft,
                                  nparts=nparts, lf_delta=lfd)
    y, u, vv = decode_vp8(_vp8_chunk(data))
    assert y.shape == (h, w)
    assert (y == v).all() and (u == 128).all() and (vv == 128).all()
