"""WAV PCM decoder (functions/audio.py): round-trips, chunk-walk
robustness (extra chunks, word alignment), 8-bit and stereo paths,
subset rejections, and the zero-inheritance rule of the
zero-crossing count."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from rust_paddle_ocr_ray.functions.audio import decode_wav, wav_feature
from rust_paddle_ocr_ray.sources.synth import encode_wav_pcm16


def test_pcm16_roundtrip_mono_and_stereo():
    rng = np.random.RandomState(5)
    mono = rng.randint(-32768, 32768, 200).astype(np.int16)
    s, rate, bits = decode_wav(encode_wav_pcm16(mono, rate=44100))
    assert (rate, bits) == (44100, 16)
    np.testing.assert_array_equal(s[:, 0], mono.astype(np.int32))

    stereo = rng.randint(-32768, 32768, (50, 2)).astype(np.int16)
    s, _, _ = decode_wav(encode_wav_pcm16(stereo))
    np.testing.assert_array_equal(s, stereo.astype(np.int32))


def test_extra_chunk_and_odd_size_alignment():
    body = encode_wav_pcm16(np.array([1, -1, 2], dtype=np.int16))
    # splice an odd-sized LIST chunk (padded per RIFF) before fmt
    extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    data = body[:12] + extra + body[12:]
    data = data[:4] + struct.pack("<I", len(data) - 8) + data[8:]
    s, _, _ = decode_wav(data)
    assert s[:, 0].tolist() == [1, -1, 2]


def test_pcm8_shifts_to_signed():
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    frames = bytes([0, 128, 255])
    riff = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(frames)) + frames)
    s, _, bits = decode_wav(b"RIFF" + struct.pack("<I", len(riff)) + riff)
    assert bits == 8 and s[:, 0].tolist() == [-128, 0, 127]


def test_rejects_outside_subset():
    with pytest.raises(ValueError):
        decode_wav(b"not riff")

    def wav_with_fmt(fmt: bytes) -> bytes:
        riff = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                + b"data" + struct.pack("<I", 0))
        return b"RIFF" + struct.pack("<I", len(riff)) + riff

    # ADPCM (format 2) is a compressed codec, honestly out
    with pytest.raises(ValueError, match="non-PCM"):
        decode_wav(wav_with_fmt(
            struct.pack("<HHIIHH", 2, 1, 8000, 32000, 4, 4)))
    # float at a non-IEEE width
    with pytest.raises(ValueError, match="float bit depth"):
        decode_wav(wav_with_fmt(
            struct.pack("<HHIIHH", 3, 1, 8000, 16000, 2, 16)))
    # extensible wrapping an unknown subformat GUID
    bad_ext = (struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 16000, 2, 16)
               + struct.pack("<HHI", 22, 16, 1)
               + struct.pack("<H", 1) + b"\x00" * 14)
    with pytest.raises(ValueError, match="subformat"):
        decode_wav(wav_with_fmt(bad_ext))


@pytest.mark.parametrize("layout", ["pcm16", "pcm24", "pcm32", "float32",
                                    "ext_pcm16", "ext_float32"])
def test_all_layouts_decode_identically(layout):
    """Every on-wire layout of the same int16-range values decodes to
    the SAME sample matrix (the q83 gate's layout-independence)."""
    rng = np.random.RandomState(7)
    s = rng.randint(-2000, 2000, (101, 2)).astype(np.int64)
    got, _rate, _bits = decode_wav(encode_wav_pcm16(s, layout=layout))
    np.testing.assert_array_equal(got, s)


def test_pcm24_and_pcm32_full_range():
    """24/32-bit values beyond int16 range sign-extend exactly."""
    big = np.array([[8388607], [-8388608], [70000], [-70000]],
                   dtype=np.int64)
    got, _, bits = decode_wav(encode_wav_pcm16(big, layout="pcm24"))
    assert bits == 24
    np.testing.assert_array_equal(got, big)
    big32 = np.array([[2 ** 31 - 1], [-2 ** 31], [123456789]],
                     dtype=np.int64)
    got, _, bits = decode_wav(encode_wav_pcm16(big32, layout="pcm32"))
    assert bits == 32
    np.testing.assert_array_equal(got, big32)


def test_float_clip_rule_pinned():
    """Out-of-range float samples clip to the int16 rails via the
    pinned trunc(f*32768) rule — deterministic, never wrapping."""
    pat = struct.pack("<f", 1 / 32768.0)
    base = encode_wav_pcm16(np.array([[1]], dtype=np.int64),
                            layout="float32")
    assert base.count(pat) == 1
    hi, _, _ = decode_wav(base.replace(pat, struct.pack("<f", 7.5)))
    lo, _, _ = decode_wav(base.replace(pat, struct.pack("<f", -7.5)))
    assert hi[0, 0] == 32767 and lo[0, 0] == -32768


def test_zero_crossings_inherit_sign_through_zero():
    # +5, 0, -5: ONE crossing (the zero touch is not two)
    s, _, _ = decode_wav(encode_wav_pcm16(
        np.array([5, 0, -5, 0, 0, 5], dtype=np.int16)))
    f = wav_feature(s)
    assert f["zero_crossings"] == 2
    assert f["sum_abs"] == 15 and f["sum_amp"] == 5
