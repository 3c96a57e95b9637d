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
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)  # float PCM
    riff = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 0))
    with pytest.raises(ValueError):
        decode_wav(b"RIFF" + struct.pack("<I", len(riff)) + riff)


def test_zero_crossings_inherit_sign_through_zero():
    # +5, 0, -5: ONE crossing (the zero touch is not two)
    s, _, _ = decode_wav(encode_wav_pcm16(
        np.array([5, 0, -5, 0, 0, 5], dtype=np.int16)))
    f = wav_feature(s)
    assert f["zero_crossings"] == 2
    assert f["sum_abs"] == 15 and f["sum_amp"] == 5
