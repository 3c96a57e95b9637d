"""Pure-Python WAV (RIFF) decoder — the audio-modality analog of
functions/png.py / raster.py / jpeg.py: decode for REAL what the
public container spec allows without codec libraries, raise
``ValueError`` outside the subset (compressed codecs: ADPCM, mp3-in-
WAV, a-law/µ-law).

Coverage: RIFF/WAVE with integer PCM (format 1) at 8/16/24/32 bits,
IEEE float (format 3) at 32/64 bits, and WAVE_FORMAT_EXTENSIBLE
(format 0xFFFE — the multichannel/24-bit container real encoders
emit) wrapping either, any channel count / sample rate.  Float
samples reduce to integers by the PINNED rule ``trunc(f * 32768)``
clipped to int16 range — exact whenever the payload carries k/32768
values (the synthetic gate's form), deterministic always.  Returns
the sample matrix plus the header fields; ``wav_feature`` derives the
deterministic integer-exact stats the driver gate checks (catalog
q83)."""

from __future__ import annotations

import struct

import numpy as np


#: the fixed GUID tail shared by every standard WAVE_FORMAT_EXTENSIBLE
#: media subtype (the leading 2 bytes carry the real format code)
_EXT_GUID_TAIL = bytes.fromhex("000000001000800000AA00389B71")


def decode_wav(data: bytes) -> tuple[np.ndarray, int, int]:
    """WAV payload -> (samples[int32: n, channels], sample_rate, bits).

    16-bit samples come back in [-32768, 32767]; 8-bit (unsigned per
    spec) shifted to signed [-128, 127]; 24/32-bit sign-extended
    verbatim; float (format 3, 32/64-bit) reduced by the pinned
    ``trunc(f * 32768)`` rule clipped to [-32768, 32767]."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    n = len(data)
    fmt = None
    frames = None
    while pos + 8 <= n:
        cid = data[pos:pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated fmt chunk")
            (audio_fmt, channels, rate, _brate, _align,
             bits) = struct.unpack_from("<HHIIHH", body, 0)
            if audio_fmt == 0xFFFE:
                # WAVE_FORMAT_EXTENSIBLE: the real code leads the
                # SubFormat GUID (offset 24 after cbSize at 16)
                if len(body) < 40:
                    raise ValueError("truncated extensible fmt chunk")
                if body[26:40] != _EXT_GUID_TAIL:
                    raise ValueError("unknown WAV extensible subformat")
                audio_fmt = struct.unpack_from("<H", body, 24)[0]
            if audio_fmt == 1:
                if bits not in (8, 16, 24, 32):
                    raise ValueError(f"PCM bit depth {bits} not supported")
            elif audio_fmt == 3:
                if bits not in (32, 64):
                    raise ValueError(f"float bit depth {bits} not supported")
            else:
                raise ValueError(f"non-PCM WAV (format {audio_fmt})")
            if channels < 1:
                raise ValueError("WAV with zero channels")
            fmt = (audio_fmt, channels, rate, bits)
        elif cid == b"data":
            frames = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or frames is None:
        raise ValueError("WAV missing fmt or data chunk")
    audio_fmt, channels, rate, bits = fmt
    if audio_fmt == 3:
        dt = "<f4" if bits == 32 else "<f8"
        w = bits // 8
        f = np.frombuffer(frames[: len(frames) - len(frames) % w],
                          dtype=dt).astype(np.float64)
        s = np.clip(np.trunc(f * 32768), -32768, 32767).astype(np.int32)
    elif bits == 16:
        s = np.frombuffer(frames[: len(frames) & ~1], dtype="<i2")
    elif bits == 24:
        b = np.frombuffer(frames[: len(frames) - len(frames) % 3],
                          dtype=np.uint8).reshape(-1, 3).astype(np.int32)
        v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        s = v - ((v & 0x800000) << 1)  # sign-extend 24 -> 32
    elif bits == 32:
        s = np.frombuffer(frames[: len(frames) & ~3], dtype="<i4")
    else:
        s = np.frombuffer(frames, dtype=np.uint8).astype(np.int16) - 128
    usable = (s.size // channels) * channels
    return (s[:usable].astype(np.int32).reshape(-1, channels), rate, bits)


def wav_feature(samples: np.ndarray) -> dict:
    """Integer-exact summary stats over all channels: sample count,
    sum, sum of |x|, and zero-crossing count of channel 0 (a sign
    change between consecutive samples, zeros keeping the last sign) —
    each reproducible in closed form for a synthetic waveform."""
    flat = samples.astype(np.int64).ravel()
    ch0 = samples[:, 0].astype(np.int64)
    sign = np.sign(ch0)
    # zeros inherit the previous sign so a touch of zero is not 2
    # crossings — vectorized last-nonzero propagation
    idx = np.where(sign != 0, np.arange(sign.size), -1)
    np.maximum.accumulate(idx, out=idx)
    signs = np.where(idx >= 0, sign[np.clip(idx, 0, None)], 0)
    run = signs[signs != 0]
    crossings = int(np.count_nonzero(run[1:] * run[:-1] < 0))
    return {
        "n_samples": int(flat.size),
        "sum_amp": int(flat.sum()),
        "sum_abs": int(np.abs(flat).sum()),
        "zero_crossings": crossings,
    }
