"""Pure-Python WAV (RIFF PCM) decoder — the audio-modality analog of
functions/png.py / raster.py / jpeg.py: decode for REAL what the
public container spec allows without codec libraries, raise
``ValueError`` outside the subset (compressed formats, float PCM).

Subset: RIFF/WAVE with a PCM ``fmt `` chunk (audio format 1), 8- or
16-bit samples, any channel count / sample rate.  Returns the sample
matrix plus the header fields; ``wav_feature`` derives the
deterministic integer-exact stats the driver gate checks (catalog
q83).
"""

from __future__ import annotations

import struct

import numpy as np


def decode_wav(data: bytes) -> tuple[np.ndarray, int, int]:
    """WAV payload -> (samples[int32: n, channels], sample_rate, bits).

    16-bit samples come back in [-32768, 32767], 8-bit (unsigned per
    spec) shifted to signed [-128, 127]."""
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
            if audio_fmt != 1:
                raise ValueError(f"non-PCM WAV (format {audio_fmt})")
            if bits not in (8, 16):
                raise ValueError(f"PCM bit depth {bits} not supported")
            if channels < 1:
                raise ValueError("WAV with zero channels")
            fmt = (channels, rate, bits)
        elif cid == b"data":
            frames = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or frames is None:
        raise ValueError("WAV missing fmt or data chunk")
    channels, rate, bits = fmt
    if bits == 16:
        s = np.frombuffer(frames[: len(frames) & ~1], dtype="<i2")
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
