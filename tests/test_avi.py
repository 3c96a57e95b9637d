"""MJPEG-AVI container walk (functions/avi.py): frame extraction from
hand-built containers, word alignment, sampling stride, and subset
rejections."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from rust_paddle_ocr_ray.functions.avi import iter_avi_frames, sample_mjpeg_frames
from rust_paddle_ocr_ray.sources.synth import encode_avi_mjpeg, encode_jpeg_gray_dc


def _frames(vals):
    return [encode_jpeg_gray_dc(np.array([[v]], dtype=np.uint8))
            for v in vals]


def test_container_roundtrip_and_order():
    frames = _frames([1, 2, 3, 4])
    assert list(iter_avi_frames(encode_avi_mjpeg(frames))) == frames


def test_odd_sized_frames_stay_aligned():
    # JPEG payloads have arbitrary parity; the writer pads, the reader
    # must skip the pad byte (RIFF word alignment)
    frames = _frames(range(7))
    sizes = {len(f) & 1 for f in frames}
    got = list(iter_avi_frames(encode_avi_mjpeg(frames)))
    assert got == frames and sizes  # at least exercised some parity


def test_sampling_decodes_every_nth():
    frames = _frames([5, 15, 25, 35, 45, 55])
    s = sample_mjpeg_frames(encode_avi_mjpeg(frames), every_n=3)
    assert [(f, int(px[0, 0])) for f, px in s] == [(0, 5), (3, 35)]


def test_rejections():
    with pytest.raises(ValueError):
        list(iter_avi_frames(b"RIFF\x04\x00\x00\x00WAVE"))
    # RIFF AVI but no movi list
    body = b"AVI " + b"JUNK" + struct.pack("<I", 4) + b"abcd"
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    with pytest.raises(ValueError):
        list(iter_avi_frames(data))
