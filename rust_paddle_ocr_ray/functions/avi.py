"""Minimal RIFF-AVI (MJPEG) container walk — the video-modality analog
of functions/audio.py: with the baseline-JPEG decoder in
functions/jpeg.py, an MJPEG AVI's frames decode for REAL without any
codec library.

Subset: RIFF 'AVI ' files; frames are the ``..db`` / ``..dc`` chunks
inside the ``LIST movi`` block, in stream order (index chunks are
ignored — the movi order IS the frame order for the single-stream
files this parses).  Raises ``ValueError`` outside the subset.

Public-spec sources: the RIFF/AVI container layout is documented in
the multimedia programming interface specs (chunk = fourcc + u32le
size + payload, word-aligned); MJPEG frames are ordinary baseline
JPEG streams.
"""

from __future__ import annotations

import struct


def iter_avi_frames(data: bytes):
    """Yield raw frame payloads (bytes) from an AVI's movi list, in
    container order."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    yielded = False
    pos = 12
    n = len(data)
    while pos + 8 <= n:
        cid = data[pos:pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        if cid == b"LIST" and data[pos + 8:pos + 12] == b"movi":
            mpos = pos + 12
            mend = min(pos + 8 + size, n)
            while mpos + 8 <= mend:
                fcc = data[mpos:mpos + 4]
                fsz = struct.unpack_from("<I", data, mpos + 4)[0]
                if fcc[2:4] in (b"db", b"dc") and fsz:
                    yield data[mpos + 8:mpos + 8 + fsz]
                    yielded = True
                mpos += 8 + fsz + (fsz & 1)
            if not yielded:
                raise ValueError("AVI movi list without frame chunks")
        pos += 8 + size + (size & 1)
    if not yielded:
        raise ValueError("AVI without a movi list")


def sample_mjpeg_frames(data: bytes, every_n: int = 10) -> list[tuple[int, "object"]]:
    """Decode every ``every_n``-th MJPEG frame -> [(frame_no, pixels)].
    Frames the JPEG subset can't decode raise ValueError (whole-payload
    degrade, matching the featurizer contract)."""
    from .jpeg import decode_jpeg_gray

    out = []
    for i, frame in enumerate(iter_avi_frames(data)):
        if i % every_n == 0:
            out.append((i, decode_jpeg_gray(frame)))
    return out
