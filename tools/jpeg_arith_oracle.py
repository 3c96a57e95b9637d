"""Python wrapper around tools/jpeg_oracle.c — compile-on-demand
libjpeg differential oracle (TEST-ONLY; production stays pure
Python).  Returns None-equivalents via ``available()`` where gcc or
jpeglib.h is missing, letting tests skip cleanly there.
"""
from __future__ import annotations

import os
import shutil
import subprocess
import tempfile

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "jpeg_oracle.c")
_BIN = None


def available() -> bool:
    return (shutil.which("gcc") is not None
            and os.path.exists("/usr/include/jpeglib.h")
            and _binary() is not None)


def _binary() -> str | None:
    global _BIN
    if _BIN is not None:
        return _BIN or None
    out = os.path.join(tempfile.gettempdir(), "jpeg_oracle_bin")
    try:
        if (not os.path.exists(out)
                or os.path.getmtime(out) < os.path.getmtime(_SRC)):
            subprocess.run(["gcc", "-O2", _SRC, "-o", out, "-ljpeg"],
                           check=True, capture_output=True)
        _BIN = out
    except (subprocess.CalledProcessError, OSError):
        _BIN = ""
    return _BIN or None


def encode(px: np.ndarray, quality: int = 85, arith: bool = True,
           restart_rows: int = 0, subsamp: int = 2,
           progressive: bool = False) -> bytes:
    """Encode (h, w) gray or (h, w, 3) RGB uint8 pixels with the
    system libjpeg; arith=True emits SOF9 arithmetic coding, and
    progressive=True the jpeg_simple_progression scan script (with
    arith=True that is SOF10 — arithmetic progressive)."""
    px = np.ascontiguousarray(px, dtype=np.uint8)
    comps = 1 if px.ndim == 2 else px.shape[2]
    h, w = px.shape[:2]
    proc = subprocess.run(
        [_binary(), "encode", str(w), str(h), str(comps), str(quality),
         "1" if arith else "0", str(restart_rows), str(subsamp),
         "1" if progressive else "0"],
        input=px.tobytes(), capture_output=True, check=True)
    return proc.stdout


def coefficients(jpg: bytes) -> list[np.ndarray]:
    """Exact quantized DCT coefficients per component as
    (height_blocks, width_blocks, 64) int16 in natural (row-major 8x8)
    order — libjpeg's entropy-layer ground truth."""
    proc = subprocess.run([_binary(), "coefs"], input=jpg,
                          capture_output=True, check=True)
    out = proc.stdout
    nl1 = out.index(b"\n")
    ncomp = int(out[:nl1])
    pos = nl1 + 1
    comps = []
    for _ in range(ncomp):
        nl = out.index(b"\n", pos)
        wb, hb = (int(x) for x in out[pos:nl].split())
        pos = nl + 1
        count = wb * hb * 64
        arr = np.frombuffer(out, dtype="<i2", count=count, offset=pos)
        comps.append(arr.reshape(hb, wb, 64).copy())
        pos += count * 2
    return comps
