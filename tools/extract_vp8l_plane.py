"""Extract the VP8L LZ77 distance proximity map from system libwebp.

The WebP Lossless Bitstream Specification maps distance codes 1..120
onto a 2D pixel neighborhood: code -> (dx, dy), with the effective
distance ``max(1, dy * image_width + dx)``; codes > 120 carry the
plain distance + 120.  The 120-entry table is normative and public,
but rather than transcribe it by hand this tool derives every entry
BEHAVIORALLY from the system libwebp decoder (the same
independent-oracle pattern as tools/extract_vp8_tables.py):

For each code c in 1..120 and several image widths w, emit a VP8L
stream (via sources/synth.encode_webp_lossless ``plane_ref``) whose
first 9*w pixels are DISTINCT literals and whose remainder is one
backward reference carrying raw distance code c.  libwebp decodes the
stream; the value it copies to flat position 9*w identifies the source
index j, so dist(w) = 9*w - j.  Two widths (17, 23) solve the linear
form dist = dy*w + dx; a third width (31) cross-checks, and a
same-row clamp (dy == 0, dx <= 1) is detected by width-independence.

Usage:  python tools/extract_vp8l_plane.py [--emit]
  --emit writes rust_paddle_ocr_ray/functions/vp8l_tables.py;
  without it the table is printed for inspection.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rust_paddle_ocr_ray.sources.synth import encode_webp_lossless  # noqa: E402
from tools import webp_oracle  # noqa: E402

WIDTHS = (17, 23, 31)
H = 12  # rows; prefix = 9 rows of literals, 3 rows of reference copies


def _probe_distance(code: int, w: int) -> int:
    n = w * H
    prefix = 9 * w
    px = np.zeros((H, w, 3), dtype=np.uint8)
    flat = px.reshape(-1, 3)
    idx = np.arange(n)
    flat[:, 0] = idx & 0xFF
    flat[:, 1] = idx >> 8
    data = encode_webp_lossless(px, plane_ref=(prefix, code))
    rgb = webp_oracle.decode_rgb(data)
    v = rgb.reshape(-1, 3)[prefix]
    j = int(v[0]) | (int(v[1]) << 8)
    dist = prefix - j
    if not 1 <= dist <= prefix:
        raise RuntimeError(f"code {code} w {w}: implausible dist {dist}")
    return dist


def extract() -> list[tuple[int, int]]:
    table: list[tuple[int, int]] = []
    for code in range(1, 121):
        d = {w: _probe_distance(code, w) for w in WIDTHS}
        if d[17] == d[23] == d[31]:
            dx, dy = d[17], 0
        else:
            dy, rem = divmod(d[23] - d[17], 23 - 17)
            if rem:
                raise RuntimeError(f"code {code}: non-linear {d}")
            dx = d[17] - 17 * dy
        for w in WIDTHS:
            if max(1, dy * w + dx) != d[w]:
                raise RuntimeError(f"code {code}: ({dx},{dy}) vs {d}")
        table.append((dx, dy))
    return table


def emit(table: list[tuple[int, int]]) -> str:
    lines = [
        '"""VP8L LZ77 distance proximity map (public spec, 120 entries).',
        "",
        "Distance codes 1..120 name a 2D neighborhood offset instead of a",
        "plain distance: code c -> (dx, dy), effective distance",
        "``max(1, dy * image_width + dx)``.  Derived BEHAVIORALLY from the",
        "system libwebp decoder by tools/extract_vp8l_plane.py (probe",
        "streams at widths 17/23/31 solve the linear form per code) and",
        "matching the table published in the WebP Lossless Bitstream",
        'Specification.  Entry i = code i+1."""',
        "",
        "CODE_TO_DXDY = [",
    ]
    for i in range(0, 120, 4):
        row = ", ".join(f"({dx}, {dy})" for dx, dy in table[i:i + 4])
        lines.append(f"    {row},")
    lines.append("]")
    return "\n".join(lines) + "\n"


def main():
    if not webp_oracle.available():
        print("libwebp unavailable; cannot extract", file=sys.stderr)
        return 1
    table = extract()
    src = emit(table)
    if "--emit" in sys.argv:
        out = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "rust_paddle_ocr_ray", "functions", "vp8l_tables.py")
        with open(out, "w") as f:
            f.write(src)
        print(f"wrote {out}")
    else:
        print(src)
    return 0


if __name__ == "__main__":
    sys.exit(main())
