"""Regenerate rust_paddle_ocr_ray/functions/vp8_tables.py.

The VP8 format's constant tables (default coefficient probabilities,
coefficient-update probabilities, keyframe B-mode probabilities,
dequantization lookups, scan order, coefficient bands) are public
knowledge — they are normatively specified in RFC 6386 (sections 11.4,
13.4, 13.5, 14.1).  This container has no copy of the RFC text, so the
numeric values are recovered from the system libwebp's read-only data
(the library embeds the same normative tables) and then validated two
independent ways:

1. structurally here (anchor rows quoted from the RFC, enc/dec copy
   agreement inside the binary, probability-range and monotonicity
   invariants), and
2. empirically by tests/test_vp8.py — the pure-Python decoder built on
   these tables must reproduce libwebp's own reconstruction BIT-EXACTLY
   on randomized encodes; a single wrong byte desyncs the arithmetic
   decoder within one macroblock.

The OUTPUT module is committed; production code never touches the
shared library.  Usage: python tools/extract_vp8_tables.py [libpath]
"""

from __future__ import annotations

import re
import sys

import numpy as np

LIB_DEFAULT = "/usr/lib/x86_64-linux-gnu/libwebp.so.7.1.5"
OUT = "rust_paddle_ocr_ray/functions/vp8_tables.py"

# Anchor rows quoted from RFC 6386 (verifiable against the spec):
COEFF_ANCHOR = bytes([253, 136, 254, 255, 228, 219])   # 13.5 [0][1][0][:6]
BMODE_ANCHOR = bytes([231, 120, 48, 89, 115, 113, 120, 152, 112])  # 11.4 [0][0]
CAT6 = [254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129]     # 13.2 Pcat6
DC_HEAD = bytes([4, 5, 6, 7, 8, 9, 10, 10, 11, 12, 13, 14, 15, 16, 17, 17])
ZIGZAG = [0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15]
BANDS = [0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7]


def _all(data: bytes, pat: bytes) -> list[int]:
    return [m.start() for m in re.finditer(re.escape(pat), data)]


def _require(cond: bool, msg: str) -> None:
    if not cond:
        raise SystemExit(f"extraction check failed: {msg}")


def main() -> None:
    lib = sys.argv[1] if len(sys.argv) > 1 else LIB_DEFAULT
    data = open(lib, "rb").read()

    # --- default coefficient probs [4][8][3][11] (RFC 6386 §13.5) ---
    hits = _all(data, COEFF_ANCHOR)
    _require(len(hits) >= 2, f"coeff anchor hits: {hits}")
    base = hits[0] - 33  # anchor is [0][1][0]; 3 all-128 band-0 rows precede
    coeff = data[base:base + 1056]
    _require(set(coeff[:33]) == {128}, "band-0 rows must be all-128")
    _require(data[hits[1] - 33:hits[1] - 33 + 1056] == coeff,
             "enc/dec copies of coeff probs differ")
    _require(min(coeff) >= 1, "probabilities must be in 1..255")

    # --- coefficient-update probs [4][8][3][11] (RFC 6386 §13.4) ---
    # The same module lays it out earlier in .rodata; identify it as the
    # unique 16-aligned 1056-byte window near the coeff table that is
    # overwhelmingly 255 (update flags are rare) with all bytes >= 128.
    cands = []
    for st in range(base - 8192, base, 16):
        w = data[st:st + 1056]
        if w.count(255) > 700 and min(w) >= 128:
            cands.append(st)
    _require(len(cands) == 1, f"update-prob candidates: {cands}")
    update = data[cands[0]:cands[0] + 1056]

    # --- keyframe B-mode probs [10][10][9] (RFC 6386 §11.4) ---
    bhits = _all(data, BMODE_ANCHOR)
    _require(len(bhits) >= 2, f"bmode anchor hits: {bhits}")
    bmode = data[bhits[0]:bhits[0] + 900]
    _require(data[bhits[1]:bhits[1] + 900] == bmode, "bmode copies differ")
    _require(min(bmode) >= 1, "bmode probs must be in 1..255")

    # --- dequant lookups (RFC 6386 §14.1) ---
    hits = _all(data, DC_HEAD)
    _require(len(hits) >= 2, f"dc table hits: {hits}")
    dc = list(data[hits[0]:hits[0] + 128])
    _require(all(b >= a for a, b in zip(dc, dc[1:])) and dc[-1] == 157,
             "dc table must be monotone ending 157")
    arr16 = np.frombuffer(data, dtype="<u2")
    runs = np.where((arr16[:-5] == 4) & (arr16[1:-4] == 5) & (arr16[2:-3] == 6)
                    & (arr16[3:-2] == 7) & (arr16[4:-1] == 8) & (arr16[5:] == 9))[0]
    acs = []
    for r in runs:
        t = arr16[r:r + 128].tolist()
        if all(b >= a for a, b in zip(t, t[1:])) and t[-1] == 284:
            acs.append(t)
    _require(len(acs) >= 1 and all(a == acs[0] for a in acs),
             f"ac table: {len(acs)} candidates")
    ac = acs[0]

    # --- category extra-bit probs: laid out cat6,0,cat5,0,cat4,0,cat3 ---
    hits = _all(data, bytes(CAT6))
    _require(len(hits) >= 1, "cat6 anchor missing")
    tail = data[hits[0]:hits[0] + 11 + 1 + 5 + 1 + 4 + 1 + 3]
    cat5 = list(tail[12:17])
    cat4 = list(tail[18:22])
    cat3 = list(tail[23:26])
    _require(cat3 == [173, 148, 140] and cat4[:2] == [176, 155],
             f"cat layout drift: {cat3} {cat4} {cat5}")

    def fmt(flat, dims, name, note):
        a = np.array(flat, dtype=np.int64).reshape(dims)
        lines = [f"# {note}", f"{name} = ["]
        def emit(x, ind):
            if x.ndim == 1:
                lines.append(" " * ind + "[" + ", ".join(str(int(v)) for v in x) + "],")
            else:
                lines.append(" " * ind + "[")
                for sub in x:
                    emit(sub, ind + 1)
                lines.append(" " * ind + "],")
        for sub in a:
            emit(sub, 1)
        lines.append("]")
        return "\n".join(lines).replace("],\n]", "],\n]")

    parts = [
        '"""VP8 normative constant tables (RFC 6386).',
        "",
        "GENERATED by tools/extract_vp8_tables.py -- see that tool's",
        "docstring for provenance and the two-layer validation",
        "(structural anchors quoted from the RFC + bit-exact",
        "differential decode against libwebp in tests/test_vp8.py).",
        "Regenerate only via the tool.",
        '"""',
        "",
        "# flake8: noqa",
        "",
        fmt(list(coeff), (4, 8, 3, 11), "COEFF_PROBS",
            "RFC 6386 13.5: default DCT coefficient probabilities [4][8][3][11]"),
        "",
        fmt(list(update), (4, 8, 3, 11), "COEFF_UPDATE_PROBS",
            "RFC 6386 13.4: coefficient-update flag probabilities [4][8][3][11]"),
        "",
        fmt(list(bmode), (10, 10, 9), "KF_BMODE_PROBS",
            "RFC 6386 11.4: keyframe intra B-mode probabilities [10][10][9]"),
        "",
        "# RFC 6386 14.1: dequantization lookups, index = clamped q in 0..127",
        "DC_QLOOKUP = [" + ", ".join(map(str, dc)) + "]",
        "AC_QLOOKUP = [" + ", ".join(map(str, ac)) + "]",
        "",
        "# RFC 6386 13.3: zigzag scan order and coefficient bands",
        "ZIGZAG = [" + ", ".join(map(str, ZIGZAG)) + "]",
        "BANDS = [" + ", ".join(map(str, BANDS)) + "]",
        "",
        "# RFC 6386 13.2: DCT token extra-bit (category) probabilities",
        "PCAT = [",
        "    [159],",
        "    [165, 145],",
        "    [" + ", ".join(map(str, cat3)) + "],",
        "    [" + ", ".join(map(str, cat4)) + "],",
        "    [" + ", ".join(map(str, cat5)) + "],",
        "    [" + ", ".join(map(str, CAT6)) + "],",
        "]",
        "",
    ]
    with open(OUT, "w") as f:
        f.write("\n".join(parts))
    print(f"wrote {OUT}: coeff@{base} update@{cands[0]} bmode@{bhits[0]}")


if __name__ == "__main__":
    main()
