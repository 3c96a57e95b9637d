"""Pure-Python VP8L (lossless WebP) decoder — closing the last
declared media stub for the LOSSLESS half of WEBP.  Same charter as
functions/{png,raster,jpeg}.py: decode for REAL what the public spec
("WebP Lossless Bitstream Specification") allows without codec
libraries, raise ``ValueError`` outside the subset so the featurizer
degrades to its deterministic fake.  LOSSY WebP (VP8 chunks) decodes
for real too, via functions/vp8.py (RFC 6386 key frames, bit-exact
vs libwebp) — ``decode_webp`` below dispatches both halves.

Implemented: the full prefix-code machinery (simple 1/2-symbol codes,
code-length-coded tables with repeats 16/17/18 and the max_symbol
early-out, canonical assignment with codes on the wire MSB-first like
DEFLATE), color cache, LZ77 backward references with BOTH distance
forms — plain distances (code > 120) and the 120-entry 2D proximity
map (code <= 120 -> (dx, dy), distance max(1, dy*width + dx);
vp8l_tables.CODE_TO_DXDY, behaviorally extracted from system libwebp
and matching the published spec table) — meta prefix (entropy image)
groups, and all four transforms — predictor (14 modes), color (signed
3.5 fixed-point deltas), subtract-green, color-indexing including
sub-byte pixel bundling and the delta-coded palette.

Declared subset edges (each raises ValueError):
- Color-indexing combined with other transforms (width-change
  interactions) is rejected.
Predictor edge rules follow libwebp exactly, including top-right at
the rightmost column = the current row's first (already decoded)
pixel — the spec's unguarded ``argb[i - w + 1]`` access.
"""

from __future__ import annotations

import numpy as np

from .vp8l_tables import CODE_TO_DXDY

#: code length code order (spec section on prefix code groups)
CL_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]

MAX_PIXELS = 1 << 22  # corrupt-header guard: 4M px is plenty for tests


class _Bits:
    """LSB-first bit reader over the VP8L payload."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("VP8L bitstream ended early")
            v |= ((self.data[byte] >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return v


class _Canon:
    """Canonical prefix code: lengths -> {(len, code): symbol}, codes
    assigned in (length, symbol) order, read MSB-first off the wire
    (the DEFLATE convention VP8L shares)."""

    def __init__(self, lengths: dict[int, int]):
        nz = {s: l for s, l in lengths.items() if l > 0}
        if not nz:
            raise ValueError("empty prefix code")
        if len(nz) == 1:
            self.single = next(iter(nz))
            self.lut = None
            return
        self.single = None
        kraft = sum(2.0 ** -l for l in nz.values())
        if abs(kraft - 1.0) > 1e-9:
            raise ValueError("invalid (non-complete) prefix code")
        self.lut = {}
        code = 0
        prev_len = 0
        for sym in sorted(nz, key=lambda s: (nz[s], s)):
            l = nz[sym]
            code <<= (l - prev_len)
            self.lut[(l, code)] = sym
            code += 1
            prev_len = l

    def decode(self, bits: _Bits) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for length in range(1, 16):
            code = (code << 1) | bits.read(1)
            sym = self.lut.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid VP8L prefix code")


def _read_prefix_code(bits: _Bits, alphabet_size: int) -> _Canon:
    if bits.read(1):  # simple code
        num_symbols = bits.read(1) + 1
        first_len = 8 if bits.read(1) else 1
        s0 = bits.read(first_len)
        if num_symbols == 2:
            s1 = bits.read(8)
            return _Canon({s0: 1, s1: 1})
        return _Canon({s0: 1})
    # code-length-coded table
    num_cl = bits.read(4) + 4
    cl_lengths = {}
    for i in range(num_cl):
        cl_lengths[CL_ORDER[i]] = bits.read(3)
    cl_code = _Canon(cl_lengths)
    if bits.read(1):  # use max_symbol
        length_nbits = 2 + 2 * bits.read(3)
        max_symbol = 2 + bits.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths: dict[int, int] = {}
    sym = 0
    prev = 8
    while sym < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        cl = cl_code.decode(bits)
        if cl < 16:
            lengths[sym] = cl
            sym += 1
            if cl:
                prev = cl
        elif cl == 16:
            for _ in range(3 + bits.read(2)):
                if sym >= alphabet_size:
                    raise ValueError("VP8L code-length repeat overflow")
                lengths[sym] = prev
                sym += 1
        elif cl == 17:
            sym += 3 + bits.read(3)
        else:  # 18
            sym += 11 + bits.read(7)
    if sym > alphabet_size:
        raise ValueError("VP8L code lengths exceed the alphabet")
    return _Canon(lengths)


def _prefix_value(bits: _Bits, code: int) -> int:
    """LZ77 length/distance prefix coding: code 0..3 -> 1..4, code
    >= 4 -> ((2 + (code & 1)) << extra) + read(extra) + 1."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    return ((2 + (code & 1)) << extra) + bits.read(extra) + 1


def _decode_entropy_image(bits: _Bits, w: int, h: int,
                          allow_meta: bool) -> list[tuple[int, int, int, int]]:
    """One spatially-coded VP8L image -> list of (a, r, g, b) pixels,
    row-major.  The main image may carry a meta-prefix (entropy image
    selecting a prefix-code group per block); subimages may not."""
    if w <= 0 or h <= 0 or w * h > MAX_PIXELS:
        raise ValueError("VP8L image dims out of range")
    # stream order: color-cache info first, then the meta-prefix bit
    # (which belongs to the prefix-code section), then the code groups
    cache_bits = 0
    if bits.read(1):
        cache_bits = bits.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("VP8L color cache bits out of range")
    cache_size = (1 << cache_bits) if cache_bits else 0
    meta = None
    meta_bits = 0
    meta_w = 0
    n_groups = 1
    if allow_meta and bits.read(1):
        meta_bits = bits.read(3) + 2
        mw = -(-w // (1 << meta_bits))
        mh = -(-h // (1 << meta_bits))
        meta = _decode_entropy_image(bits, mw, mh, False)
        n_groups = max((p[1] << 8) | p[2] for p in meta) + 1
        meta_w = mw
    groups = []
    for _ in range(n_groups):
        green = _read_prefix_code(bits, 256 + 24 + cache_size)
        red = _read_prefix_code(bits, 256)
        blue = _read_prefix_code(bits, 256)
        alpha = _read_prefix_code(bits, 256)
        dist = _read_prefix_code(bits, 40)
        groups.append((green, red, blue, alpha, dist))
    cache = [(0, 0, 0, 0)] * cache_size
    out: list[tuple[int, int, int, int]] = []
    n = w * h

    def cache_insert(px):
        if cache_size:
            argb = (px[0] << 24) | (px[1] << 16) | (px[2] << 8) | px[3]
            cache[((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - cache_bits)] = px

    while len(out) < n:
        if meta is not None:
            x, y = len(out) % w, len(out) // w
            mp = meta[(y >> meta_bits) * meta_w + (x >> meta_bits)]
            g_code, r_code, b_code, a_code, d_code = groups[
                (mp[1] << 8) | mp[2]]
        else:
            g_code, r_code, b_code, a_code, d_code = groups[0]
        s = g_code.decode(bits)
        if s < 256:  # literal: green, then red, blue, alpha (spec order)
            r = r_code.decode(bits)
            bl = b_code.decode(bits)
            a = a_code.decode(bits)
            px = (a, r, s, bl)
            out.append(px)
            cache_insert(px)
        elif s < 256 + 24:  # LZ77 backward reference
            length = _prefix_value(bits, s - 256)
            dist_code = _prefix_value(bits, d_code.decode(bits))
            if dist_code <= 120:
                # 2D proximity map: code -> (dx, dy) neighborhood
                # offset, effective distance dy*width + dx (min 1)
                dx, dy = CODE_TO_DXDY[dist_code - 1]
                distance = max(1, dy * w + dx)
            else:
                distance = dist_code - 120
            if distance > len(out):
                raise ValueError("VP8L backward reference before start")
            for _ in range(length):
                px = out[-distance]
                out.append(px)
                cache_insert(px)
                if len(out) > n:
                    raise ValueError("VP8L copy past image end")
        else:  # color cache reference
            idx = s - 256 - 24
            if idx >= cache_size:
                raise ValueError("VP8L cache index out of range")
            out.append(cache[idx])
    return out


# --- transforms -------------------------------------------------------

def _avg2(a, b):
    return tuple((x + y) >> 1 for x, y in zip(a, b))


def _clamp_add_sub_full(a, b, c):
    return tuple(min(255, max(0, x + y - z)) for x, y, z in zip(a, b, c))


def _clamp_add_sub_half(ave, c):
    out = []
    for x, z in zip(ave, c):
        v = x + (x - z) // 2 if (x - z) >= 0 else x - ((z - x) // 2)
        out.append(min(255, max(0, v)))
    return tuple(out)


def _select(left, top, topleft):
    p = [l + t - tl for l, t, tl in zip(left, top, topleft)]
    p_left = sum(abs(pc - lc) for pc, lc in zip(p, left))
    p_top = sum(abs(pc - tc) for pc, tc in zip(p, top))
    return left if p_left < p_top else top


def predict_pixel(mode: int, left, top, topright, topleft):
    """The 14 VP8L spatial predictors over (a, r, g, b) tuples."""
    if mode == 0:
        return (255, 0, 0, 0)
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return topright
    if mode == 4:
        return topleft
    if mode == 5:
        return _avg2(_avg2(left, topright), top)
    if mode == 6:
        return _avg2(left, topleft)
    if mode == 7:
        return _avg2(left, top)
    if mode == 8:
        return _avg2(topleft, top)
    if mode == 9:
        return _avg2(top, topright)
    if mode == 10:
        return _avg2(_avg2(left, topleft), _avg2(top, topright))
    if mode == 11:
        return _select(left, top, topleft)
    if mode == 12:
        return _clamp_add_sub_full(left, top, topleft)
    if mode == 13:
        return _clamp_add_sub_half(_avg2(left, top), topleft)
    raise ValueError(f"VP8L predictor mode {mode} out of range")


def _inv_predictor(px, w, h, size_bits, modes, modes_w):
    """In-place inverse of the predictor transform: pixel = residual +
    predictor (mod 256 per channel).  Edge rules per libwebp: (0,0)
    predicts opaque black; row 0 uses L; column 0 uses T; top-right is
    ALWAYS ``px[i - w + 1]`` — at the rightmost column that index is
    the current row's FIRST pixel (already reconstructed), which is
    exactly libwebp's unguarded array access, so real-world files
    decode identically."""
    for i in range(w * h):
        x, y = i % w, i // w
        if x == 0 and y == 0:
            pred = (255, 0, 0, 0)
        elif y == 0:
            pred = px[i - 1]
        elif x == 0:
            pred = px[i - w]
        else:
            mode = modes[(y >> size_bits) * modes_w + (x >> size_bits)][2]
            pred = predict_pixel(mode, px[i - 1], px[i - w],
                                 px[i - w + 1], px[i - w - 1])
        px[i] = tuple((r + p) & 0xFF for r, p in zip(px[i], pred))


def _cdelta(t: int, c: int) -> int:
    """Signed 3.5 fixed-point color-transform delta:
    (int8(t) * int8(c)) >> 5 with arithmetic shift."""
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


def _inv_color_transform(px, w, h, size_bits, elems, elems_w):
    for i in range(w * h):
        x, y = i % w, i // w
        e = elems[(y >> size_bits) * elems_w + (x >> size_bits)]
        g2r, g2b, r2b = e[3], e[2], e[1]  # blue/green/red channels
        a, r, g, b = px[i]
        r = (r + _cdelta(g2r, g)) & 0xFF
        b = (b + _cdelta(g2b, g) + _cdelta(r2b, r)) & 0xFF
        px[i] = (a, r, g, b)


def decode_vp8l(data: bytes) -> np.ndarray:
    """Raw VP8L chunk payload -> (h, w, 3) uint8 RGB, or (h, w, 4)
    RGBA when the header declares alpha."""
    if not data or data[0] != 0x2F:
        raise ValueError("not a VP8L payload")
    bits = _Bits(data)
    bits.pos = 8
    w = bits.read(14) + 1
    h = bits.read(14) + 1
    has_alpha = bits.read(1)
    if bits.read(3) != 0:
        raise ValueError("unknown VP8L version")
    if w * h > MAX_PIXELS:
        raise ValueError("VP8L image too large")

    transforms = []  # (type, payload...)
    seen = set()
    cur_w = w
    while bits.read(1):
        ttype = bits.read(2)
        if ttype in seen:
            raise ValueError("repeated VP8L transform")
        seen.add(ttype)
        if ttype in (0, 1):  # predictor / color
            size_bits = bits.read(3) + 2
            sw = -(-cur_w // (1 << size_bits))
            sh = -(-h // (1 << size_bits))
            sub = _decode_entropy_image(bits, sw, sh, False)
            transforms.append((ttype, size_bits, sub, sw))
        elif ttype == 2:  # subtract green
            transforms.append((2,))
        else:  # color indexing
            tsize = bits.read(8) + 1
            pal_rows = _decode_entropy_image(bits, tsize, 1, False)
            palette = []
            prev = (0, 0, 0, 0)
            for p in pal_rows:  # delta-coded palette
                prev = tuple((a + b) & 0xFF for a, b in zip(prev, p))
                palette.append(prev)
            if tsize <= 2:
                wbits = 3
            elif tsize <= 4:
                wbits = 2
            elif tsize <= 16:
                wbits = 1
            else:
                wbits = 0
            transforms.append((3, palette, wbits, cur_w))
            cur_w = -(-cur_w // (1 << wbits))
    if any(t[0] == 3 for t in transforms) and len(transforms) > 1:
        raise ValueError(
            "VP8L color-indexing combined with other transforms "
            "unsupported")

    px = _decode_entropy_image(bits, cur_w, h, True)

    for t in reversed(transforms):
        if t[0] == 0:
            _inv_predictor(px, cur_w, h, t[1], t[2], t[3])
        elif t[0] == 1:
            _inv_color_transform(px, cur_w, h, t[1], t[2], t[3])
        elif t[0] == 2:
            px = [(a, (r + g) & 0xFF, g, (b + g) & 0xFF)
                  for (a, r, g, b) in px]
        else:
            _, palette, wbits, full_w = t
            out = []
            ppb = 1 << wbits          # packed pixels per stored pixel
            ibits = 8 >> wbits        # bits per index
            mask = (1 << ibits) - 1
            for y in range(h):
                row = px[y * cur_w:(y + 1) * cur_w]
                for x in range(full_w):
                    g = row[x >> wbits][2]
                    idx = (g >> ((x & (ppb - 1)) * ibits)) & mask
                    out.append(palette[idx] if idx < len(palette)
                               else (0, 0, 0, 0))
            px = out
            cur_w = full_w

    arr = np.array(px, dtype=np.uint8).reshape(h, w, 4)  # (a, r, g, b)
    rgba = arr[:, :, [1, 2, 3, 0]]
    return rgba if has_alpha else rgba[:, :, :3].copy()


def decode_webp(data: bytes) -> np.ndarray:
    """RIFF WebP container -> pixels.  VP8L chunks decode through the
    lossless path here; lossy VP8 key frames decode through
    functions/vp8.py (bit-exact reconstruction incl. the in-loop
    filter, then the pinned YUV->RGB rule).  Anything malformed
    raises ValueError."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP container")
    pos = 12
    while pos + 8 <= len(data):
        fourcc = data[pos:pos + 4]
        size = int.from_bytes(data[pos + 4:pos + 8], "little")
        body = data[pos + 8:pos + 8 + size]
        if fourcc == b"VP8L":
            return decode_vp8l(body)
        if fourcc == b"VP8 ":
            from .vp8 import decode_vp8_rgb
            return decode_vp8_rgb(body)
        pos += 8 + size + (size & 1)
    raise ValueError("WebP container without an image chunk")
