"""Pure-Python VP8 key-frame (lossy WebP) decoder — closing the LAST
declared media stub.  Same charter as functions/{png,raster,jpeg,
vp8l}.py: decode for REAL what the public spec (RFC 6386) defines,
without codec libraries; raise ``ValueError`` on malformed input so
the featurizer degrades to its deterministic fake.

Scope: key frames (intra-only), which is exactly what a standalone
lossy WebP file contains (the VP8 chunk of a WebP is always a key
frame).  Implemented end-to-end per RFC 6386:

- boolean arithmetic decoder (§7);
- frame header: segmentation, loop-filter params + per-mode/ref
  deltas, 1/2/4/8 token partitions, quantizer indices + deltas,
  coefficient probability updates, skip probability (§9);
- per-MB mode parsing: segment ids, skip flags, 16x16 / B_PRED(4x4)
  luma modes with the keyframe contextual B-mode probabilities,
  chroma modes (§11);
- DCT token decoding with coefficient bands, nonzero contexts and
  category extra bits; dequantization with segment/delta quantizers
  (§13, §14.1);
- inverse WHT (Y2) and the exact integer inverse DCT (§14.3-14.5);
- all intra predictors: 16x16/chroma DC/V/H/TM incl. edge rules and
  the 127/129 border conventions, and the ten 4x4 B_PRED modes incl.
  the VP8 above-right replication quirk for right-column subblocks
  (§12);
- the in-loop deblocking filter, both SIMPLE and NORMAL profiles,
  with per-segment/per-mode filter-level adjustment, interior/edge
  limits, high-edge-variance thresholds and the exact RFC clamp
  arithmetic (§15).

Intra prediction uses UNFILTERED neighbour samples (the filter runs
as a separate sequential in-place pass afterwards, MB raster order,
left/inner-vertical/top/inner-horizontal per MB — the same order as
the reference decoder, so filtered outputs feed later edge decisions
exactly like a row-pipelined decoder).

The normative constant tables (default/update coefficient probs,
keyframe B-mode probs, dequant lookups) live in vp8_tables.py — see
tools/extract_vp8_tables.py for their provenance and validation.
Correctness is proven bit-exactly against the system libwebp's own
reconstruction (tests/test_vp8.py differential sweeps over random
encodes at many sizes/qualities/filter settings); production code has
no dependency on that library.

Not implemented (inter-frame machinery a standalone WebP never uses):
golden/altref references, motion vectors.  A non-keyframe raises
ValueError.

Reference parity note: the Rust reference decodes arbitrary images
via the image crate (src/main.rs:121, src/capi.rs:274); this module
is our analog for the lossy-WebP slice of that surface.
"""

from __future__ import annotations

import numpy as np

from .vp8_tables import (
    AC_QLOOKUP, BANDS, COEFF_PROBS, COEFF_UPDATE_PROBS, DC_QLOOKUP,
    KF_BMODE_PROBS, PCAT, ZIGZAG,
)

MAX_PIXELS = 1 << 22  # corrupt-header guard, same budget as vp8l.py

# 16x16 / chroma / ymode numbering (RFC 6386 §11.2)
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = 0, 1, 2, 3, 4
# 4x4 numbering (§11.4): B_DC, B_TM, B_VE, B_HE, B_RD, B_VR, B_LD, B_VL, B_HD, B_HU
_MODE_TO_B = {DC_PRED: 0, V_PRED: 2, H_PRED: 3, TM_PRED: 1}

#: keyframe B-mode tree (RFC 6386 §11.4); leaves negative.
_BMODE_TREE = (-0, 2, -1, 4, -2, 6, 8, 12, -3, 10,
               -4, -5, -6, 14, -7, 16, -8, -9)


class _Bool:
    """RFC 6386 §7 boolean decoder.  Reads past the partition end
    return zero bytes (the spec's permitted behaviour), so truncated
    streams decode to garbage rather than raising mid-macroblock."""

    __slots__ = ("d", "n", "pos", "range", "value", "bitcnt")

    def __init__(self, d: bytes):
        self.d = d
        self.n = len(d)
        b0 = d[0] if self.n > 0 else 0
        b1 = d[1] if self.n > 1 else 0
        self.pos = 2
        self.value = (b0 << 8) | b1
        self.range = 255
        self.bitcnt = 0

    def bit(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            ret = 1
            self.range -= split
            self.value -= big
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bitcnt += 1
            if self.bitcnt == 8:
                self.bitcnt = 0
                if self.pos < self.n:
                    self.value |= self.d[self.pos]
                self.pos += 1
        return ret

    def literal(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            v = (v << 1) | self.bit(128)
        return v

    def signed(self, nbits: int) -> int:
        v = self.literal(nbits)
        return -v if self.bit(128) else v

    def tree(self, tree, probs, start: int = 0) -> int:
        i = start
        while True:
            i = tree[i + self.bit(probs[i >> 1])]
            if i <= 0:
                return -i


def _clamp_q(q: int, hi: int = 127) -> int:
    return 0 if q < 0 else hi if q > hi else q


class _Header:
    __slots__ = (
        "width", "height", "mb_w", "mb_h",
        "seg_enabled", "seg_update_map", "seg_abs", "seg_q", "seg_lf",
        "seg_tree_probs",
        "filter_type", "filter_level", "sharpness",
        "lf_adj", "ref_lf_delta", "mode_lf_delta",
        "nparts", "quant", "skip_prob", "use_skip", "probs",
    )


def _parse_quant(bd: _Bool):
    """quant_indices() (RFC 6386 §9.6): base y_ac index + 5 deltas."""
    y_ac = bd.literal(7)
    deltas = []
    for _ in range(5):  # y_dc, y2_dc, y2_ac, uv_dc, uv_ac
        deltas.append(bd.signed(4) if bd.bit(128) else 0)
    return (y_ac, *deltas)


def _dequant_factors(hdr: _Header, segment: int):
    """Per-segment dequantization factors (RFC 6386 §14.1)."""
    y_ac, y_dc_d, y2_dc_d, y2_ac_d, uv_dc_d, uv_ac_d = hdr.quant
    q = hdr.seg_q[segment] if hdr.seg_abs else y_ac + hdr.seg_q[segment]
    q = _clamp_q(q) if hdr.seg_enabled else _clamp_q(y_ac)
    y1_dc = DC_QLOOKUP[_clamp_q(q + y_dc_d)]
    y1_ac = AC_QLOOKUP[q]
    y2_dc = DC_QLOOKUP[_clamp_q(q + y2_dc_d)] * 2
    y2_ac = AC_QLOOKUP[_clamp_q(q + y2_ac_d)] * 155 // 100
    if y2_ac < 8:
        y2_ac = 8
    uv_dc = DC_QLOOKUP[_clamp_q(q + uv_dc_d, 117)]
    uv_ac = AC_QLOOKUP[_clamp_q(q + uv_ac_d)]
    return (y1_dc, y1_ac, y2_dc, y2_ac, uv_dc, uv_ac)


def _parse_header(data: bytes):
    """Uncompressed frame tag + compressed keyframe header.  Returns
    (header, partition-1 bool decoder, token partition decoders)."""
    if len(data) < 10:
        raise ValueError("VP8 frame too short")
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    frame_type = tag & 1
    part0_size = tag >> 5
    if frame_type != 0:
        raise ValueError("VP8 inter frame: only key frames occur in WebP")
    if data[3:6] != b"\x9d\x01\x2a":
        raise ValueError("bad VP8 keyframe start code")
    w16 = data[6] | (data[7] << 8)
    h16 = data[8] | (data[9] << 8)
    width, height = w16 & 0x3FFF, h16 & 0x3FFF
    if width == 0 or height == 0 or width * height > MAX_PIXELS:
        raise ValueError(f"VP8 frame dims {width}x{height} out of range")
    if 10 + part0_size > len(data):
        raise ValueError("VP8 first partition overruns the frame")
    # Anti-DoS plausibility bound (same spirit as MAX_PIXELS): every
    # keyframe MB costs >= ~2 bits of partition-1 mode data — the
    # ymode/uvmode trees use FIXED mid-range probabilities (145/156/
    # 163/128 and 142/114/183), so even an all-skip stream cannot
    # encode more than ~4 MBs per partition byte; 12x (plus flush
    # slack) is a 3x margin.  Without this, a corrupt 60-byte header
    # claiming 2048x2048 makes a worker burn ~25 s of pure-Python
    # decode on zero-filled bits (measured) — at crawl scale that is
    # a stall, not a corner case.
    mb_count = ((width + 15) >> 4) * ((height + 15) >> 4)
    if mb_count > 12 * (part0_size + 16):
        raise ValueError(
            f"VP8 dims {width}x{height} implausible for a "
            f"{part0_size}-byte first partition")
    bd = _Bool(data[10:10 + part0_size])

    hdr = _Header()
    hdr.width, hdr.height = width, height
    hdr.mb_w, hdr.mb_h = (width + 15) >> 4, (height + 15) >> 4

    bd.bit(128)  # color_space (must be 0; tolerated)
    bd.bit(128)  # clamping_type

    hdr.seg_enabled = bd.bit(128)
    hdr.seg_update_map = 0
    hdr.seg_abs = 0
    hdr.seg_q = [0, 0, 0, 0]
    hdr.seg_lf = [0, 0, 0, 0]
    hdr.seg_tree_probs = [255, 255, 255]
    if hdr.seg_enabled:
        hdr.seg_update_map = bd.bit(128)
        update_data = bd.bit(128)
        if update_data:
            hdr.seg_abs = bd.bit(128)
            for i in range(4):
                if bd.bit(128):
                    hdr.seg_q[i] = bd.signed(7)
            for i in range(4):
                if bd.bit(128):
                    hdr.seg_lf[i] = bd.signed(6)
        if hdr.seg_update_map:
            for i in range(3):
                if bd.bit(128):
                    hdr.seg_tree_probs[i] = bd.literal(8)

    hdr.filter_type = bd.bit(128)  # 1 = simple, 0 = normal
    hdr.filter_level = bd.literal(6)
    hdr.sharpness = bd.literal(3)
    hdr.lf_adj = bd.bit(128)
    hdr.ref_lf_delta = [0, 0, 0, 0]
    hdr.mode_lf_delta = [0, 0, 0, 0]
    if hdr.lf_adj and bd.bit(128):  # mode_ref_lf_delta_update
        for i in range(4):
            if bd.bit(128):
                hdr.ref_lf_delta[i] = bd.signed(6)
        for i in range(4):
            if bd.bit(128):
                hdr.mode_lf_delta[i] = bd.signed(6)

    hdr.nparts = 1 << bd.literal(2)
    hdr.quant = _parse_quant(bd)
    bd.bit(128)  # refresh_entropy_probs (state across frames; N/A here)

    probs = [[[list(COEFF_PROBS[t][b][c]) for c in range(3)]
              for b in range(8)] for t in range(4)]
    for t in range(4):
        for b in range(8):
            for c in range(3):
                upd = COEFF_UPDATE_PROBS[t][b][c]
                row = probs[t][b][c]
                for p in range(11):
                    if bd.bit(upd[p]):
                        row[p] = bd.literal(8)
    hdr.probs = probs

    hdr.use_skip = bd.bit(128)
    hdr.skip_prob = bd.literal(8) if hdr.use_skip else 0

    # token partitions: (nparts-1) 3-byte sizes, then the data
    off = 10 + part0_size
    sizes = []
    if hdr.nparts > 1:
        need = 3 * (hdr.nparts - 1)
        if off + need > len(data):
            raise ValueError("VP8 partition size table truncated")
        for i in range(hdr.nparts - 1):
            sizes.append(data[off] | (data[off + 1] << 8) | (data[off + 2] << 16))
            off += 3
    parts = []
    for i in range(hdr.nparts):
        if i < hdr.nparts - 1:
            end = off + sizes[i]
            if end > len(data):
                raise ValueError("VP8 token partition overruns the frame")
        else:
            end = len(data)
        parts.append(_Bool(data[off:end]))
        off = end
    return hdr, bd, parts


def _read_modes(hdr: _Header, bd: _Bool):
    """Per-MB keyframe mode records from partition 1 (RFC 6386 §11).
    Returns per-MB (segment, skip, ymode, uvmode, bmodes[16])."""
    mb_w, mb_h = hdr.mb_w, hdr.mb_h
    above = [0] * (4 * mb_w)  # B-mode contexts (B_DC at frame edge)
    mbs = []
    for my in range(mb_h):
        left = [0, 0, 0, 0]
        for mx in range(mb_w):
            seg = 0
            if hdr.seg_update_map:
                p = hdr.seg_tree_probs
                seg = (2 + bd.bit(p[2])) if bd.bit(p[0]) else bd.bit(p[1])
            skip = bd.bit(hdr.skip_prob) if hdr.use_skip else 0
            # kf ymode tree {-B_PRED,2,4,6,-DC,-V,-H,-TM} p={145,156,163,128}
            if not bd.bit(145):
                ymode = B_PRED
            elif not bd.bit(156):
                ymode = DC_PRED if not bd.bit(163) else V_PRED
            else:
                ymode = H_PRED if not bd.bit(128) else TM_PRED
            bmodes = [0] * 16
            if ymode == B_PRED:
                for i in range(16):
                    bx, by = i & 3, i >> 2
                    a = above[4 * mx + bx] if by == 0 else bmodes[i - 4]
                    l = left[by] if bx == 0 else bmodes[i - 1]
                    m = bd.tree(_BMODE_TREE, KF_BMODE_PROBS[a][l])
                    bmodes[i] = m
            else:
                bmodes = [_MODE_TO_B[ymode]] * 16
            for bx in range(4):
                above[4 * mx + bx] = bmodes[12 + bx]
            for by in range(4):
                left[by] = bmodes[4 * by + 3]
            # uv tree {-DC,2,-V,4,-H,-TM} p={142,114,183}
            if not bd.bit(142):
                uvmode = DC_PRED
            elif not bd.bit(114):
                uvmode = V_PRED
            else:
                uvmode = H_PRED if not bd.bit(183) else TM_PRED
            mbs.append((seg, skip, ymode, uvmode, bmodes))
    return mbs


def _get_coeffs(bd: _Bool, probs_t, ctx: int, dq_dc: int, dq_ac: int,
                first: int, out):
    """Decode one block's DCT tokens (RFC 6386 §13.2-13.3) into
    ``out`` (16 dequantized coefficients, raster order).  Returns the
    end position n (the reference decoder's nonzero criterion is
    ``n > first``)."""
    n = first
    p = probs_t[BANDS[n]][ctx]
    while n < 16:
        if not bd.bit(p[0]):  # EOB
            return n
        while not bd.bit(p[1]):  # zero coefficient (EOB illegal after)
            n += 1
            if n == 16:
                return 16
            p = probs_t[BANDS[n]][0]
        if not bd.bit(p[2]):
            v = 1
            nctx = 2
        else:
            if not bd.bit(p[3]):
                if not bd.bit(p[4]):
                    v = 2
                else:
                    v = 3 + bd.bit(p[5])
            else:
                if not bd.bit(p[6]):
                    if not bd.bit(p[7]):
                        v = 5 + bd.bit(159)
                    else:
                        v = 7 + 2 * bd.bit(165) + bd.bit(145)
                else:
                    if not bd.bit(p[8]):
                        cat, base = (PCAT[2], 11) if not bd.bit(p[9]) \
                            else (PCAT[3], 19)
                    else:
                        cat, base = (PCAT[4], 35) if not bd.bit(p[10]) \
                            else (PCAT[5], 67)
                    add = 0
                    for q in cat:
                        add = (add << 1) | bd.bit(q)
                    v = base + add
            nctx = 2
        if v == 1:
            nctx = 1
        if bd.bit(128):
            v = -v
        out[ZIGZAG[n]] = v * (dq_dc if n == 0 else dq_ac)
        n += 1
        if n == 16:
            return 16
        p = probs_t[BANDS[n]][nctx]
    return 16


def _iwht4x4(ip):
    """Inverse Walsh-Hadamard for the Y2 block (RFC 6386 §14.3)."""
    tmp = [0] * 16
    for i in range(4):
        a1 = ip[i] + ip[12 + i]
        b1 = ip[4 + i] + ip[8 + i]
        c1 = ip[4 + i] - ip[8 + i]
        d1 = ip[i] - ip[12 + i]
        tmp[i] = a1 + b1
        tmp[4 + i] = c1 + d1
        tmp[8 + i] = a1 - b1
        tmp[12 + i] = d1 - c1
    out = [0] * 16
    for i in range(4):
        r = 4 * i
        a1 = tmp[r] + tmp[r + 3]
        b1 = tmp[r + 1] + tmp[r + 2]
        c1 = tmp[r + 1] - tmp[r + 2]
        d1 = tmp[r] - tmp[r + 3]
        out[r] = (a1 + b1 + 3) >> 3
        out[r + 1] = (c1 + d1 + 3) >> 3
        out[r + 2] = (a1 - b1 + 3) >> 3
        out[r + 3] = (d1 - c1 + 3) >> 3
    return out


_C1, _C2 = 20091, 35468  # cospi8sqrt2-1, sinpi8sqrt2 in Q16 (§14.4)


def _idct4x4(ip):
    """Exact integer inverse DCT (RFC 6386 §14.4).  Python's ``>>``
    is arithmetic, matching the reference's signed shifts."""
    tmp = [0] * 16
    for i in range(4):
        a1 = ip[i] + ip[8 + i]
        b1 = ip[i] - ip[8 + i]
        t1 = (ip[4 + i] * _C2) >> 16
        t2 = ip[12 + i] + ((ip[12 + i] * _C1) >> 16)
        c1 = t1 - t2
        t1 = ip[4 + i] + ((ip[4 + i] * _C1) >> 16)
        t2 = (ip[12 + i] * _C2) >> 16
        d1 = t1 + t2
        tmp[i] = a1 + d1
        tmp[12 + i] = a1 - d1
        tmp[4 + i] = b1 + c1
        tmp[8 + i] = b1 - c1
    out = [0] * 16
    for i in range(4):
        r = 4 * i
        a1 = tmp[r] + tmp[r + 2]
        b1 = tmp[r] - tmp[r + 2]
        t1 = (tmp[r + 1] * _C2) >> 16
        t2 = tmp[r + 3] + ((tmp[r + 3] * _C1) >> 16)
        c1 = t1 - t2
        t1 = tmp[r + 1] + ((tmp[r + 1] * _C1) >> 16)
        t2 = (tmp[r + 3] * _C2) >> 16
        d1 = t1 + t2
        out[r] = (a1 + d1 + 4) >> 3
        out[r + 1] = (b1 + c1 + 4) >> 3
        out[r + 2] = (b1 - c1 + 4) >> 3
        out[r + 3] = (a1 - d1 + 4) >> 3
    return out


def _add_block(plane, y0, x0, res):
    """Add a 4x4 residual (raster list) to plane and clamp to u8."""
    blk = plane[y0:y0 + 4, x0:x0 + 4].astype(np.int32)
    blk += np.asarray(res, dtype=np.int32).reshape(4, 4)
    plane[y0:y0 + 4, x0:x0 + 4] = np.clip(blk, 0, 255).astype(np.uint8)


def _edges(plane, my16, mx16, size, mb_x, mb_y, mb_w):
    """Gather (above[size], left[size], corner) with the 127/129
    border conventions (RFC 6386 §12.2)."""
    if mb_y > 0:
        above = plane[my16 - 1, mx16:mx16 + size].astype(np.int32)
    else:
        above = np.full(size, 127, np.int32)
    if mb_x > 0:
        left = plane[my16:my16 + size, mx16 - 1].astype(np.int32)
    else:
        left = np.full(size, 129, np.int32)
    if mb_y == 0:
        corner = 127
    elif mb_x == 0:
        corner = 129
    else:
        corner = int(plane[my16 - 1, mx16 - 1])
    return above, left, corner


def _pred_full(plane, my16, mx16, size, mb_x, mb_y, mb_w, mode):
    """16x16 / chroma 8x8 intra prediction into the plane (§12.2)."""
    above, left, corner = _edges(plane, my16, mx16, size, mb_x, mb_y, mb_w)
    if mode == DC_PRED:
        if mb_y > 0 and mb_x > 0:
            shf = 5 if size == 16 else 4
            dc = (int(above.sum()) + int(left.sum()) + (1 << (shf - 1))) >> shf
        elif mb_y > 0:
            shf = 4 if size == 16 else 3
            dc = (int(above.sum()) + (1 << (shf - 1))) >> shf
        elif mb_x > 0:
            shf = 4 if size == 16 else 3
            dc = (int(left.sum()) + (1 << (shf - 1))) >> shf
        else:
            dc = 128
        plane[my16:my16 + size, mx16:mx16 + size] = dc
    elif mode == V_PRED:
        plane[my16:my16 + size, mx16:mx16 + size] = \
            above.astype(np.uint8)[None, :]
    elif mode == H_PRED:
        plane[my16:my16 + size, mx16:mx16 + size] = \
            left.astype(np.uint8)[:, None]
    else:  # TM_PRED
        pred = left[:, None] + above[None, :] - corner
        plane[my16:my16 + size, mx16:mx16 + size] = \
            np.clip(pred, 0, 255).astype(np.uint8)


def _avg2(a, b):
    return (a + b + 1) >> 1


def _avg3(a, b, c):
    return (a + 2 * b + c + 2) >> 2


def _pred4(dst, A, L, P, AR, mode):
    """The ten 4x4 B_PRED predictors (RFC 6386 §12.3) into dst
    (a 4x4 int list-of-lists).  A=above[4], L=left[4], P=corner,
    AR=above-right[4]."""
    if mode == 0:  # B_DC: always both sides (edge substitutes used)
        dc = (sum(A) + sum(L) + 4) >> 3
        for r in range(4):
            dst[r][0] = dst[r][1] = dst[r][2] = dst[r][3] = dc
    elif mode == 1:  # B_TM
        for r in range(4):
            for c in range(4):
                v = L[r] + A[c] - P
                dst[r][c] = 0 if v < 0 else 255 if v > 255 else v
    elif mode == 2:  # B_VE: 3-tap smoothed above
        t = (P, A[0], A[1], A[2], A[3], AR[0])
        row = [_avg3(t[c], t[c + 1], t[c + 2]) for c in range(4)]
        for r in range(4):
            dst[r][:] = row
    elif mode == 3:  # B_HE: 3-tap smoothed left
        vals = (_avg3(P, L[0], L[1]), _avg3(L[0], L[1], L[2]),
                _avg3(L[1], L[2], L[3]), _avg3(L[2], L[3], L[3]))
        for r in range(4):
            dst[r][0] = dst[r][1] = dst[r][2] = dst[r][3] = vals[r]
    elif mode == 4:  # B_RD (down-right)
        pp = (L[3], L[2], L[1], L[0], P, A[0], A[1], A[2], A[3])
        for r in range(4):
            for c in range(4):
                i = 4 + c - r
                dst[r][c] = _avg3(pp[i - 1], pp[i], pp[i + 1])
    elif mode == 5:  # B_VR (vertical-right)
        pp = (L[3], L[2], L[1], L[0], P, A[0], A[1], A[2], A[3])
        dst[3][0] = _avg3(pp[1], pp[2], pp[3])
        dst[2][0] = _avg3(pp[2], pp[3], pp[4])
        dst[1][0] = dst[3][1] = _avg3(pp[3], pp[4], pp[5])
        dst[0][0] = dst[2][1] = _avg2(pp[4], pp[5])
        dst[1][1] = dst[3][2] = _avg3(pp[4], pp[5], pp[6])
        dst[0][1] = dst[2][2] = _avg2(pp[5], pp[6])
        dst[1][2] = dst[3][3] = _avg3(pp[5], pp[6], pp[7])
        dst[0][2] = dst[2][3] = _avg2(pp[6], pp[7])
        dst[1][3] = _avg3(pp[6], pp[7], pp[8])
        dst[0][3] = _avg2(pp[7], pp[8])
    elif mode == 6:  # B_LD (down-left)
        X = (A[0], A[1], A[2], A[3], AR[0], AR[1], AR[2], AR[3])
        for r in range(4):
            for c in range(4):
                i = r + c
                dst[r][c] = _avg3(X[i], X[i + 1], X[min(i + 2, 7)])
    elif mode == 7:  # B_VL (vertical-left)
        X = (A[0], A[1], A[2], A[3], AR[0], AR[1], AR[2], AR[3])
        dst[0][0] = _avg2(X[0], X[1])
        dst[1][0] = _avg3(X[0], X[1], X[2])
        dst[2][0] = dst[0][1] = _avg2(X[1], X[2])
        dst[1][1] = dst[3][0] = _avg3(X[1], X[2], X[3])
        dst[2][1] = dst[0][2] = _avg2(X[2], X[3])
        dst[3][1] = dst[1][2] = _avg3(X[2], X[3], X[4])
        dst[2][2] = dst[0][3] = _avg2(X[3], X[4])
        dst[3][2] = dst[1][3] = _avg3(X[3], X[4], X[5])
        dst[2][3] = _avg3(X[4], X[5], X[6])
        dst[3][3] = _avg3(X[5], X[6], X[7])
    elif mode == 8:  # B_HD (horizontal-down)
        pp = (L[3], L[2], L[1], L[0], P, A[0], A[1], A[2], A[3])
        dst[3][0] = _avg2(pp[0], pp[1])
        dst[3][1] = _avg3(pp[0], pp[1], pp[2])
        dst[2][0] = dst[3][2] = _avg2(pp[1], pp[2])
        dst[2][1] = dst[3][3] = _avg3(pp[1], pp[2], pp[3])
        dst[1][0] = dst[2][2] = _avg2(pp[2], pp[3])
        dst[1][1] = dst[2][3] = _avg3(pp[2], pp[3], pp[4])
        dst[0][0] = dst[1][2] = _avg2(pp[3], pp[4])
        dst[0][1] = dst[1][3] = _avg3(pp[3], pp[4], pp[5])
        dst[0][2] = _avg3(pp[4], pp[5], pp[6])
        dst[0][3] = _avg3(pp[5], pp[6], pp[7])
    elif mode == 9:  # B_HU (horizontal-up)
        dst[0][0] = _avg2(L[0], L[1])
        dst[0][1] = _avg3(L[0], L[1], L[2])
        dst[0][2] = dst[1][0] = _avg2(L[1], L[2])
        dst[0][3] = dst[1][1] = _avg3(L[1], L[2], L[3])
        dst[1][2] = dst[2][0] = _avg2(L[2], L[3])
        dst[1][3] = dst[2][1] = _avg3(L[2], L[3], L[3])
        dst[2][2] = dst[2][3] = L[3]
        dst[3][0] = dst[3][1] = dst[3][2] = dst[3][3] = L[3]
    else:  # pragma: no cover - tree can't produce this
        raise ValueError(f"bad B_PRED mode {mode}")


def decode_vp8(data: bytes):
    """Decode a VP8 key frame to (y, u, v) uint8 planes, bit-exact
    with the reference decoder (incl. the in-loop filter), cropped to
    the frame dims.  ``u``/``v`` are ceil-half size (4:2:0)."""
    hdr, bd1, parts = _parse_header(data)
    mbs = _read_modes(hdr, bd1)
    mb_w, mb_h = hdr.mb_w, hdr.mb_h

    Y = np.zeros((mb_h * 16, mb_w * 16), np.uint8)
    U = np.zeros((mb_h * 8, mb_w * 8), np.uint8)
    V = np.zeros((mb_h * 8, mb_w * 8), np.uint8)

    dq_by_seg = [_dequant_factors(hdr, s) for s in range(4)]
    probs = hdr.probs

    # nonzero contexts: above per MB column, left per plane
    a_y = [[0] * 4 for _ in range(mb_w)]
    a_u = [[0] * 2 for _ in range(mb_w)]
    a_v = [[0] * 2 for _ in range(mb_w)]
    a_y2 = [0] * mb_w

    has_coeff = [False] * (mb_w * mb_h)  # inner-edge filter criterion

    zero16 = [0] * 16
    for my in range(mb_h):
        tbd = parts[my % hdr.nparts]
        l_y, l_u, l_v = [0] * 4, [0] * 4, [0] * 4
        l_y2 = 0
        for mx in range(mb_w):
            seg, skip, ymode, uvmode, bmodes = mbs[my * mb_w + mx]
            y1dc, y1ac, y2dc, y2ac, uvdc, uvac = dq_by_seg[seg]
            coeffs = None
            mb_nz = False
            if not skip:
                coeffs = []
                if ymode != B_PRED:
                    c16 = zero16[:]
                    ctx = a_y2[mx] + l_y2
                    n = _get_coeffs(tbd, probs[1], ctx, y2dc, y2ac, 0, c16)
                    nz = 1 if n > 0 else 0
                    a_y2[mx] = l_y2 = nz
                    mb_nz |= bool(nz)
                    dc16 = _iwht4x4(c16)
                    first, ptype = 1, 0
                else:
                    dc16 = None
                    first, ptype = 0, 3
                for i in range(16):
                    bx, by = i & 3, i >> 2
                    c16 = zero16[:]
                    ctx = a_y[mx][bx] + l_y[by]
                    n = _get_coeffs(tbd, probs[ptype], ctx, y1dc, y1ac,
                                    first, c16)
                    nz = 1 if n > first else 0
                    a_y[mx][bx] = l_y[by] = nz
                    mb_nz |= bool(nz)
                    if dc16 is not None:
                        c16[0] = dc16[i]
                    coeffs.append(c16)
                for plane_a, plane_l in ((a_u, l_u), (a_v, l_v)):
                    for i in range(4):
                        bx, by = i & 1, i >> 1
                        c16 = zero16[:]
                        ctx = plane_a[mx][bx] + plane_l[by]
                        n = _get_coeffs(tbd, probs[2], ctx, uvdc, uvac,
                                        0, c16)
                        nz = 1 if n > 0 else 0
                        plane_a[mx][bx] = plane_l[by] = nz
                        mb_nz |= bool(nz)
                        coeffs.append(c16)
            else:
                # skipped MB: contexts zero; Y2 ctx persists for B_PRED
                a_y[mx] = [0] * 4
                l_y = [0] * 4
                a_u[mx] = [0] * 2
                a_v[mx] = [0] * 2
                l_u = [0] * 4
                l_v = [0] * 4
                if ymode != B_PRED:
                    a_y2[mx] = l_y2 = 0
            has_coeff[my * mb_w + mx] = mb_nz

            # --- reconstruction ---
            my16, mx16 = my * 16, mx * 16
            if ymode != B_PRED:
                _pred_full(Y, my16, mx16, 16, mx, my, mb_w, ymode)
                if coeffs is not None:
                    for i in range(16):
                        _add_block(Y, my16 + 4 * (i >> 2), mx16 + 4 * (i & 3),
                                   _idct4x4(coeffs[i]))
            else:
                # above-right pixels shared by all right-column subblocks
                if my > 0:
                    if mx < mb_w - 1:
                        AR3 = Y[my16 - 1, mx16 + 16:mx16 + 20].astype(int).tolist()
                    else:
                        AR3 = [int(Y[my16 - 1, mx16 + 15])] * 4
                else:
                    AR3 = [127] * 4
                above0, left0, corner0 = _edges(Y, my16, mx16, 16, mx, my, mb_w)
                dst = [[0] * 4 for _ in range(4)]
                for i in range(16):
                    bx, by = i & 3, i >> 2
                    y0, x0 = my16 + 4 * by, mx16 + 4 * bx
                    if by == 0:
                        A = above0[4 * bx:4 * bx + 4].tolist()
                    else:
                        A = Y[y0 - 1, x0:x0 + 4].astype(int).tolist()
                    if bx == 0:
                        L = left0[4 * by:4 * by + 4].tolist()
                    else:
                        L = Y[y0:y0 + 4, x0 - 1].astype(int).tolist()
                    if bx == 0 and by == 0:
                        P = corner0
                    elif by == 0:
                        P = int(above0[4 * bx - 1])
                    elif bx == 0:
                        P = int(left0[4 * by - 1])
                    else:
                        P = int(Y[y0 - 1, x0 - 1])
                    if bx == 3:
                        AR = AR3
                    elif by == 0:
                        AR = above0[4 * bx + 4:4 * bx + 8].tolist()
                    else:
                        AR = Y[y0 - 1, x0 + 4:x0 + 8].astype(int).tolist()
                    _pred4(dst, A, L, P, AR, bmodes[i])
                    if coeffs is not None:
                        res = _idct4x4(coeffs[i])
                        for r in range(4):
                            base = 4 * r
                            row = dst[r]
                            for c in range(4):
                                v = row[c] + res[base + c]
                                row[c] = 0 if v < 0 else 255 if v > 255 else v
                    Y[y0:y0 + 4, x0:x0 + 4] = dst
            my8, mx8 = my * 8, mx * 8
            for plane, base in ((U, 16), (V, 20)):
                _pred_full(plane, my8, mx8, 8, mx, my, mb_w, uvmode)
                if coeffs is not None:
                    for i in range(4):
                        _add_block(plane, my8 + 4 * (i >> 1), mx8 + 4 * (i & 1),
                                   _idct4x4(coeffs[base + i]))

    if hdr.filter_level > 0:
        _loop_filter(hdr, mbs, has_coeff, Y, U, V)

    ch, cw = (hdr.height + 1) >> 1, (hdr.width + 1) >> 1
    return (Y[:hdr.height, :hdr.width],
            U[:ch, :cw], V[:ch, :cw])


# ----------------------------------------------------------------- #
# In-loop deblocking filter (RFC 6386 §15)                           #
# ----------------------------------------------------------------- #

def _filter_params(hdr: _Header, seg: int, ymode: int):
    """Per-MB filter level -> (level, interior, hev_threshold)."""
    level = hdr.filter_level
    if hdr.seg_enabled:
        level = hdr.seg_lf[seg] if hdr.seg_abs else level + hdr.seg_lf[seg]
    if hdr.lf_adj:
        level += hdr.ref_lf_delta[0]          # keyframe: intra frame
        if ymode == B_PRED:
            level += hdr.mode_lf_delta[0]
    level = 0 if level < 0 else 63 if level > 63 else level
    if level == 0:
        return 0, 0, 0
    ilevel = level
    if hdr.sharpness > 0:
        ilevel >>= 2 if hdr.sharpness > 4 else 1
        if ilevel > 9 - hdr.sharpness:
            ilevel = 9 - hdr.sharpness
    if ilevel < 1:
        ilevel = 1
    hev = 2 if level >= 40 else (1 if level >= 15 else 0)
    return level, ilevel, hev


def _c128(x):
    """Clamp lanes to signed-char range (RFC's c() helper)."""
    return np.clip(x, -128, 127)


def _nfilter_segment(px, edge_limit, ilevel, hev_t, mb_edge):
    """Normal-profile filter on an (8, lanes) window p3..q3 (int32,
    biased -128).  Mutates px in place (RFC 6386 §15.2-15.3)."""
    p3, p2, p1, p0, q0, q1, q2, q3 = (px[i] for i in range(8))
    mask = ((np.abs(p0 - q0) * 2 + (np.abs(p1 - q1) >> 1)) <= edge_limit)
    for a, b in ((p3, p2), (p2, p1), (p1, p0), (q3, q2), (q2, q1), (q1, q0)):
        mask &= (np.abs(a - b) <= ilevel)
    if not mask.any():
        return
    hev = (np.abs(p1 - p0) > hev_t) | (np.abs(q1 - q0) > hev_t)

    if mb_edge:
        m = mask & ~hev
        if m.any():
            w = _c128(_c128(p1 - q1) + 3 * (q0 - p0))
            a = _c128((27 * w + 63) >> 7)
            q0[m] = _c128(q0 - a)[m]
            p0[m] = _c128(p0 + a)[m]
            a = _c128((18 * w + 63) >> 7)
            q1[m] = _c128(q1 - a)[m]
            p1[m] = _c128(p1 + a)[m]
            a = _c128((9 * w + 63) >> 7)
            q2[m] = _c128(q2 - a)[m]
            p2[m] = _c128(p2 + a)[m]
        m = mask & hev
        if m.any():
            a = _c128(_c128(p1 - q1) + 3 * (q0 - p0))
            f1 = _c128(a + 4) >> 3
            f2 = _c128(a + 3) >> 3
            q0[m] = _c128(q0 - f1)[m]
            p0[m] = _c128(p0 + f2)[m]
    else:
        m = mask
        if m.any():
            use_outer = np.where(hev, _c128(p1 - q1), 0)
            a = _c128(use_outer + 3 * (q0 - p0))
            f1 = _c128(a + 4) >> 3
            f2 = _c128(a + 3) >> 3
            q0[m] = _c128(q0 - f1)[m]
            p0[m] = _c128(p0 + f2)[m]
            m2 = m & ~hev
            if m2.any():
                a2 = (f1 + 1) >> 1
                q1[m2] = _c128(q1 - a2)[m2]
                p1[m2] = _c128(p1 + a2)[m2]


def _sfilter_segment(px, limit):
    """Simple-profile filter on a (4, lanes) window p1..q1 (int32,
    biased -128).  Mutates px (RFC 6386 §15.4)."""
    p1, p0, q0, q1 = (px[i] for i in range(4))
    m = (np.abs(p0 - q0) * 2 + (np.abs(p1 - q1) >> 1)) <= limit
    if not m.any():
        return
    a = _c128(_c128(p1 - q1) + 3 * (q0 - p0))
    f1 = _c128(a + 4) >> 3
    f2 = _c128(a + 3) >> 3
    q0[m] = _c128(q0 - f1)[m]
    p0[m] = _c128(p0 + f2)[m]


def _v_window(plane, y0, x, h, taps):
    """(2*taps, h) int32 window of columns [x-taps, x+taps)."""
    return plane[y0:y0 + h, x - taps:x + taps].astype(np.int32).T - 128


def _store_v(plane, y0, x, h, taps, px):
    plane[y0:y0 + h, x - taps:x + taps] = (px.T + 128).astype(np.uint8)


def _h_window(plane, y, x0, w, taps):
    return plane[y - taps:y + taps, x0:x0 + w].astype(np.int32) - 128


def _store_h(plane, y, x0, w, taps, px):
    plane[y - taps:y + taps, x0:x0 + w] = (px + 128).astype(np.uint8)


def _loop_filter(hdr, mbs, has_coeff, Y, U, V):
    """Sequential in-place deblocking pass, MB raster order; per MB:
    left edge, inner vertical, top edge, inner horizontal — the
    reference decoder's order, so each edge sees previously filtered
    pixels exactly as a row-pipelined decoder would (§15.1)."""
    mb_w, mb_h = hdr.mb_w, hdr.mb_h
    simple = hdr.filter_type == 1
    for my in range(mb_h):
        for mx in range(mb_w):
            seg, skip, ymode, uvmode, _ = mbs[my * mb_w + mx]
            level, ilevel, hev_t = _filter_params(hdr, seg, ymode)
            if level == 0:
                continue
            inner = (ymode == B_PRED) or has_coeff[my * mb_w + mx]
            limit = 2 * level + ilevel
            y0, x0 = my * 16, mx * 16
            cy0, cx0 = my * 8, mx * 8
            if simple:
                if mx > 0:
                    px = _v_window(Y, y0, x0, 16, 2)
                    _sfilter_segment(px, limit + 4)
                    _store_v(Y, y0, x0, 16, 2, px)
                if inner:
                    for dx in (4, 8, 12):
                        px = _v_window(Y, y0, x0 + dx, 16, 2)
                        _sfilter_segment(px, limit)
                        _store_v(Y, y0, x0 + dx, 16, 2, px)
                if my > 0:
                    px = _h_window(Y, y0, x0, 16, 2)
                    _sfilter_segment(px, limit + 4)
                    _store_h(Y, y0, x0, 16, 2, px)
                if inner:
                    for dy in (4, 8, 12):
                        px = _h_window(Y, y0 + dy, x0, 16, 2)
                        _sfilter_segment(px, limit)
                        _store_h(Y, y0 + dy, x0, 16, 2, px)
                continue
            # normal profile: Y + chroma
            if mx > 0:
                px = _v_window(Y, y0, x0, 16, 4)
                _nfilter_segment(px, limit + 4, ilevel, hev_t, True)
                _store_v(Y, y0, x0, 16, 4, px)
                for pl in (U, V):
                    px = _v_window(pl, cy0, cx0, 8, 4)
                    _nfilter_segment(px, limit + 4, ilevel, hev_t, True)
                    _store_v(pl, cy0, cx0, 8, 4, px)
            if inner:
                for dx in (4, 8, 12):
                    px = _v_window(Y, y0, x0 + dx, 16, 4)
                    _nfilter_segment(px, limit, ilevel, hev_t, False)
                    _store_v(Y, y0, x0 + dx, 16, 4, px)
                px = _v_window(U, cy0, cx0 + 4, 8, 4)
                _nfilter_segment(px, limit, ilevel, hev_t, False)
                _store_v(U, cy0, cx0 + 4, 8, 4, px)
                px = _v_window(V, cy0, cx0 + 4, 8, 4)
                _nfilter_segment(px, limit, ilevel, hev_t, False)
                _store_v(V, cy0, cx0 + 4, 8, 4, px)
            if my > 0:
                px = _h_window(Y, y0, x0, 16, 4)
                _nfilter_segment(px, limit + 4, ilevel, hev_t, True)
                _store_h(Y, y0, x0, 16, 4, px)
                for pl in (U, V):
                    px = _h_window(pl, cy0, cx0, 8, 4)
                    _nfilter_segment(px, limit + 4, ilevel, hev_t, True)
                    _store_h(pl, cy0, cx0, 8, 4, px)
            if inner:
                for dy in (4, 8, 12):
                    px = _h_window(Y, y0 + dy, x0, 16, 4)
                    _nfilter_segment(px, limit, ilevel, hev_t, False)
                    _store_h(Y, y0 + dy, x0, 16, 4, px)
                px = _h_window(U, cy0 + 4, cx0, 8, 4)
                _nfilter_segment(px, limit, ilevel, hev_t, False)
                _store_h(U, cy0 + 4, cx0, 8, 4, px)
                px = _h_window(V, cy0 + 4, cx0, 8, 4)
                _nfilter_segment(px, limit, ilevel, hev_t, False)
                _store_h(V, cy0 + 4, cx0, 8, 4, px)


def yuv420_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """PINNED RGB conversion: replication (top-left anchor) chroma
    upsampling — the same non-fancy rule the JPEG path pins — and
    integer BT.601 limited-range coefficients (the VP8 YUV domain):
    R = clip((298*(Y-16) + 409*(V-128) + 128) >> 8), etc.  Documented
    as OUR convention; the reference decoder's fancy upsampler is a
    smoothing variant of the same spec-level data."""
    h, w = y.shape
    uu = np.repeat(np.repeat(u, 2, axis=0), 2, axis=1)[:h, :w].astype(np.int32)
    vv = np.repeat(np.repeat(v, 2, axis=0), 2, axis=1)[:h, :w].astype(np.int32)
    c = y.astype(np.int32) - 16
    d = uu - 128
    e = vv - 128
    r = (298 * c + 409 * e + 128) >> 8
    g = (298 * c - 100 * d - 208 * e + 128) >> 8
    b = (298 * c + 516 * d + 128) >> 8
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def decode_vp8_rgb(data: bytes) -> np.ndarray:
    """VP8 key frame -> (h, w, 3) uint8 RGB via the pinned conversion."""
    y, u, v = decode_vp8(data)
    return yuv420_to_rgb(y, u, v)
