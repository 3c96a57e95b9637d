"""Hierarchical JPEG (ITU-T T.81 Annex J), pure Python.

A hierarchical stream is SOI, tables, DHP (frame-header syntax, full
output dimensions), then a pyramid of frames: one NON-differential
first frame per component (any supported sequential mode — SOF0/1
baseline, SOF3 lossless, SOF9 arithmetic sequential, SOF11 arithmetic
lossless), then DIFFERENTIAL frames (SOF5 Huffman sequential DCT,
SOF7 Huffman lossless, SOF13 arithmetic sequential DCT, SOF15
arithmetic lossless) that code source-minus-reference corrections,
each optionally preceded by an EXP marker doubling the reference
horizontally and/or vertically with the §J.8 interpolation filter
(out[2i] = in[i], out[2i+1] = (in[i] + in[i+1] + 1) >> 1, last odd
sample replicated).

Differential-frame semantics (§F.1.1.5.1 / Annex J, shared with the
scan decoders' ``differential`` flags in jpeg.py / jpeg_arith.py):

- DCT differential: the DC prediction is ZERO for every block (the
  coded value IS the block's DC), no +128 level shift; the rounded
  un-clipped IDCT output adds onto the reference, clamped to the
  8-bit domain ([0, 255]) — the clamped result is the reference for
  any later frame.
- Lossless differential: NO sample prediction (the coded values are
  the differences themselves; the SOS predictor-selection field
  shall be 0); reconstruction is (reference + difference) mod 2^16.
  Point transforms in hierarchical lossless scans are declared out
  (Pt = 0 enforced) — the Pt-shift interaction with differential
  chaining is where the spec leaves room, so it is not guessed.

Subset (mirrors the non-hierarchical module): 8-bit precision, 1 or
3 components, lossless frames at 1x1 sampling, DCT differential
frames one interleaved scan each, no restarts in lossless scans, no
DNL.  PROGRESSIVE frames inside a hierarchical stream (first or
differential, SOF2/6/10/14) are declared out with ValueError — the
sequential/lossless pyramid is the mode's entire practical shape.
Final composition: each component's reference must have reached its
DHP natural resolution; planes clip to [0, 255] and compose through
the module-wide pinned replication upsample + BT.601 rules.

Tables (DQT/DHT/DAC/DRI) accumulate across frames per B.2/B.5.  No
independent hierarchical implementation exists to interop with
(libjpeg and libjpeg-turbo never shipped Annex J), so the committed
gate is the mirror-encoder round trip (sources/synth.py) over scan
machinery that is itself libjpeg-validated (SOF9/SOF10) or
SOF3-shared, plus closed-form q82 rows.

Reference parity note: the reference's image crate (src/main.rs:121)
does not decode hierarchical JPEG either — this path EXCEEDS
reference coverage.
"""

from __future__ import annotations

import numpy as np

from .jpeg_arith import decode_arith_lossless_scan, decode_arith_scan

#: markers of frames this module decodes (non-differential first
#: frames and their differential counterparts)
_NONDIFF_DCT = (0xC0, 0xC1, 0xC9)
_NONDIFF_LL = (0xC3, 0xCB)
_DIFF_DCT = (0xC5, 0xCD)
_DIFF_LL = (0xC7, 0xCF)
_PROGRESSIVE = (0xC2, 0xC6, 0xCA, 0xCE)


def _exp_double(p: np.ndarray, eh: int, ev: int) -> np.ndarray:
    """§J.8 reference expansion: double horizontally (eh) and/or
    vertically (ev) — even output samples copy the input, odd ones
    interpolate (a + b + 1) >> 1, the final odd sample replicates."""
    out = p.astype(np.int32)
    if eh:
        h, w = out.shape
        e = np.zeros((h, 2 * w), dtype=np.int32)
        e[:, 0::2] = out
        if w > 1:
            e[:, 1:-1:2] = (out[:, :-1] + out[:, 1:] + 1) >> 1
        e[:, -1] = out[:, -1]
        out = e
    if ev:
        h, w = out.shape
        e = np.zeros((2 * h, w), dtype=np.int32)
        e[0::2] = out
        if h > 1:
            e[1:-1:2] = (out[:-1] + out[1:] + 1) >> 1
        e[-1] = out[-1]
        out = e
    return out


def _skip_entropy(data: bytes, pos: int) -> int:
    """Advance past an entropy-coded segment (stuffed FF00 pairs and
    RSTn markers are data; fill FFs skip) to the next true marker."""
    n = len(data)
    while pos + 1 < n:
        if data[pos] == 0xFF:
            m = data[pos + 1]
            if m == 0x00:
                pos += 2
                continue
            if m == 0xFF:
                pos += 1
                continue
            if 0xD0 <= m <= 0xD7:
                pos += 2
                continue
            return pos
        pos += 1
    raise ValueError("JPEG truncated in an entropy segment")


def _parse_frame_header(body: bytes, max_pixels: int,
                        ) -> tuple[int, int, list[tuple[int, int, int, int]]]:
    """SOF/DHP payload -> (h, w, [(cid, hi, vi, tq), ...])."""
    if body[0] != 8:
        raise ValueError("only 8-bit precision supported")
    h = (body[1] << 8) | body[2]
    w = (body[3] << 8) | body[4]
    if not w or not h or w * h > max_pixels:
        raise ValueError(f"JPEG dims {w}x{h} out of range")
    ncomp = body[5]
    if ncomp not in (1, 3):
        raise ValueError(f"{ncomp}-component JPEG not supported")
    comps = []
    for ci in range(ncomp):
        cid = body[6 + 3 * ci]
        hv = body[7 + 3 * ci]
        hi, vi = hv >> 4, hv & 0x0F
        if not (1 <= hi <= 4 and 1 <= vi <= 4):
            raise ValueError(f"illegal sampling factor {hv:#04x}")
        comps.append((cid, hi, vi, body[8 + 3 * ci]))
    return h, w, comps


def _natural_dims(w: int, h: int, hi: int, vi: int, hmax: int,
                  vmax: int) -> tuple[int, int]:
    return -(-h * vi // vmax), -(-w * hi // hmax)


def decode_hierarchical(data: bytes, pos: int, qt: dict, dc_tabs: dict,
                        ac_tabs: dict, dc_cond: dict, ac_cond: dict,
                        restart_interval: int) -> np.ndarray:
    """Decode a hierarchical stream from the DHP marker (``pos``
    points at its 0xFF byte); table state collected before the DHP
    carries in and keeps accumulating.  Returns the composed
    full-resolution image ((h, w) uint8 gray or (h, w, 3) uint8
    RGB)."""
    from .jpeg import (  # deferred: jpeg.py imports us lazily too
        MAX_PIXELS,
        _decode_lossless_scan,
        _decode_scan,
        _Huff,
        _ycbcr_to_rgb,
    )

    n = len(data)
    full_w = full_h = None
    dhp_comps: list[tuple[int, int, int, int]] = []
    refs: dict[int, np.ndarray] = {}   # cid -> int32 plane
    frame = None  # dict for the current (not yet folded) frame
    ll_parts: dict[int, np.ndarray] = {}

    def fold_lossless_frame():
        nonlocal frame
        for cid, plane in ll_parts.items():
            if frame["diff"]:
                refs[cid] = (refs[cid] + plane) & 0xFFFF
            else:
                refs[cid] = plane.astype(np.int32)
        ll_parts.clear()
        frame = None

    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        seg_len = (data[pos] << 8) | data[pos + 1]
        body = data[pos + 2:pos + seg_len]
        if marker == 0xDB:  # DQT (same subset as the main walk)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables not supported")
                from .jpeg import ZIGZAG
                tab = np.zeros(64, dtype=np.int64)
                tab[ZIGZAG] = np.frombuffer(body[i + 1:i + 65],
                                            dtype=np.uint8)
                qt[tq] = tab.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1:i + 17])
                nv = sum(bits)
                vals = bytes(body[i + 17:i + 17 + nv])
                (dc_tabs if tc == 0 else ac_tabs)[th] = _Huff(bits, vals)
                i += 17 + nv
        elif marker == 0xCC:  # DAC
            i = 0
            while i + 1 < len(body):
                tc, tb = body[i] >> 4, body[i] & 0x0F
                cs = body[i + 1]
                if tc == 0:
                    dc_cond[tb] = (cs & 0x0F, cs >> 4)
                else:
                    ac_cond[tb] = cs
                i += 2
        elif marker == 0xDD:  # DRI
            restart_interval = (body[0] << 8) | body[1]
        elif marker == 0xDE:  # DHP
            if dhp_comps:
                raise ValueError("second DHP in a hierarchical stream")
            full_h, full_w, dhp_comps = _parse_frame_header(
                body, MAX_PIXELS)
        elif marker == 0xDF:  # EXP
            eh, ev = body[0] >> 4, body[0] & 0x0F
            if eh > 1 or ev > 1:
                raise ValueError("EXP expansion factor must be 0 or 1")
            if not refs:
                raise ValueError("EXP before the first frame")
            for cid in refs:
                refs[cid] = _exp_double(refs[cid], eh, ev)
        elif marker in _PROGRESSIVE:
            raise ValueError(
                "progressive frames in hierarchical JPEG not supported")
        elif marker in _NONDIFF_DCT + _NONDIFF_LL + _DIFF_DCT + _DIFF_LL:
            if not dhp_comps:
                raise ValueError("hierarchical frame before DHP")
            if ll_parts:
                raise ValueError(
                    "new frame before the previous frame's scans "
                    "covered every component")
            fh, fw, fcomps = _parse_frame_header(body, MAX_PIXELS)
            dhp_ids = {c[0] for c in dhp_comps}
            if {c[0] for c in fcomps} - dhp_ids:
                raise ValueError("frame names a component not in DHP")
            diff = marker in _DIFF_DCT + _DIFF_LL
            frame = {
                "h": fh, "w": fw, "comps": fcomps,
                "lossless": marker in _NONDIFF_LL + _DIFF_LL,
                "arith": marker in (0xC9, 0xCB, 0xCD, 0xCF),
                "diff": diff,
            }
            hmax = max(c[1] for c in fcomps)
            vmax = max(c[2] for c in fcomps)
            for cid, hi, vi, _tq in fcomps:
                if hmax % hi or vmax % vi:
                    raise ValueError("non-integer sampling ratio")
                if frame["lossless"] and (hi != 1 or vi != 1):
                    raise ValueError(
                        "subsampled lossless JPEG not supported")
                nat = _natural_dims(fw, fh, hi, vi, hmax, vmax)
                if diff:
                    if cid not in refs:
                        raise ValueError(
                            "differential frame before its reference")
                    rh, rw = refs[cid].shape
                    if (rh, rw) != nat:
                        # §J.8.1: an EXP on odd target dims overshoots
                        # by one row/column; clip the reference to the
                        # required size.  Anything beyond that is a
                        # genuinely inconsistent pyramid.
                        if (nat[0] <= rh <= nat[0] + 1
                                and nat[1] <= rw <= nat[1] + 1):
                            refs[cid] = refs[cid][:nat[0], :nat[1]]
                        else:
                            raise ValueError(
                                f"differential frame dims {nat} != "
                                f"reference {(rh, rw)} (missing EXP?)")
                elif cid in refs:
                    raise ValueError(
                        "second non-differential frame for a component")
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("hierarchical scan outside a frame")
            fw, fh, fcomps = frame["w"], frame["h"], frame["comps"]
            hmax = max(c[1] for c in fcomps)
            vmax = max(c[2] for c in fcomps)
            ns = body[0]
            if frame["lossless"]:
                if restart_interval:
                    raise ValueError(
                        "restart intervals in lossless JPEG not supported")
                scomp = []
                for ci in range(ns):
                    cid = body[1 + 2 * ci]
                    td = body[2 + 2 * ci] >> 4
                    if cid not in {c[0] for c in fcomps}:
                        raise ValueError(
                            "scan names a non-frame component")
                    if not frame["arith"] and td not in dc_tabs:
                        raise ValueError(
                            "lossless scan without its table")
                    scomp.append((cid, td))
                sel = body[1 + 2 * ns]
                pt = body[3 + 2 * ns] & 0x0F
                if pt != 0:
                    raise ValueError(
                        "point transform in hierarchical lossless "
                        "scans not supported")
                if frame["diff"]:
                    if sel != 0:
                        raise ValueError(
                            "differential lossless scan with a "
                            "predictor selection")
                elif not (1 <= sel <= 7):
                    raise ValueError(f"illegal lossless predictor {sel}")
                if frame["arith"]:
                    planes, pos = decode_arith_lossless_scan(
                        data, pos + seg_len, fw, fh,
                        [td for _c, td in scomp], sel, 0, dc_cond,
                        differential=frame["diff"])
                else:
                    planes, pos = _decode_lossless_scan(
                        data, pos + seg_len, fw, fh,
                        [dc_tabs[td] for _c, td in scomp], sel, 0,
                        differential=frame["diff"])
                for (cid, _td), p in zip(scomp, planes):
                    ll_parts[cid] = p
                if len(ll_parts) == len(fcomps):
                    fold_lossless_frame()
                continue  # pos sits at the next marker
            # DCT frame: one interleaved scan covering every component
            if ns != len(fcomps):
                raise ValueError("scan component count != frame's")
            tabs = {body[1 + 2 * ci]: (body[2 + 2 * ci] >> 4,
                                       body[2 + 2 * ci] & 0x0F)
                    for ci in range(ns)}
            if frame["arith"]:
                aplan = []
                for cid, hi, vi, tq in fcomps:
                    if cid not in tabs:
                        raise ValueError("scan missing a frame component")
                    td, ta = tabs[cid]
                    aplan.append((qt[tq], td, ta, hi, vi))
                planes = decode_arith_scan(
                    data, pos + seg_len, fw, fh, aplan, dc_cond,
                    ac_cond, restart_interval,
                    differential=frame["diff"])
            else:
                plan = []
                for cid, hi, vi, tq in fcomps:
                    if cid not in tabs:
                        raise ValueError("scan missing a frame component")
                    td, ta = tabs[cid]
                    plan.append((qt[tq], dc_tabs[td], ac_tabs[ta],
                                 hi, vi))
                planes = _decode_scan(data, pos + seg_len, fw, fh, plan,
                                      restart_interval,
                                      differential=frame["diff"])
            for (cid, _hi, _vi, _tq), p in zip(fcomps, planes):
                if frame["diff"]:
                    refs[cid] = np.clip(refs[cid] + p, 0, 255)
                else:
                    refs[cid] = p.astype(np.int32)
            frame = None
            pos = _skip_entropy(data, pos + seg_len)
            continue
        pos += seg_len
    if full_w is None:
        raise ValueError("hierarchical stream without DHP")
    if not refs:
        raise ValueError("hierarchical stream without a frame")
    hmax = max(c[1] for c in dhp_comps)
    vmax = max(c[2] for c in dhp_comps)
    out = []
    for cid, hi, vi, _tq in dhp_comps:
        nat = _natural_dims(full_w, full_h, hi, vi, hmax, vmax)
        p = refs.get(cid)
        if p is not None and p.shape != nat and (
                nat[0] <= p.shape[0] <= nat[0] + 1
                and nat[1] <= p.shape[1] <= nat[1] + 1):
            p = p[:nat[0], :nat[1]]  # §J.8.1 clip after a final EXP
        if p is None or p.shape != nat:
            raise ValueError(
                "hierarchical stream ended before a component reached "
                "its DHP resolution")
        u8 = np.clip(p, 0, 255).astype(np.uint8)
        out.append(np.repeat(np.repeat(u8, vmax // vi, axis=0),
                             hmax // hi, axis=1)[:full_h, :full_w])
    if len(out) == 1:
        return out[0]
    return _ycbcr_to_rgb(out)
