"""Pure-Python baseline JPEG decoder (ITU-T T.81 spec subset).

Charter as functions/png.py / functions/raster.py: decode for REAL what
public specs allow without image libraries, raise ``ValueError``
outside the subset so the featurizer degrades to its deterministic
fake.

Supported subset: baseline sequential DCT (SOF0), extended
sequential DCT (SOF1 — identical to baseline at 8-bit precision),
progressive DCT (SOF2, Huffman), lossless sequential (SOF3, Huffman
— T.81 Annex H), arithmetic-coded sequential DCT (SOF9 — the
Annex D QM-coder, functions/jpeg_arith.py), arithmetic-coded
progressive DCT (SOF10 — the Annex G scan models over the same
QM-coder) AND arithmetic-coded lossless (SOF11 — the Annex H
two-dimensional Da/Db conditioning over the same QM-coder),
8-bit precision, grayscale (1-component) and YCbCr color
(3-component) scans including SUBSAMPLED chroma (4:2:0 / 4:2:2 /
4:4:0 and any integer-ratio Hi×Vi ≤ 4×4) — interleaved MCUs per
T.81 §A.2.3, restart intervals (DRI/RSTn: byte-align +
predictor/stats reset; DCT modes only).
Hierarchical streams (DHP, Annex J — differential SOF5/7/13/15
frames with EXP reference expansion) dispatch to jpeg_hier.py.
Lossless subset: predictors 1-7, point transform Pt, 1×1 sampling
(the overwhelmingly common lossless layout), interleaved or one
scan per component, no restarts (the spec's restart-reset
interaction with line context is where implementations diverge, so
it stays out rather than guessed); 3-component output goes through
the SAME pinned BT.601 YCbCr rule as the DCT paths (module-wide
convention, documented — raw-CFA/RGB lossless consumers should read
the planes via the 1-component path per scan instead).
Progressive decode per T.81 Annex G: spectral-selection bands +
successive approximation, per-scan coefficient accumulation
(DC first/refine with floor-shift + bit-OR semantics, AC first with
EOBn runs, AC refinement with the correction-bit walk — the same
algorithm shape libjpeg uses, which is the de-facto interop
standard), one dequant+IDCT reconstruction at EOI.  Chroma
upsampling is PINNED to sample replication
(``np.repeat`` by ``hmax/Hi`` × ``vmax/Vi``, top-left anchored — the
libjpeg "plain" non-fancy rule): upsampling is where implementations
legitimately diverge, so the rule is documented and closed-form so
round-trip gates stay integer-exact.  Non-integer sampling ratios
raise ValueError (legal per spec, vanishingly rare in the wild).

The full machinery is real: marker walk, DQT/DHT parsing, canonical
Huffman decode over the 0xFF00-unstuffed bit stream, DC prediction +
EXTEND, zigzag dequantization, and a float64 separable IDCT.  A
DC-only block decodes losslessly (flat value), which is what puts this
decoder on the driver gate (catalog q82) via the closed-form twin.
"""

from __future__ import annotations

import numpy as np

from .jpeg_arith import (
    decode_arith_lossless_scan,
    decode_arith_prog_scan,
    decode_arith_scan,
)

#: corrupt-header guard, same budget as vp8/vp8l/png/raster
MAX_PIXELS = 1 << 22

#: zigzag index -> (row, col) of the 8x8 block, per T.81 Figure 5
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)


def _idct_matrix() -> np.ndarray:
    a = np.zeros((8, 8), dtype=np.float64)
    for u in range(8):
        c = (1.0 / np.sqrt(2.0)) if u == 0 else 1.0
        for x in range(8):
            a[u, x] = 0.5 * c * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return a


_IDCT_A = _idct_matrix()


def idct2(block: np.ndarray) -> np.ndarray:
    """8x8 dequantized coefficients -> spatial samples (float64,
    pre-level-shift)."""
    return _IDCT_A.T @ block @ _IDCT_A


class _Huff:
    """Canonical JPEG Huffman table: (length, code) -> symbol."""

    def __init__(self, bits: list[int], vals: bytes):
        self.lut: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lut[(length, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first entropy-coded segment reader with 0xFF00 unstuffing."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        d = self.data
        if self.pos >= len(d):
            raise ValueError("JPEG entropy data ended early")
        b = d[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(d):
                raise ValueError("JPEG entropy data ended at 0xFF")
            m = d[self.pos]
            if m == 0x00:
                self.pos += 1
            elif m == 0xD9:  # EOI reached mid-fill: pad with 1s per spec
                self.pos -= 1
                b = 0xFF
                self.acc = (self.acc << 8) | b
                self.nbits += 8
                return
            else:
                raise ValueError(f"unexpected marker 0xFF{m:02x} in scan")
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def expect_restart(self, i: int):
        """Byte-align and consume the RSTi marker (T.81 §B.2.1.2)."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        if d[self.pos:self.pos + 2] != bytes([0xFF, 0xD0 + i]):
            raise ValueError("missing JPEG restart marker")
        self.pos += 2

    def decode(self, table: _Huff) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.lut.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, t: int) -> int:
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg_gray(data: bytes) -> np.ndarray:
    """Baseline grayscale JPEG -> (height, width) uint8 samples.
    Raises ValueError for color payloads (callers that can consume
    color use :func:`decode_jpeg`)."""
    px = decode_jpeg(data)
    if px.ndim != 2:
        raise ValueError("color JPEG where grayscale was required")
    return px


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline or progressive JPEG -> (height, width) uint8
    (grayscale) or (height, width, 3) uint8 RGB (YCbCr color, 1×1
    through 2×2 / arbitrary integer-ratio Hi×Vi sampling; chroma
    upsampling by sample replication — see module doc).

    Raises ValueError outside the supported subset (see module doc)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, _Huff] = {}
    ac_tabs: dict[int, _Huff] = {}
    w = h = None
    comps: list[tuple[int, int, int, int]] = []  # (cid, h_i, v_i, quant id)
    restart_interval = 0
    progressive = False
    lossless = False
    arith = False
    dc_cond: dict[int, tuple[int, int]] = {}
    ac_cond: dict[int, int] = {}
    store: list[np.ndarray] | None = None  # per-comp zigzag coefficients
    ll_planes: dict[int, np.ndarray] = {}  # lossless: comp idx -> plane
    ll_pt = 0
    pos = 2
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        seg_len = (data[pos] << 8) | data[pos + 1]
        body = data[pos + 2:pos + seg_len]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables not supported")
                tab = np.zeros(64, dtype=np.int64)
                tab[ZIGZAG] = np.frombuffer(body[i + 1:i + 65], dtype=np.uint8)
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
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3, 0xC9, 0xCA, 0xCB):
            # SOF0 / SOF1 extended sequential / SOF2 progressive /
            # SOF3 lossless / SOF9 arithmetic sequential / SOF10
            # arithmetic progressive / SOF11 arithmetic lossless.
            # SOF1 at 8-bit precision decodes
            # IDENTICALLY to baseline (T.81 Table B.1: extended
            # sequential only adds 12-bit precision — rejected below —
            # and tables 2/3, which the DHT/scan dispatch already
            # carries), so it routes through the SOF0 path.
            progressive = marker in (0xC2, 0xCA)
            lossless = marker in (0xC3, 0xCB)
            arith = marker in (0xC9, 0xCA, 0xCB)
            if body[0] != 8:
                raise ValueError("only 8-bit precision supported")
            h = (body[1] << 8) | body[2]
            w = (body[3] << 8) | body[4]
            if not w or not h or w * h > MAX_PIXELS:
                # corrupt-header guard: a crafted DHT can make the
                # post-EOI 1-bit padding decode as a valid symbol, so
                # a tiny bomb claiming huge dims would otherwise walk
                # h*w sample/MCU iterations (or MemoryError on the
                # plane allocation, which escapes the ValueError
                # degrade contract)
                raise ValueError(
                    f"JPEG dims {w}x{h} out of range")
            ncomp = body[5]
            if ncomp not in (1, 3):
                raise ValueError(f"{ncomp}-component JPEG not supported")
            for ci in range(ncomp):
                cid = body[6 + 3 * ci]
                hv = body[7 + 3 * ci]
                hi, vi = hv >> 4, hv & 0x0F
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError(f"illegal sampling factor {hv:#04x}")
                comps.append((cid, hi, vi, body[8 + 3 * ci]))
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            for _cid, hi, vi, _tq in comps:
                if hmax % hi or vmax % vi:
                    raise ValueError(
                        "non-integer sampling ratio (replication "
                        "upsampling undefined)")
                if lossless and (hi != 1 or vi != 1):
                    raise ValueError(
                        "subsampled lossless JPEG not supported")
        elif marker in (0xC5, 0xC6, 0xC7,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"SOF{marker - 0xC0} differential frame outside a "
                "hierarchical stream")
        elif marker == 0xDE:  # DHP: hierarchical stream (Annex J)
            from .jpeg_hier import decode_hierarchical
            return decode_hierarchical(data, pos - 2, qt, dc_tabs,
                                       ac_tabs, dc_cond, ac_cond,
                                       restart_interval)
        elif marker == 0xCC:  # DAC: arithmetic conditioning (B.2.4.3)
            i = 0
            while i + 1 < len(body):
                tc, tb = body[i] >> 4, body[i] & 0x0F
                cs = body[i + 1]
                if tc == 0:
                    dc_cond[tb] = (cs & 0x0F, cs >> 4)  # (L, U)
                else:
                    ac_cond[tb] = cs  # Kx
                i += 2
        elif marker == 0xDD:  # DRI
            restart_interval = (body[0] << 8) | body[1]
        elif marker == 0xDA:  # SOS
            if lossless:
                if not comps:
                    raise ValueError("JPEG scan before SOF3")
                if restart_interval:
                    raise ValueError(
                        "restart intervals in lossless JPEG not supported")
                ns = body[0]
                scomp = []  # (frame comp idx, Td: Huffman table OR
                #             arithmetic conditioning/statistics id)
                for ci in range(ns):
                    cid = body[1 + 2 * ci]
                    td = body[2 + 2 * ci] >> 4
                    idxs = [i for i, c in enumerate(comps) if c[0] == cid]
                    if not idxs:
                        raise ValueError("scan names a non-frame component")
                    if not arith and td not in dc_tabs:
                        raise ValueError("lossless scan without its table")
                    scomp.append((idxs[0], td))
                sel = body[1 + 2 * ns]           # Ss = predictor selector
                ll_pt = body[3 + 2 * ns] & 0x0F  # Al = point transform
                if not (1 <= sel <= 7):
                    raise ValueError(f"illegal lossless predictor {sel}")
                if ll_pt > 7:
                    raise ValueError("point transform >= precision")
                if arith:  # SOF11: QM-coded Annex H model
                    planes, pos = decode_arith_lossless_scan(
                        data, pos + seg_len, w, h,
                        [td for _i, td in scomp], sel, ll_pt, dc_cond)
                else:
                    planes, pos = _decode_lossless_scan(
                        data, pos + seg_len, w, h,
                        [dc_tabs[td] for _i, td in scomp], sel, ll_pt)
                for (idx, _td), p in zip(scomp, planes):
                    ll_planes[idx] = p
                if len(ll_planes) == len(comps):
                    return _finish_lossless(
                        [ll_planes[i] for i in range(len(comps))])
                continue  # pos sits at the next 0xFF marker
            if progressive:
                if not comps:
                    raise ValueError("JPEG scan before SOF2")
                if store is None:
                    hmax = max(c[1] for c in comps)
                    vmax = max(c[2] for c in comps)
                    mcux = -(-w // (8 * hmax))
                    mcuy = -(-h // (8 * vmax))
                    store = [np.zeros((mcuy * vi, mcux * hi, 64),
                                      dtype=np.int32)
                             for (_c, hi, vi, _t) in comps]
                ns = body[0]
                scomp = []
                for ci in range(ns):
                    cid = body[1 + 2 * ci]
                    td, ta = body[2 + 2 * ci] >> 4, body[2 + 2 * ci] & 0x0F
                    idxs = [i for i, c in enumerate(comps) if c[0] == cid]
                    if not idxs:
                        raise ValueError("scan names a non-frame component")
                    scomp.append((idxs[0], td, ta))
                ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
                ah, al = body[3 + 2 * ns] >> 4, body[3 + 2 * ns] & 0x0F
                if arith:  # SOF10: same store, QM-coded scans
                    pos = decode_arith_prog_scan(
                        data, pos + seg_len, w, h, comps, store, scomp,
                        dc_cond, ac_cond, ss, se, ah, al,
                        restart_interval)
                else:
                    pos = _decode_prog_scan(data, pos + seg_len, w, h,
                                            comps, store, scomp, dc_tabs,
                                            ac_tabs, ss, se, ah, al,
                                            restart_interval)
                continue  # pos sits at the next 0xFF marker
            if body[0] != len(comps):
                raise ValueError("scan component count != frame's")
            tabs = {body[1 + 2 * ci]: (body[2 + 2 * ci] >> 4,
                                       body[2 + 2 * ci] & 0x0F)
                    for ci in range(body[0])}
            if arith:
                aplan = []
                for cid, hi, vi, tq in comps:
                    if cid not in tabs:
                        raise ValueError("scan missing a frame component")
                    td, ta = tabs[cid]
                    aplan.append((qt[tq], td, ta, hi, vi))
                planes = decode_arith_scan(
                    data, pos + seg_len, w, h, aplan, dc_cond, ac_cond,
                    restart_interval)
                up = [
                    np.repeat(np.repeat(p, vmax // vi, axis=0),
                              hmax // hi, axis=1)[:h, :w]
                    for p, (_q, _td, _ta, hi, vi) in zip(planes, aplan)
                ]
                if len(up) == 1:
                    return up[0]
                return _ycbcr_to_rgb(up)
            plan = []
            for cid, hi, vi, tq in comps:
                if cid not in tabs:
                    raise ValueError("scan missing a frame component")
                td, ta = tabs[cid]
                plan.append((qt[tq], dc_tabs[td], ac_tabs[ta], hi, vi))
            planes = _decode_scan(data, pos + seg_len, w, h, plan,
                                  restart_interval)
            # Pinned upsampling rule: sample replication to full
            # resolution (hmax/hi × vmax/vi repeats, top-left anchor),
            # then crop to the frame dims.
            up = [
                np.repeat(np.repeat(p, vmax // vi, axis=0),
                          hmax // hi, axis=1)[:h, :w]
                for p, (_q, _d, _a, hi, vi) in zip(planes, plan)
            ]
            if len(up) == 1:
                return up[0]
            return _ycbcr_to_rgb(up)
        pos += seg_len
    if progressive and store is not None:
        return _finish_progressive(w, h, comps, qt, store)
    raise ValueError("JPEG without a scan")


def _ycbcr_to_rgb(planes: list[np.ndarray]) -> np.ndarray:
    """JFIF full-range YCbCr -> RGB (ITU-R BT.601 constants)."""
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.rint(np.stack([r, g, b], axis=2)), 0,
                   255).astype(np.uint8)


def _decode_scan(data: bytes, pos: int, w: int, h: int,
                 plan: list[tuple[np.ndarray, _Huff, _Huff, int, int]],
                 restart_interval: int = 0,
                 differential: bool = False) -> list[np.ndarray]:
    """Interleaved baseline scan per T.81 §A.2.3: each MCU carries
    ``v_i × h_i`` 8×8 blocks per component (frame order, row-major
    within a component), with per-component DC predictors.  Every
    ``restart_interval`` MCUs (when non-zero) the stream byte-aligns
    at an RSTn marker and the predictors reset (T.81 §B.2.1.2).
    Returns one plane per component at its NATURAL (subsampled)
    resolution ``(ceil(h·v_i/vmax), ceil(w·h_i/hmax))`` — the caller
    upsamples (replication) and crops to the frame dims.

    ``differential`` switches to the hierarchical differential-frame
    semantics (SOF5, T.81 §F.1.1.5.1 / Annex J): the DC prediction
    is ZERO for every block (the coded value IS the block's DC), no
    +128 level shift, and the un-clipped rounded IDCT output returns
    as signed int32 planes for the caller to add onto the reference."""
    if not w or not h:
        raise ValueError("JPEG scan before SOF0")
    hmax = max(p[3] for p in plan)
    vmax = max(p[4] for p in plan)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    outs = [np.zeros((mcuy * vi * 8, mcux * hi * 8),
                     dtype=np.int32 if differential else np.uint8)
            for (_q, _d, _a, hi, vi) in plan]
    rd = _BitReader(data, pos)
    preds = [0] * len(plan)
    zz = np.zeros(64, dtype=np.int64)
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            rd.expect_restart((m // restart_interval - 1) & 7)
            preds = [0] * len(plan)
        my, mx = m // mcux, m % mcux
        for ci, (quant, dc, ac, hi, vi) in enumerate(plan):
            for bv in range(vi):
                for bh in range(hi):
                    zz[:] = 0
                    t = rd.decode(dc)
                    diff = _extend(rd.read_bits(t), t) if t else 0
                    if differential:
                        zz[0] = diff
                    else:
                        preds[ci] += diff
                        zz[0] = preds[ci]
                    k = 1
                    while k < 64:
                        rs = rd.decode(ac)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("JPEG AC run past block end")
                        zz[k] = _extend(rd.read_bits(s), s)
                        k += 1
                    coef = np.zeros(64, dtype=np.float64)
                    coef[ZIGZAG] = zz * quant.reshape(-1)[ZIGZAG]
                    px = idct2(coef.reshape(8, 8))
                    r0 = (my * vi + bv) * 8
                    c0 = (mx * hi + bh) * 8
                    if differential:
                        outs[ci][r0:r0 + 8, c0:c0 + 8] = np.rint(px)
                    else:
                        outs[ci][r0:r0 + 8, c0:c0 + 8] = np.clip(
                            np.rint(px + 128.0), 0, 255)
    return [
        o[: -(-h * vi // vmax), : -(-w * hi // hmax)]
        for o, (_q, _d, _a, hi, vi) in zip(outs, plan)
    ]


def _ll_predict(p: np.ndarray, y: int, x: int, sel: int,
                default: int) -> int:
    """T.81 §H.1.2.1 lossless prediction for sample (y, x) of plane
    ``p``: the scan's first sample uses ``default``
    (``1 << (P-1-Pt)``); the rest of the FIRST line uses Ra (left);
    the first sample of later lines uses Rb (above); elsewhere the
    scan-selected predictor 1-7 over Ra/Rb/Rc.  Shared by the Huffman
    (SOF3) and arithmetic (SOF11, functions/jpeg_arith.py) paths —
    and by the mirror encoders in sources/synth.py via this module."""
    if y == 0:
        return default if x == 0 else int(p[0, x - 1])
    if x == 0:
        return int(p[y - 1, 0])
    a = int(p[y, x - 1])
    b = int(p[y - 1, x])
    if sel == 1:
        return a
    if sel == 2:
        return b
    if sel == 3:
        return int(p[y - 1, x - 1])
    if sel == 4:
        return a + b - int(p[y - 1, x - 1])
    if sel == 5:
        return a + ((b - int(p[y - 1, x - 1])) >> 1)
    if sel == 6:
        return b + ((a - int(p[y - 1, x - 1])) >> 1)
    return (a + b) >> 1  # 7


def _decode_lossless_scan(data: bytes, pos: int, w: int, h: int,
                          tabs: list[_Huff], sel: int, pt: int,
                          differential: bool = False,
                          ) -> tuple[list[np.ndarray], int]:
    """One lossless scan per T.81 Annex H (1×1 sampling): each sample
    codes a Huffman category SSSS (16 means diff=32768, no extra
    bits) + EXTEND bits for the prediction difference; interleaved
    scans (Ns>1, all 1×1) carry one sample per component per MCU in
    raster order.  Prediction (§H.1.2.1): the scan's first sample
    uses the default ``1 << (P-1-Pt)``; the rest of the FIRST line
    uses Ra (left); the first sample of later lines uses Rb (above);
    elsewhere the scan-selected predictor 1-7 over Ra/Rb/Rc.
    Reconstruction is modulo 2^16.  Returns per-component int32
    planes ALREADY shifted left by the point transform, plus the
    offset of the next marker.

    ``differential`` switches to the hierarchical differential-frame
    semantics (SOF7, Annex J): NO prediction (the coded values are
    the source-minus-reference differences themselves, returned
    signed and unmasked for the caller to add modulo 2^16; the
    caller enforces Pt = 0)."""
    rd = _BitReader(data, pos)
    ncs = len(tabs)
    planes = [np.zeros((h, w), dtype=np.int32) for _ in range(ncs)]
    default = 1 << (7 - pt)
    for y in range(h):
        for x in range(w):
            for ci in range(ncs):
                t = rd.decode(tabs[ci])
                if t == 16:
                    diff = 32768
                elif t:
                    diff = _extend(rd.read_bits(t), t)
                else:
                    diff = 0
                p = planes[ci]
                if differential:
                    p[y, x] = diff
                else:
                    p[y, x] = (_ll_predict(p, y, x, sel, default)
                               + diff) & 0xFFFF
    shifted = [p << pt for p in planes]
    q = rd.pos  # skip pad bits / stuffing to the next true marker
    n = len(data)
    while q + 1 < n:
        if data[q] == 0xFF and data[q + 1] != 0x00:
            return shifted, q
        q += 1
    raise ValueError("JPEG truncated after a lossless scan")


def _finish_lossless(planes: list[np.ndarray]) -> np.ndarray:
    """Compose decoded lossless planes: clip to the 8-bit output
    domain; 3 components go through the module's pinned BT.601 rule
    (see module doc)."""
    out = [np.clip(p, 0, 255).astype(np.uint8) for p in planes]
    if len(out) == 1:
        return out[0]
    if len(out) != 3:
        raise ValueError(f"{len(out)}-component lossless JPEG")
    return _ycbcr_to_rgb(out)


def _dc_unit(rd: _BitReader, blk: np.ndarray, dc: _Huff | None,
             ah: int, al: int, pred: int) -> int:
    """One block of a progressive DC scan (T.81 G.1.2.1).  First scan
    (Ah=0): baseline diff decode, value = pred << Al (DC uses
    floor-shift + bit-OR semantics — two's complement, matching the
    encoder's arithmetic right shift).  Refinement (Ah>0): one raw bit
    ORed in at position Al."""
    if ah == 0:
        if dc is None:
            raise ValueError("DC scan without a DC Huffman table")
        t = rd.decode(dc)
        pred += _extend(rd.read_bits(t), t) if t else 0
        blk[0] = pred << al
    elif rd.read_bit():
        blk[0] |= 1 << al
    return pred


def _ac_first(rd: _BitReader, blk: np.ndarray, ac: _Huff,
              ss: int, se: int, al: int, eobrun: int) -> int:
    """One block of a first AC scan (Ah=0, T.81 G.1.2.2): baseline
    run/size pairs over the Ss..Se band, values << Al, EOBn symbols
    (s=0, r<15) start a run of (1<<r)+bits all-done blocks."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = rd.decode(ac)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += rd.read_bits(r)
            break
        k += r
        if k > se:
            raise ValueError("JPEG AC run past band end")
        blk[k] = _extend(rd.read_bits(s), s) << al
        k += 1
    return eobrun


def _ac_refine(rd: _BitReader, blk: np.ndarray, ac: _Huff,
               ss: int, se: int, al: int, eobrun: int) -> int:
    """One block of an AC refinement scan (Ah=Al+1, T.81 G.1.2.3),
    the correction-bit walk in libjpeg's shape: runs count ZERO-history
    coefficients only; every nonzero-history coefficient passed reads
    one correction bit (1 = grow magnitude by 1<<Al, guarded by the
    bit not being set yet); newly-nonzero coefficients arrive as s=1
    symbols with an explicit sign bit; an EOBn symbol switches the
    rest of this block (and the next eobrun-1 whole blocks) to
    correction-bits-only."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = rd.decode(ac)
            r, s = rs >> 4, rs & 0x0F
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += rd.read_bits(r)
                    break
                sval = 0  # ZRL: 16 zero-history slots, no placement
            elif s == 1:
                sval = p1 if rd.read_bit() else m1
            else:
                raise ValueError("AC refinement size != 1")
            while k <= se:
                if blk[k] != 0:
                    if rd.read_bit() and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] >= 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if sval and k <= se:
                blk[k] = sval
            k += 1
    if eobrun > 0:
        while k <= se:  # EOB correction phase: history coeffs only
            if blk[k] != 0:
                if rd.read_bit() and (blk[k] & p1) == 0:
                    blk[k] += p1 if blk[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _decode_prog_scan(data: bytes, pos: int, w: int, h: int,
                      comps: list[tuple[int, int, int, int]],
                      store: list[np.ndarray],
                      scomp: list[tuple[int, int, int]],
                      dc_tabs: dict[int, _Huff], ac_tabs: dict[int, _Huff],
                      ss: int, se: int, ah: int, al: int,
                      ri: int) -> int:
    """Decode one progressive scan into the per-component zigzag
    coefficient ``store`` and return the byte offset of the NEXT
    marker.  DC scans (Ss=0) may interleave all frame components over
    MCUs; AC scans are single-component, walking that component's
    non-interleaved block grid ceil(comp_dim/8) — NOT the MCU-padded
    grid (partial MCUs exist only in interleaved scans, T.81 §A.2.2).
    Restart intervals byte-align at RSTn and reset predictors and the
    EOB run; the interval counts MCUs when interleaved, blocks when
    not."""
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    rd = _BitReader(data, pos)
    if ss == 0:
        if se != 0:
            raise ValueError("progressive DC scan with Se != 0")
        if len(scomp) > 1:  # interleaved over MCUs
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            preds = [0] * len(scomp)
            for m in range(mcux * mcuy):
                if ri and m and m % ri == 0:
                    rd.expect_restart((m // ri - 1) & 7)
                    preds = [0] * len(scomp)
                my, mx = m // mcux, m % mcux
                for si, (idx, td, _ta) in enumerate(scomp):
                    _cid, hi, vi, _tq = comps[idx]
                    for bv in range(vi):
                        for bh in range(hi):
                            preds[si] = _dc_unit(
                                rd, store[idx][my * vi + bv, mx * hi + bh],
                                dc_tabs.get(td), ah, al, preds[si])
        else:
            idx, td, _ta = scomp[0]
            _cid, hi, vi, _tq = comps[idx]
            by = -(-(-(-h * vi // vmax)) // 8)
            bx = -(-(-(-w * hi // hmax)) // 8)
            pred = 0
            u = 0
            for r in range(by):
                for c in range(bx):
                    if ri and u and u % ri == 0:
                        rd.expect_restart((u // ri - 1) & 7)
                        pred = 0
                    pred = _dc_unit(rd, store[idx][r, c],
                                    dc_tabs.get(td), ah, al, pred)
                    u += 1
    else:
        if len(scomp) != 1:
            raise ValueError("progressive AC scan must be single-component")
        if se > 63 or ss > se:
            raise ValueError("illegal spectral band")
        idx, _td, ta = scomp[0]
        if ta not in ac_tabs:
            raise ValueError("AC scan without an AC Huffman table")
        _cid, hi, vi, _tq = comps[idx]
        by = -(-(-(-h * vi // vmax)) // 8)
        bx = -(-(-(-w * hi // hmax)) // 8)
        unit = _ac_refine if ah else _ac_first
        eobrun = 0
        u = 0
        for r in range(by):
            for c in range(bx):
                if ri and u and u % ri == 0:
                    rd.expect_restart((u // ri - 1) & 7)
                    eobrun = 0
                eobrun = unit(rd, store[idx][r, c], ac_tabs[ta],
                              ss, se, al, eobrun)
                u += 1
    p = rd.pos  # skip pad bits / stuffing to the next true marker
    n = len(data)
    while p + 1 < n:
        if data[p] == 0xFF and data[p + 1] != 0x00:
            return p
        p += 1
    raise ValueError("JPEG truncated after a progressive scan")


def _finish_progressive(w: int, h: int,
                        comps: list[tuple[int, int, int, int]],
                        qt: dict[int, np.ndarray],
                        store: list[np.ndarray]) -> np.ndarray:
    """Accumulated zigzag coefficients -> pixels: dequantize, one
    vectorized IDCT over every block, assemble planes at natural
    resolution, then the same pinned replication upsample + crop as
    the baseline path."""
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    planes = []
    for (cid, hi, vi, tq), coefz in zip(comps, store):
        if tq not in qt:
            raise ValueError("frame references a missing quant table")
        qvec = qt[tq].reshape(-1)[ZIGZAG]  # quant value per zigzag index
        by, bx, _ = coefz.shape
        nat = np.zeros((by, bx, 64), dtype=np.float64)
        nat[..., ZIGZAG] = coefz * qvec
        blocks = nat.reshape(by, bx, 8, 8)
        px = np.einsum("ux,rcuv,vy->rcxy", _IDCT_A, blocks, _IDCT_A) + 128.0
        plane = np.clip(np.rint(px), 0, 255).astype(np.uint8)
        plane = plane.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        planes.append(plane[: -(-h * vi // vmax), : -(-w * hi // hmax)])
    up = [
        np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)[:h, :w]
        for p, (_c, hi, vi, _t) in zip(planes, comps)
    ]
    if len(up) == 1:
        return up[0]
    return _ycbcr_to_rgb(up)
