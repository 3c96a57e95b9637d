"""Arithmetic-coded JPEG entropy layer (ITU-T T.81 Annex D QM-coder +
the Annex F.2.4 sequential and Annex G progressive statistical
models), pure Python.

SOF9 (sequential DCT, arithmetic coding) decodes for real through the
same scan geometry, dequantization and IDCT as the baseline path in
functions/jpeg.py; SOF10 (progressive DCT, arithmetic coding) decodes
through the same per-scan coefficient accumulation as the Huffman
progressive path (decode_arith_prog_scan fills the identical zigzag
store).  The probability estimation state machine is the normative
Table D.3, committed as qm_table.py (tools/extract_qm_table.py).

Register conventions (Annex D software conventions):

- Decoder: 32-bit C with the comparand in the high 16 bits
  (``Chigh = C >> 16``); INITDEC loads the first TWO entropy bytes
  into Chigh and starts ``A = 0x10000``.  Renormalization doubles A
  and C until ``A >= 0x8000``, pulling bytes in via BYTEIN.  Entropy
  bytes use JPEG byte-stuffing (B.1.1.5): ``FF 00`` is a data byte
  0xFF (extra FFs are fill); ``FF`` + anything else is the
  terminating marker, after which BYTEIN feeds zero data.
- The MPS subinterval sits at the BOTTOM of [0, A): after
  ``A -= Qe``, ``Chigh < A`` selects MPS (no C adjustment) and the
  LPS path subtracts A and sets ``A = Qe`` — with conditional
  exchange on renormalizing paths when ``A < Qe`` (the larger
  subinterval always codes the MPS).
- Encoder: exact mirror with an UNBOUNDED integer C (Python ints make
  the spec's carry/byte-stacking machinery unnecessary: carries
  propagate inside the big int, and the final interval base
  serializes MSB-first with the same byte-stuffing).  State
  transitions (NMPS on renormalizing MPS, NLPS + optional MPS switch
  on LPS) fire under identical conditions on both sides, so encoder
  and decoder adapt in lockstep.

Statistical model (F.2.4, mirrored in the encoder):

- DC: per-component context selected by the previous diff's
  classification (zero / small+- / large+- via the L,U conditioning
  bounds, default (0,1)); magnitude category via the X1.. chain at
  offset 20 of the 64-state DC area, magnitude bits on the X+14
  state.
- AC: per-index EOB and zero/nonzero decisions at ``3*(k-1)``;
  sign on the FIXED ~0.5 state (Table D.3 index 113, non-adapting);
  magnitude categories >= 4 switch to the shared chains at offsets
  189 (k <= Kx, default 5) / 217 of the 256-state AC area.

Progressive scan models (Annex G over the same coder, in libjpeg's
jdarith shape — the de-facto interop standard): DC first scans run
the sequential DC-diff model on the point-transformed values and
store ``predictor << Al``; DC refinements code one bit per block on
the FIXED ~0.5 state; AC first scans run the sequential AC model over
[Ss, Se] with values ``<< Al`` (per-block EOB decisions — no EOBn
runs); AC refinements use the G.2.3 correction model (EOB decision
only past the previous scans' end-of-block, one correction bit per
nonzero-history coefficient, fixed-state signs for newly-nonzero
ones).  Per-scan statistics areas; restart markers reset coder,
statistics and DC state.

Validated coefficient-exact against the system libjpeg in both
directions (tools/jpeg_arith_oracle.py + committed goldens for BOTH
modes): libjpeg SOF9/SOF10 streams decode to identical quantized
coefficients, and streams from the mirror encoders are decoded
identically by libjpeg.

Lossless (SOF11) runs the Annex H two-dimensional Da/Db conditioning
over the same coder and the same jpeg.py predictor layer — see the
section comment above decode_arith_lossless_scan for the pinned
context layout and why its gate is the mirror round trip (no
independent SOF11 implementation exists to interop with).

Reference parity note: the reference decodes JPEG via the Rust image
crate (src/main.rs:121, src/capi.rs:274), whose decoders do NOT
support arithmetic coding — this path EXCEEDS reference coverage.
Remaining declared-out JPEG modes: hierarchical only (SOF5-7/13-15).
"""
from __future__ import annotations

import numpy as np

from .qm_table import NLPS, NMPS, QE, SWITCH

#: index of the fixed (non-adapting, Qe ~0.5) state used for AC signs
FIXED = 113

#: default conditioning bounds (T.81 F.1.4.4.1.2 / F.1.4.4.2)
DEFAULT_DC_COND = (0, 1)  # (L, U)
DEFAULT_AC_KX = 5


class QMDecoder:
    """T.81 Annex D arithmetic decoder over one entropy-coded segment
    (SOS payload up to the next marker, or between restart markers)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.n = len(data)
        self.bp = pos           # next unread byte
        self.marker_pos = -1    # position of the terminating 0xFF
        self.c = self._next_byte() << 16
        self.c += self._next_byte() << 8
        self.c <<= 8
        self.ct = 0
        self.a = 0x10000

    def _next_byte(self) -> int:
        data, n = self.data, self.n
        if self.marker_pos >= 0 or self.bp >= n:
            if self.marker_pos < 0:
                self.marker_pos = self.n
            return 0
        b = data[self.bp]
        self.bp += 1
        if b != 0xFF:
            return b
        while self.bp < n and data[self.bp] == 0xFF:
            self.bp += 1  # fill bytes
        if self.bp < n and data[self.bp] == 0x00:
            self.bp += 1  # stuffed zero: the datum is 0xFF
            return 0xFF
        self.marker_pos = self.bp - 1
        return 0

    def decode(self, idx: bytearray, mps: bytearray, k: int) -> int:
        """One binary decision on context k of the (idx, mps) area."""
        i = idx[k]
        qe = QE[i]
        a = self.a - qe
        if (self.c >> 16) < a:
            if a & 0x8000:  # no renormalization: fast MPS path
                self.a = a
                return mps[k]
            if a < qe:  # conditional exchange
                d = mps[k] ^ 1
                if SWITCH[i]:
                    mps[k] ^= 1
                idx[k] = NLPS[i]
            else:
                d = mps[k]
                idx[k] = NMPS[i]
        else:
            self.c -= a << 16
            if a < qe:  # conditional exchange
                d = mps[k]
                idx[k] = NMPS[i]
            else:
                d = mps[k] ^ 1
                if SWITCH[i]:
                    mps[k] ^= 1
                idx[k] = NLPS[i]
            a = qe
        while True:  # RENORMD
            if self.ct == 0:
                self.c += self._next_byte() << 8
                self.ct = 8
            a <<= 1
            self.c <<= 1
            self.ct -= 1
            if a & 0x8000:
                break
        self.a = a
        return d


def _decode_v(dec: QMDecoder, idx: bytearray, mps: bytearray,
              s0: int, x1: int) -> tuple[int, int, int]:
    """Figures F.21/F.23/F.24: sign + magnitude of a nonzero value
    whose 'significant' decision already decoded 1 at context s0.
    Returns (magnitude >= 1, sign, m) with m the MSB of Sz (0 when
    the magnitude is exactly 1) for DC conditioning."""
    sign = dec.decode(idx, mps, s0 + 1)
    st = s0 + 2 + sign
    m = dec.decode(idx, mps, st)
    if m:
        st = x1
        while dec.decode(idx, mps, st):
            m <<= 1
            if m == 0x8000:
                raise ValueError("arithmetic JPEG magnitude overflow")
            st += 1
    v = m
    st += 14
    mm = m >> 1
    while mm:
        if dec.decode(idx, mps, st):
            v |= mm
        mm >>= 1
    return v + 1, sign, m


class _Stats:
    """Adaptive state areas for one scan: one 64-byte DC and one
    256-byte AC area per table id, plus the fixed sign state."""

    def __init__(self):
        self.dc_idx: dict[int, bytearray] = {}
        self.dc_mps: dict[int, bytearray] = {}
        self.ac_idx: dict[int, bytearray] = {}
        self.ac_mps: dict[int, bytearray] = {}
        self.ll_idx: dict[int, bytearray] = {}
        self.ll_mps: dict[int, bytearray] = {}
        self.fix_idx = bytearray([FIXED])
        self.fix_mps = bytearray(1)

    def dc(self, tb: int) -> tuple[bytearray, bytearray]:
        if tb not in self.dc_idx:
            self.dc_idx[tb] = bytearray(64)
            self.dc_mps[tb] = bytearray(64)
        return self.dc_idx[tb], self.dc_mps[tb]

    def ac(self, tb: int) -> tuple[bytearray, bytearray]:
        if tb not in self.ac_idx:
            self.ac_idx[tb] = bytearray(256)
            self.ac_mps[tb] = bytearray(256)
        return self.ac_idx[tb], self.ac_mps[tb]

    def ll(self, tb: int) -> tuple[bytearray, bytearray]:
        """Lossless (SOF11) statistics area per T.81 §H.1.2.2: 158
        bins — 25 four-bin (S0, SS, SP, SN) groups selected by the
        (Da, Db) classification pair, then TWO 29-bin magnitude
        areas (X1..X15, M2..M15) at offsets 100 and 129, selected by
        Db's class (zero/small -> first, large -> second)."""
        if tb not in self.ll_idx:
            self.ll_idx[tb] = bytearray(158)
            self.ll_mps[tb] = bytearray(158)
        return self.ll_idx[tb], self.ll_mps[tb]


def _decode_dc_block(dec: QMDecoder, didx: bytearray, dmps: bytearray,
                     ctx: int, last: int, dl: int,
                     du: int) -> tuple[int, int]:
    """One block's DC difference (F.2.4.1 / Figure F.19): decode the
    diff into the running predictor and classify the next context via
    the (L, U) conditioning bounds.  Returns (new_ctx, new_last) — the
    caller stores ``last << Al`` (Al = 0 in sequential scans)."""
    if dec.decode(didx, dmps, ctx) == 0:
        return 0, last
    v, sign, mag = _decode_v(dec, didx, dmps, ctx, 20)
    if mag < ((1 << dl) >> 1):
        ctx = 0
    elif mag > ((1 << du) >> 1):
        ctx = 12 + 4 * sign
    else:
        ctx = 4 + 4 * sign
    return ctx, last + (-v if sign else v)


def _decode_ac_block(dec: QMDecoder, aidx: bytearray, amps: bytearray,
                     fix_idx: bytearray, fix_mps: bytearray,
                     blk: np.ndarray, ss: int, se: int, al: int,
                     kx: int) -> None:
    """AC coefficients of one block over the zigzag band [ss, se]
    (F.2.4.2 / Figure F.20; a first progressive AC scan when al > 0):
    per-index EOB and zero/nonzero decisions at 3*(k-1), sign on the
    fixed state, magnitude chains at 189 (k <= Kx) / 217, decoded
    values stored as ``v << al``."""
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if dec.decode(aidx, amps, st):
            return  # EOB
        while dec.decode(aidx, amps, st + 1) == 0:
            st += 3
            k += 1
            if k > se:
                raise ValueError("arithmetic AC run past band end")
        sign = dec.decode(fix_idx, fix_mps, 0)
        st += 2
        mag = dec.decode(aidx, amps, st)
        if mag:
            if dec.decode(aidx, amps, st):
                mag <<= 1
                st = 189 if k <= kx else 217
                while dec.decode(aidx, amps, st):
                    mag <<= 1
                    if mag == 0x8000:
                        raise ValueError(
                            "arithmetic JPEG magnitude overflow")
                    st += 1
        v = mag
        st += 14
        mm = mag >> 1
        while mm:
            if dec.decode(aidx, amps, st):
                v |= mm
            mm >>= 1
        v += 1
        blk[k] = (-v if sign else v) << al
        k += 1


def _decode_ac_refine_block(dec: QMDecoder, aidx: bytearray,
                            amps: bytearray, fix_idx: bytearray,
                            fix_mps: bytearray, blk: np.ndarray,
                            ss: int, se: int, al: int) -> None:
    """AC successive-approximation refinement of one block (T.81
    G.2.3 correction model, in libjpeg's algorithm shape): the EOB
    decision only exists past the previous scans' end-of-block kex;
    previously-nonzero coefficients decode one correction bit at
    st+2; newly-nonzero ones arrive via st+1 with a fixed-state
    sign."""
    p1 = 1 << al
    m1 = -p1
    kex = se
    while kex >= ss and blk[kex] == 0:
        kex -= 1
    k = ss
    while k <= se:
        st = 3 * (k - 1)
        if k > kex and dec.decode(aidx, amps, st):
            return  # EOB
        while True:
            if blk[k] != 0:  # previously nonzero: correction bit
                if dec.decode(aidx, amps, st + 2):
                    blk[k] += m1 if blk[k] < 0 else p1
                break
            if dec.decode(aidx, amps, st + 1):  # newly nonzero
                blk[k] = m1 if dec.decode(fix_idx, fix_mps, 0) else p1
                break
            st += 3
            k += 1
            if k > se:
                raise ValueError("arithmetic AC refine past band end")
        k += 1


def _find_restart(data: bytes, pos: int, want: int) -> int:
    """Scan forward from pos for the next marker; it must be RSTn with
    index ``want``.  Returns the position after the marker."""
    n = len(data)
    i = pos
    while i + 1 < n:
        if data[i] == 0xFF and data[i + 1] != 0x00:
            j = i + 1
            while j < n and data[j] == 0xFF:
                j += 1
            if j < n and data[j] == 0xD0 + want:
                return j + 1
            raise ValueError(
                f"expected RST{want}, found marker {data[j]:#04x}"
                if j < n else "JPEG truncated at restart")
        i += 1
    raise ValueError("JPEG truncated at restart")


def decode_arith_scan(data: bytes, pos: int, w: int, h: int,
                      plan: list[tuple[np.ndarray, int, int, int, int]],
                      dc_cond: dict[int, tuple[int, int]],
                      ac_cond: dict[int, int],
                      restart_interval: int = 0,
                      differential: bool = False) -> list[np.ndarray]:
    """Interleaved sequential arithmetic scan (T.81 §F.2.4): same MCU
    geometry/output contract as functions.jpeg._decode_scan —
    ``plan`` rows are (quant_table, td, ta, hi, vi); returns one uint8
    plane per component at its natural subsampled resolution.

    ``differential`` selects the hierarchical differential-frame
    semantics (SOF13): the DC predictor is ZERO for every block (the
    coded value IS the block's DC — the conditioning context still
    classifies on it, mirroring the Huffman path's F.1.1.5.1 rule),
    no +128 level shift, un-clipped int32 planes out."""
    from .jpeg import ZIGZAG, idct2  # deferred: jpeg.py imports us

    hmax = max(p[3] for p in plan)
    vmax = max(p[4] for p in plan)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    outs = [np.zeros((mcuy * vi * 8, mcux * hi * 8),
                     dtype=np.int32 if differential else np.uint8)
            for (_q, _td, _ta, hi, vi) in plan]
    dec = QMDecoder(data, pos)
    stats = _Stats()
    dc_ctx = [0] * len(plan)
    last_dc = [0] * len(plan)
    zz = np.zeros(64, dtype=np.int64)
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            nxt = _find_restart(
                data,
                dec.marker_pos if dec.marker_pos >= 0 else dec.bp,
                (m // restart_interval - 1) & 7)
            dec = QMDecoder(data, nxt)
            stats = _Stats()
            dc_ctx = [0] * len(plan)
            last_dc = [0] * len(plan)
        my, mx = m // mcux, m % mcux
        for ci, (quant, td, ta, hi, vi) in enumerate(plan):
            didx, dmps = stats.dc(td)
            aidx, amps = stats.ac(ta)
            dl, du = dc_cond.get(td, DEFAULT_DC_COND)
            kx = ac_cond.get(ta, DEFAULT_AC_KX)
            for bv in range(vi):
                for bh in range(hi):
                    zz[:] = 0
                    # DC (F.2.4.1) + AC (F.2.4.2), shared with the
                    # progressive scan paths (band 1..63, Al=0)
                    if differential:
                        dc_ctx[ci], dcv = _decode_dc_block(
                            dec, didx, dmps, dc_ctx[ci], 0, dl, du)
                        zz[0] = dcv
                    else:
                        dc_ctx[ci], last_dc[ci] = _decode_dc_block(
                            dec, didx, dmps, dc_ctx[ci], last_dc[ci],
                            dl, du)
                        zz[0] = last_dc[ci]
                    _decode_ac_block(dec, aidx, amps, stats.fix_idx,
                                     stats.fix_mps, zz, 1, 63, 0, kx)
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
        for o, (_q, _td, _ta, hi, vi) in zip(outs, plan)
    ]


def _next_marker(data: bytes, pos: int) -> int:
    """Skip flush bytes / stuffed FF00 pairs to the next true marker
    (the same tail walk jpeg._decode_prog_scan uses)."""
    n = len(data)
    while pos + 1 < n:
        if data[pos] == 0xFF and data[pos + 1] != 0x00:
            return pos
        pos += 1
    raise ValueError("JPEG truncated after an arithmetic scan")


def decode_arith_prog_scan(data: bytes, pos: int, w: int, h: int,
                           comps: list[tuple[int, int, int, int]],
                           store: list[np.ndarray],
                           scomp: list[tuple[int, int, int]],
                           dc_cond: dict[int, tuple[int, int]],
                           ac_cond: dict[int, int],
                           ss: int, se: int, ah: int, al: int,
                           ri: int) -> int:
    """One PROGRESSIVE arithmetic scan (SOF10, T.81 Annex G with the
    Annex D QM-coder): decodes into the per-component zigzag
    coefficient ``store`` (the same accumulation arrays the Huffman
    progressive path fills) and returns the offset of the next
    marker.  Scan/grid semantics mirror jpeg._decode_prog_scan: DC
    scans (Ss=0) may interleave components over the padded MCU grid,
    AC scans are single-component over the non-interleaved
    ceil(dim/8) grid; restart markers reset the decoder, the
    statistics areas and the DC state.  Per-scan models (libjpeg's
    jdarith shape, the de-facto interop standard for Annex G):

    - DC first (Ah=0): the sequential DC-diff model on the
      point-transformed values; block DC = predictor << Al.
    - DC refinement (Ah>0): one decision per block on the FIXED
      ~0.5 state, OR-ing 1<<Al into the two's-complement value.
    - AC first (Ah=0): the sequential AC model over [Ss, Se] with
      values << Al (no EOBn runs — the EOB decision is per block).
    - AC refinement: the G.2.3 correction model
      (_decode_ac_refine_block)."""
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    dec = QMDecoder(data, pos)
    stats = _Stats()
    if ss == 0:
        if se != 0:
            raise ValueError("progressive DC scan with Se != 0")
        dc_ctx = [0] * len(scomp)
        last_dc = [0] * len(scomp)
        if len(scomp) > 1:  # interleaved over MCUs
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            for m in range(mcux * mcuy):
                if ri and m and m % ri == 0:
                    nxt = _find_restart(
                        data,
                        dec.marker_pos if dec.marker_pos >= 0 else dec.bp,
                        (m // ri - 1) & 7)
                    dec = QMDecoder(data, nxt)
                    stats = _Stats()
                    dc_ctx = [0] * len(scomp)
                    last_dc = [0] * len(scomp)
                my, mx = m // mcux, m % mcux
                for si, (idx, td, _ta) in enumerate(scomp):
                    _cid, hi, vi, _tq = comps[idx]
                    didx, dmps = stats.dc(td)
                    dl, du = dc_cond.get(td, DEFAULT_DC_COND)
                    for bv in range(vi):
                        for bh in range(hi):
                            blk = store[idx][my * vi + bv, mx * hi + bh]
                            if ah == 0:
                                dc_ctx[si], last_dc[si] = _decode_dc_block(
                                    dec, didx, dmps, dc_ctx[si],
                                    last_dc[si], dl, du)
                                blk[0] = last_dc[si] << al
                            elif dec.decode(stats.fix_idx,
                                            stats.fix_mps, 0):
                                blk[0] |= 1 << al
        else:
            idx, td, _ta = scomp[0]
            _cid, hi, vi, _tq = comps[idx]
            by = -(-(-(-h * vi // vmax)) // 8)
            bx = -(-(-(-w * hi // hmax)) // 8)
            didx, dmps = stats.dc(td)
            dl, du = dc_cond.get(td, DEFAULT_DC_COND)
            u = 0
            for r in range(by):
                for c in range(bx):
                    if ri and u and u % ri == 0:
                        nxt = _find_restart(
                            data,
                            dec.marker_pos if dec.marker_pos >= 0
                            else dec.bp,
                            (u // ri - 1) & 7)
                        dec = QMDecoder(data, nxt)
                        stats = _Stats()
                        didx, dmps = stats.dc(td)
                        dc_ctx = [0]
                        last_dc = [0]
                    blk = store[idx][r, c]
                    if ah == 0:
                        dc_ctx[0], last_dc[0] = _decode_dc_block(
                            dec, didx, dmps, dc_ctx[0], last_dc[0],
                            dl, du)
                        blk[0] = last_dc[0] << al
                    elif dec.decode(stats.fix_idx, stats.fix_mps, 0):
                        blk[0] |= 1 << al
                    u += 1
    else:
        if len(scomp) != 1:
            raise ValueError("progressive AC scan must be single-component")
        if se > 63 or ss > se:
            raise ValueError("illegal spectral band")
        idx, _td, ta = scomp[0]
        _cid, hi, vi, _tq = comps[idx]
        by = -(-(-(-h * vi // vmax)) // 8)
        bx = -(-(-(-w * hi // hmax)) // 8)
        aidx, amps = stats.ac(ta)
        kx = ac_cond.get(ta, DEFAULT_AC_KX)
        u = 0
        for r in range(by):
            for c in range(bx):
                if ri and u and u % ri == 0:
                    nxt = _find_restart(
                        data,
                        dec.marker_pos if dec.marker_pos >= 0 else dec.bp,
                        (u // ri - 1) & 7)
                    dec = QMDecoder(data, nxt)
                    stats = _Stats()
                    aidx, amps = stats.ac(ta)
                blk = store[idx][r, c]
                if ah == 0:
                    _decode_ac_block(dec, aidx, amps, stats.fix_idx,
                                     stats.fix_mps, blk, ss, se, al, kx)
                else:
                    _decode_ac_refine_block(dec, aidx, amps,
                                            stats.fix_idx, stats.fix_mps,
                                            blk, ss, se, al)
                u += 1
    return _next_marker(
        data, dec.marker_pos if dec.marker_pos >= 0 else dec.bp)


class QMEncoder:
    """Mirror of QMDecoder with an unbounded C: carries resolve
    inside the Python int, and serialization applies byte stuffing to
    the final interval base (see module doc)."""

    def __init__(self):
        self.a = 0x10000
        self.c = 0
        self.nshift = 0

    def encode(self, idx: bytearray, mps: bytearray, k: int,
               bit: int) -> None:
        i = idx[k]
        qe = QE[i]
        a = self.a - qe
        if bit == mps[k]:
            if a & 0x8000:  # no renormalization
                self.a = a
                return
            if a < qe:  # conditional exchange: MPS takes the top
                self.c += a
                a = qe
            idx[k] = NMPS[i]
        else:
            if a < qe:  # conditional exchange: LPS keeps the bottom
                pass
            else:
                self.c += a
                a = qe
            if SWITCH[i]:
                mps[k] ^= 1
            idx[k] = NLPS[i]
        while a < 0x8000:  # RENORME
            a <<= 1
            self.c <<= 1
            self.nshift += 1
        self.a = a

    def finish(self) -> bytes:
        """CLEARBITS + serialize: pick the value in [C, C+A) with the
        most trailing zero bits, emit all its bits MSB-first with
        JPEG byte stuffing (a zero byte after every 0xFF)."""
        t = (self.c + self.a - 1) & ~0xFFFF
        if t < self.c:
            t += 0x8000
        nbits = self.nshift + 16
        pad = (-nbits) % 8
        t <<= pad
        nbits += pad
        out = bytearray()
        for shift in range(nbits - 8, -1, -8):
            b = (t >> shift) & 0xFF
            out.append(b)
            if b == 0xFF:
                out.append(0x00)
        return bytes(out)


def encode_v(enc: QMEncoder, idx: bytearray, mps: bytearray,
             s0: int, x1: int, magnitude: int, sign: int) -> int:
    """Mirror of _decode_v for magnitude >= 1 (the 'significant'
    decision at s0 is the caller's).  Returns m (MSB of Sz) for DC
    conditioning."""
    enc.encode(idx, mps, s0 + 1, sign)
    st = s0 + 2 + sign
    sz = magnitude - 1
    if sz == 0:
        enc.encode(idx, mps, st, 0)
        return 0
    enc.encode(idx, mps, st, 1)
    m = 1
    st = x1
    while (m << 1) <= sz:
        enc.encode(idx, mps, st, 1)
        m <<= 1
        st += 1
    enc.encode(idx, mps, st, 0)
    st += 14
    mm = m >> 1
    while mm:
        enc.encode(idx, mps, st, 1 if sz & mm else 0)
        mm >>= 1
    return m


def _encode_dc_block(enc: QMEncoder, didx: bytearray, dmps: bytearray,
                     ctx: int, last: int, dl: int, du: int,
                     val: int) -> tuple[int, int]:
    """Mirror of _decode_dc_block: encode the DC difference of one
    block (``val`` already point-transformed) and return the new
    (context, predictor)."""
    diff = val - last
    if diff == 0:
        enc.encode(didx, dmps, ctx, 0)
        return 0, last
    enc.encode(didx, dmps, ctx, 1)
    sign = 1 if diff < 0 else 0
    mag = encode_v(enc, didx, dmps, ctx, 20, abs(diff), sign)
    if mag < ((1 << dl) >> 1):
        ctx = 0
    elif mag > ((1 << du) >> 1):
        ctx = 12 + 4 * sign
    else:
        ctx = 4 + 4 * sign
    return ctx, val


def _encode_ac_block(enc: QMEncoder, aidx: bytearray, amps: bytearray,
                     fix_idx: bytearray, fix_mps: bytearray,
                     blk: np.ndarray, ss: int, se: int, al: int,
                     kx: int) -> None:
    """Mirror of _decode_ac_block over the zigzag band [ss, se] with
    point transform ``al`` (values coded are ``abs >> al`` with the
    original sign — C-style round-toward-zero)."""
    ke = se
    while ke >= ss and (abs(int(blk[ke])) >> al) == 0:
        ke -= 1
    k = ss
    while k <= ke:
        st = 3 * (k - 1)
        enc.encode(aidx, amps, st, 0)  # not EOB
        while (abs(int(blk[k])) >> al) == 0:
            enc.encode(aidx, amps, st + 1, 0)
            st += 3
            k += 1
        enc.encode(aidx, amps, st + 1, 1)
        v = abs(int(blk[k])) >> al
        sign = 1 if int(blk[k]) < 0 else 0
        enc.encode(fix_idx, fix_mps, 0, sign)
        st += 2
        sz = v - 1
        if sz == 0:
            enc.encode(aidx, amps, st, 0)
            mtop = 0
        elif sz == 1:
            enc.encode(aidx, amps, st, 1)
            enc.encode(aidx, amps, st, 0)
            mtop = 1
        else:
            enc.encode(aidx, amps, st, 1)
            enc.encode(aidx, amps, st, 1)
            mtop = 2
            st = 189 if k <= kx else 217
            while (mtop << 1) <= sz:
                enc.encode(aidx, amps, st, 1)
                mtop <<= 1
                st += 1
            enc.encode(aidx, amps, st, 0)
        st += 14
        mm = mtop >> 1
        while mm:
            enc.encode(aidx, amps, st, 1 if sz & mm else 0)
            mm >>= 1
        k += 1
    if k <= se:
        enc.encode(aidx, amps, 3 * (k - 1), 1)  # EOB


def _encode_ac_refine_block(enc: QMEncoder, aidx: bytearray,
                            amps: bytearray, fix_idx: bytearray,
                            fix_mps: bytearray, blk: np.ndarray,
                            ss: int, se: int, ah: int,
                            al: int) -> None:
    """Mirror of _decode_ac_refine_block (G.2.3 correction model):
    ``blk`` holds the FULL coefficients; history is what a decoder
    knows after the Ah-precision scans (``abs >> ah`` nonzero)."""
    ke = se
    while ke >= ss and (abs(int(blk[ke])) >> al) == 0:
        ke -= 1
    kex = ke
    while kex >= ss and (abs(int(blk[kex])) >> ah) == 0:
        kex -= 1
    k = ss
    while k <= ke:
        st = 3 * (k - 1)
        if k > kex:
            enc.encode(aidx, amps, st, 0)  # not EOB
        while True:
            t = abs(int(blk[k])) >> al
            if t:
                if t >> 1:  # previously nonzero: one correction bit
                    enc.encode(aidx, amps, st + 2, t & 1)
                else:       # newly nonzero + fixed-state sign
                    enc.encode(aidx, amps, st + 1, 1)
                    enc.encode(fix_idx, fix_mps, 0,
                               1 if int(blk[k]) < 0 else 0)
                break
            enc.encode(aidx, amps, st + 1, 0)
            st += 3
            k += 1
        k += 1
    if k <= se:
        enc.encode(aidx, amps, 3 * (k - 1), 1)  # EOB


def encode_arith_scan(blocks_per_comp: list[np.ndarray],
                      plan: list[tuple[int, int, int, int]],
                      mcux: int, mcuy: int,
                      dc_cond: dict[int, tuple[int, int]] | None = None,
                      ac_cond: dict[int, int] | None = None,
                      differential: bool = False) -> bytes:
    """Encode quantized coefficients as one interleaved sequential
    arithmetic scan (no restarts).  ``blocks_per_comp[ci]`` is
    (rows, cols, 64) int zigzag-order blocks; ``plan`` rows are
    (td, ta, hi, vi) matching the frame header.  ``differential``
    mirrors decode_arith_scan's SOF13 semantics: DC predictor ZERO
    for every block."""
    dc_cond = dc_cond or {}
    ac_cond = ac_cond or {}
    enc = QMEncoder()
    stats = _Stats()
    dc_ctx = [0] * len(plan)
    last_dc = [0] * len(plan)
    for m in range(mcux * mcuy):
        my, mx = m // mcux, m % mcux
        for ci, (td, ta, hi, vi) in enumerate(plan):
            didx, dmps = stats.dc(td)
            aidx, amps = stats.ac(ta)
            dl, du = dc_cond.get(td, DEFAULT_DC_COND)
            kx = ac_cond.get(ta, DEFAULT_AC_KX)
            for bv in range(vi):
                for bh in range(hi):
                    zz = blocks_per_comp[ci][my * vi + bv, mx * hi + bh]
                    if differential:
                        dc_ctx[ci], _ = _encode_dc_block(
                            enc, didx, dmps, dc_ctx[ci], 0,
                            dl, du, int(zz[0]))
                    else:
                        dc_ctx[ci], last_dc[ci] = _encode_dc_block(
                            enc, didx, dmps, dc_ctx[ci], last_dc[ci],
                            dl, du, int(zz[0]))
                    _encode_ac_block(enc, aidx, amps, stats.fix_idx,
                                     stats.fix_mps, zz, 1, 63, 0, kx)
    return enc.finish()


# --- lossless (SOF11): the T.81 Annex H statistical model ------------
#
# The decision tree per sample difference is EXACTLY the DC-difference
# tree (S0 zero/nonzero, SS sign, SP/SN magnitude>1, X chain, M
# mantissa — _decode_v / encode_v), but conditioning is
# two-dimensional (§H.1.2.2): Da (the difference coded for the sample
# to the LEFT) and Db (the difference coded for the sample ABOVE) are
# each classified into five categories — zero, small+/-, large+/- —
# with the same (L, U) bounds and the same MSB-of-Sz quantity the DC
# model classifies on (F.1.4.4.1.1).  The 5x5 pair selects one of 25
# four-bin groups; Db's class selects which of the two 29-bin
# magnitude areas applies.  Differences outside the scan (first
# line / first column) classify as zero.
#
# PINNED layout (documented because NO independent implementation of
# SOF11 exists to interop with — libjpeg and libjpeg-turbo never
# shipped it, so the committed gate is the mirror-encoder round trip
# plus the shared-machinery validation of the QM coder itself, which
# IS libjpeg-differential via SOF9/SOF10): group index
# S0 = 4 * (5 * Q(Db) + Q(Da)) with Q in {0 zero, 1 small+, 2 small-,
# 3 large+, 4 large-} (the DC model's own context/4 encoding);
# magnitude chains at 100 (Q(Db) <= 2) / 129 (large Db).
# Differences are reduced modulo 2^16 into [-32768, 32767] before
# coding (§H.1.2.1 modulo arithmetic), which also bounds the X chain
# at X15 exactly as the 29-bin area requires.

def _classify_diff(diff: int, dl: int, du: int) -> int:
    """Five-way F.1.4.4.1.1 classification of a coded difference via
    the MSB of Sz = |diff| - 1 (the exact quantity _decode_dc_block
    conditions on): 0 zero, 1 small+, 2 small-, 3 large+, 4 large-."""
    if diff == 0:
        return 0
    sign = 1 if diff < 0 else 0
    sz = (diff if diff > 0 else -diff) - 1
    m = 0 if sz == 0 else 1 << (sz.bit_length() - 1)
    if m < ((1 << dl) >> 1):
        return 0
    if m > ((1 << du) >> 1):
        return 3 + sign
    return 1 + sign


def _reduce_diff(diff: int) -> int:
    """Modulo-2^16 reduction into [-32768, 32767] (§H.1.2.1)."""
    return ((diff + 0x8000) & 0xFFFF) - 0x8000


def decode_arith_lossless_scan(data: bytes, pos: int, w: int, h: int,
                               tabs: list[int], sel: int, pt: int,
                               dc_cond: dict[int, tuple[int, int]],
                               differential: bool = False,
                               ) -> tuple[list[np.ndarray], int]:
    """One arithmetic lossless scan (SOF11): same walk order,
    prediction (jpeg._ll_predict) and output contract as the Huffman
    path jpeg._decode_lossless_scan — ``tabs`` holds each scan
    component's arithmetic conditioning/statistics id (the SOS Td
    field), 1x1 sampling, no restarts.  Returns per-component int32
    planes already shifted left by the point transform, plus the
    offset of the next marker.

    ``differential`` selects the hierarchical differential-frame
    semantics (SOF15, Annex J): NO prediction — the coded values ARE
    the source-minus-reference differences, returned signed and
    unmasked (the Da/Db conditioning classifies on them unchanged;
    the caller enforces Pt = 0)."""
    from .jpeg import _ll_predict  # deferred: jpeg.py imports us

    dec = QMDecoder(data, pos)
    stats = _Stats()
    ncs = len(tabs)
    planes = [np.zeros((h, w), dtype=np.int32) for _ in range(ncs)]
    # Da/Db conditioning history: one previous-line and one
    # current-line difference row per component.
    above = [[0] * w for _ in range(ncs)]
    cur = [[0] * w for _ in range(ncs)]
    conds = [dc_cond.get(tb, DEFAULT_DC_COND) for tb in tabs]
    default = 1 << (7 - pt)
    for y in range(h):
        for x in range(w):
            for ci in range(ncs):
                lidx, lmps = stats.ll(tabs[ci])
                dl, du = conds[ci]
                qa = 0 if x == 0 else _classify_diff(cur[ci][x - 1],
                                                     dl, du)
                qb = 0 if y == 0 else _classify_diff(above[ci][x],
                                                     dl, du)
                s0 = 4 * (5 * qb + qa)
                if dec.decode(lidx, lmps, s0) == 0:
                    diff = 0
                else:
                    v, sign, _m = _decode_v(
                        dec, lidx, lmps, s0, 100 if qb <= 2 else 129)
                    diff = -v if sign else v
                cur[ci][x] = diff
                p = planes[ci]
                if differential:
                    p[y, x] = diff
                else:
                    p[y, x] = (_ll_predict(p, y, x, sel, default)
                               + diff) & 0xFFFF
        for ci in range(ncs):
            above[ci], cur[ci] = cur[ci], above[ci]
    shifted = [p << pt for p in planes]
    return shifted, _next_marker(
        data, dec.marker_pos if dec.marker_pos >= 0 else dec.bp)


def encode_arith_lossless_scan(planes: list[np.ndarray], tabs: list[int],
                               sel: int, pt: int,
                               dc_cond: dict[int, tuple[int, int]]
                               | None = None,
                               differential: bool = False) -> bytes:
    """Mirror of decode_arith_lossless_scan: ``planes`` holds each
    component's (h, w) samples ALREADY shifted right by the point
    transform (what the scan codes); returns the entropy-coded
    segment bytes.  ``differential`` mirrors the SOF15 semantics:
    ``planes`` then holds the signed difference values themselves
    (no prediction; caller enforces Pt = 0)."""
    from .jpeg import _ll_predict

    dc_cond = dc_cond or {}
    enc = QMEncoder()
    stats = _Stats()
    ncs = len(tabs)
    h, w = planes[0].shape
    recon = [np.zeros((h, w), dtype=np.int32) for _ in range(ncs)]
    above = [[0] * w for _ in range(ncs)]
    cur = [[0] * w for _ in range(ncs)]
    conds = [dc_cond.get(tb, DEFAULT_DC_COND) for tb in tabs]
    default = 1 << (7 - pt)
    for y in range(h):
        for x in range(w):
            for ci in range(ncs):
                lidx, lmps = stats.ll(tabs[ci])
                dl, du = conds[ci]
                qa = 0 if x == 0 else _classify_diff(cur[ci][x - 1],
                                                     dl, du)
                qb = 0 if y == 0 else _classify_diff(above[ci][x],
                                                     dl, du)
                s0 = 4 * (5 * qb + qa)
                if differential:
                    diff = _reduce_diff(int(planes[ci][y, x]))
                else:
                    p = recon[ci]
                    pred = _ll_predict(p, y, x, sel, default)
                    diff = _reduce_diff(int(planes[ci][y, x]) - pred)
                if diff == 0:
                    enc.encode(lidx, lmps, s0, 0)
                else:
                    enc.encode(lidx, lmps, s0, 1)
                    sign = 1 if diff < 0 else 0
                    encode_v(enc, lidx, lmps, s0,
                             100 if qb <= 2 else 129, abs(diff), sign)
                cur[ci][x] = diff
                if not differential:
                    recon[ci][y, x] = (pred + diff) & 0xFFFF
        for ci in range(ncs):
            above[ci], cur[ci] = cur[ci], above[ci]
    return enc.finish()
