"""Progressive JPEG (SOF2, T.81 Annex G) round-trips: synth's
progressive encoder (sources/synth.encode_jpeg_progressive — DC
first/refine + per-band AC first/refine scans with EOB runs, ZRLs and
buffered correction bits in libjpeg's emit shape) against the decoder
(functions/jpeg.decode_jpeg), compared to an INDEPENDENT closed-form
reconstruction (explicit-formula IDCT, not the decoder's matrix
path).  No Ray needed — pure function tests."""

from __future__ import annotations

import numpy as np
import pytest

from rust_paddle_ocr_ray.functions.jpeg import ZIGZAG, decode_jpeg
from rust_paddle_ocr_ray.sources.synth import (
    encode_jpeg_gray_dc,
    encode_jpeg_progressive,
)


def _ref_idct(coef_nat: np.ndarray) -> np.ndarray:
    """Explicit T.81 A.3.3 IDCT formula (slow double loop) — the
    independent reference for the decoder's separable matrix IDCT."""
    out = np.zeros((8, 8), dtype=np.float64)
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                cu = 1.0 / np.sqrt(2.0) if u == 0 else 1.0
                for v in range(8):
                    cv = 1.0 / np.sqrt(2.0) if v == 0 else 1.0
                    s += (cu * cv * coef_nat[u, v]
                          * np.cos((2 * x + 1) * u * np.pi / 16)
                          * np.cos((2 * y + 1) * v * np.pi / 16))
            out[x, y] = s / 4.0
    return out


def _ref_reconstruct(coefs, samplings, w, h):
    """Unit-quant zigzag coefficient grids -> expected pixels: per-block
    reference IDCT + 128, clip/rint, natural-size crop, replication
    upsample, BT.601 (identical constants to the decoder)."""
    hmax = max(s[0] for s in samplings)
    vmax = max(s[1] for s in samplings)
    planes = []
    for cz, (hi, vi) in zip(coefs, samplings):
        by, bx, _ = cz.shape
        plane = np.zeros((by * 8, bx * 8), dtype=np.uint8)
        for r in range(by):
            for c in range(bx):
                nat = np.zeros(64, dtype=np.float64)
                nat[ZIGZAG] = cz[r, c]
                px = _ref_idct(nat.reshape(8, 8)) + 128.0
                plane[r * 8:r * 8 + 8, c * 8:c * 8 + 8] = np.clip(
                    np.rint(px), 0, 255)
        plane = plane[: -(-h * vi // vmax), : -(-w * hi // hmax)]
        planes.append(
            np.repeat(np.repeat(plane, vmax // vi, axis=0),
                      hmax // hi, axis=1)[:h, :w])
    if len(planes) == 1:
        return planes[0]
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    rgb = np.stack([y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb], axis=2)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def _sparse_coefs(rng, by, bx, density=0.15, amp=120):
    """Random sparse zigzag coefficient grid, DC biased larger."""
    cz = np.zeros((by, bx, 64), dtype=np.int64)
    mask = rng.random((by, bx, 64)) < density
    cz[mask] = rng.integers(-amp, amp + 1, size=int(mask.sum()))
    cz[..., 0] = rng.integers(-400, 400, size=(by, bx))
    return cz


def test_progressive_gray_roundtrip():
    rng = np.random.default_rng(7)
    cz = _sparse_coefs(rng, 3, 4)
    w, h = 27, 21  # partial blocks at both edges
    data = encode_jpeg_progressive([cz], [(1, 1)], w=w, h=h)
    got = decode_jpeg(data)
    assert got.shape == (h, w)
    np.testing.assert_array_equal(got, _ref_reconstruct([cz], [(1, 1)], w, h))


@pytest.mark.parametrize("hy,vy", [(2, 2), (2, 1), (1, 2)])
def test_progressive_color_subsampled(hy, vy):
    rng = np.random.default_rng(100 * hy + vy)
    my, mx = 2, 3
    yz = _sparse_coefs(rng, vy * my, hy * mx)
    cbz = _sparse_coefs(rng, my, mx, density=0.08)
    crz = _sparse_coefs(rng, my, mx, density=0.08)
    samp = [(hy, vy), (1, 1), (1, 1)]
    w = mx * hy * 8 - 5
    h = my * vy * 8 - 3
    data = encode_jpeg_progressive([yz, cbz, crz], samp, w=w, h=h)
    got = decode_jpeg(data)
    assert got.shape == (h, w, 3)
    np.testing.assert_array_equal(
        got, _ref_reconstruct([yz, cbz, crz], samp, w, h))


@pytest.mark.parametrize("samp", [
    [(2, 2), (2, 1), (1, 1)],   # chroma wider than 1x1: its AC scans
    [(2, 2), (1, 2), (2, 2)],   # walk a non-trivial per-component grid
    [(2, 1), (2, 1), (1, 1)],
    [(1, 2), (1, 1), (1, 2)],
])
def test_progressive_mixed_samplings(samp):
    """Per-component mixed samplings: every component's non-interleaved
    AC-scan grid differs (T.81 G.1 scans address each component's own
    block array, not the MCU grid)."""
    rng = np.random.default_rng(sum(h * 10 + v for h, v in samp))
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mx, my = 3, 2
    coefs = [_sparse_coefs(rng, my * v, mx * h, density=0.1)
             for h, v in samp]
    w = mx * hmax * 8 - 5
    h_ = my * vmax * 8 - 3
    data = encode_jpeg_progressive(coefs, samp, w=w, h=h_)
    got = decode_jpeg(data)
    np.testing.assert_array_equal(
        got, _ref_reconstruct(coefs, samp, w, h_))


def test_progressive_restart_intervals():
    rng = np.random.default_rng(11)
    yz = _sparse_coefs(rng, 4, 6)
    cbz = _sparse_coefs(rng, 2, 3, density=0.1)
    crz = _sparse_coefs(rng, 2, 3, density=0.1)
    samp = [(2, 2), (1, 1), (1, 1)]
    data = encode_jpeg_progressive([yz, cbz, crz], samp, restart_interval=2)
    got = decode_jpeg(data)
    np.testing.assert_array_equal(
        got, _ref_reconstruct([yz, cbz, crz], samp, 6 * 16, 2 * 16))


def test_progressive_zrl_history_interleave():
    """The refinement-scan ordering edge: a >16-zero run with a
    HISTORY coefficient sitting after the 16th zero, before the newly
    nonzero one — correction bits must flush around the ZRL exactly as
    the decoder walk consumes them (libjpeg's emit shape)."""
    cz = np.zeros((1, 1, 64), dtype=np.int64)
    cz[0, 0, 0] = 50
    cz[0, 0, 7] = 3    # history (|c|>>1 = 1 nonzero in first scan)
    # k=8..24 zeros (17), history after the 16th zero of the run:
    cz[0, 0, 25] = -2  # history
    # k=26..30 zeros, then newly nonzero at this precision:
    cz[0, 0, 31] = 1   # |c|>>1 == 0 -> arrives in the refine scan
    cz[0, 0, 63] = -1  # trailing newly-nonzero in the 2nd band's tail
    data = encode_jpeg_progressive([cz], [(1, 1)])
    got = decode_jpeg(data)
    np.testing.assert_array_equal(
        got, _ref_reconstruct([cz], [(1, 1)], 8, 8))


def test_progressive_eobrun_accumulates_across_blocks():
    """Many all-zero-band blocks force multi-block EOB runs in both
    first and refinement AC scans."""
    rng = np.random.default_rng(23)
    cz = np.zeros((2, 8, 64), dtype=np.int64)
    cz[..., 0] = rng.integers(-200, 200, size=(2, 8))
    cz[0, 0, 5] = 9    # lone AC coefficient; every other block is EOB
    cz[1, 7, 40] = -1  # newly-nonzero only in the refine scan
    data = encode_jpeg_progressive([cz], [(1, 1)])
    got = decode_jpeg(data)
    np.testing.assert_array_equal(
        got, _ref_reconstruct([cz], [(1, 1)], 64, 16))


def test_progressive_dc_only_matches_baseline():
    """A DC-only progressive stream decodes to exactly the same pixels
    as the baseline encoding of the same block values."""
    rng = np.random.default_rng(31)
    vals = rng.integers(30, 226, size=(3, 5))
    base = decode_jpeg(encode_jpeg_gray_dc(vals))
    cz = np.zeros((3, 5, 64), dtype=np.int64)
    cz[..., 0] = 8 * (vals - 128)
    prog = decode_jpeg(encode_jpeg_progressive([cz], [(1, 1)]))
    np.testing.assert_array_equal(base, prog)
