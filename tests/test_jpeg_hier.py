"""Hierarchical JPEG (T.81 Annex J, functions/jpeg_hier.py).

No independent Annex-J implementation exists to interop with
(libjpeg and libjpeg-turbo never shipped it), so the gate is the
mirror-encoder round trip (sources/synth.encode_jpeg_hierarchical)
over scan machinery that is itself libjpeg-validated (SOF9/SOF10
arithmetic) or shared with the SOF0/SOF3 paths — plus structural
error-path checks that the pyramid walk validates what it reads.
Reference parity: the reference's image crate (src/main.rs:121)
does not decode hierarchical JPEG either; this path exceeds it.
"""

from __future__ import annotations

import numpy as np
import pytest

from rust_paddle_ocr_ray.functions.jpeg import (
    _ycbcr_to_rgb,
    decode_jpeg,
    decode_jpeg_gray,
)
from rust_paddle_ocr_ray.functions.jpeg_hier import _exp_double
from rust_paddle_ocr_ray.sources.synth import encode_jpeg_hierarchical


def _img(h, w, seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w), dtype=np.uint8)


# ---------------------------------------------------------------- EXP


def test_exp_double_matches_spec_formula():
    # §J.8: out[2i] = in[i], out[2i+1] = (in[i]+in[i+1]+1)>>1,
    # final odd sample replicates.
    p = np.array([[0, 10, 255]], dtype=np.int32)
    e = _exp_double(p, 1, 0)
    assert e.tolist() == [[0, 5, 10, 133, 255, 255]]
    v = _exp_double(np.array([[0], [10], [255]], dtype=np.int32), 0, 1)
    assert v.ravel().tolist() == [0, 5, 10, 133, 255, 255]
    one = _exp_double(np.array([[7]], dtype=np.int32), 1, 1)
    assert one.tolist() == [[7, 7], [7, 7]]


# --------------------------------------------------------- round trips


@pytest.mark.parametrize("arith", [False, True])
@pytest.mark.parametrize("dims", [(1, 1), (2, 3), (8, 8), (9, 7),
                                  (16, 16), (17, 31), (24, 40)])
def test_gray_roundtrip_exact(arith, dims):
    h, w = dims
    img = _img(h, w, h * 97 + w + arith)
    out = decode_jpeg_gray(encode_jpeg_hierarchical(img, arith=arith))
    assert out.shape == (h, w)
    assert np.array_equal(out, img)


@pytest.mark.parametrize("arith", [False, True])
@pytest.mark.parametrize("dims", [(1, 2), (8, 8), (11, 13)])
def test_color_roundtrip_exact(arith, dims):
    h, w = dims
    planes = [_img(h, w, 7 * i + h + w) for i in range(3)]
    want = _ycbcr_to_rgb([p.astype(np.int32) for p in planes])
    out = decode_jpeg(encode_jpeg_hierarchical(planes, arith=arith))
    assert out.shape == (h, w, 3)
    assert np.array_equal(out, want)


def test_odd_dims_exercise_the_j81_reference_clip():
    # ceil(17/2)*2 = 18 > 17: the EXP'd reference overshoots by one
    # row/column and the decoder must clip it per §J.8.1.
    img = _img(17, 19, 5)
    assert np.array_equal(
        decode_jpeg_gray(encode_jpeg_hierarchical(img)), img)


def test_extreme_residue_wraps_mod_2_16():
    # All-0 next to all-255 pixels force large differential-lossless
    # residues after the clamped DCT correction; reconstruction is
    # modulo 2^16 and must still land exactly.
    img = np.zeros((16, 16), dtype=np.uint8)
    img[::2] = 255
    for arith in (False, True):
        assert np.array_equal(
            decode_jpeg_gray(encode_jpeg_hierarchical(img, arith=arith)),
            img)


# ---------------------------------------------------------- error paths


def _segments(payload: bytes):
    """(marker, start_offset) pairs for every marker segment."""
    out, pos = [], 2
    while pos + 1 < len(payload):
        assert payload[pos] == 0xFF
        m = payload[pos + 1]
        out.append((m, pos))
        if m == 0xD9:
            break
        ln = (payload[pos + 2] << 8) | payload[pos + 3]
        pos += 2 + ln
        if m == 0xDA:  # skip entropy to the next FF xx that is a marker
            while pos + 1 < len(payload):
                if payload[pos] == 0xFF and payload[pos + 1] not in (
                        0x00, 0xFF) and not (
                        0xD0 <= payload[pos + 1] <= 0xD7):
                    break
                pos += 1
    return out


def test_progressive_frame_inside_pyramid_rejected():
    payload = bytearray(encode_jpeg_hierarchical(_img(8, 8, 1)))
    segs = dict(_segments(bytes(payload)))
    # first frame SOF3 -> SOF2 (progressive): declared out
    payload[segs[0xC3] + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(payload))


def test_differential_frame_outside_hierarchy_rejected():
    payload = bytearray(encode_jpeg_hierarchical(_img(8, 8, 2)))
    segs = _segments(bytes(payload))
    dhp = next(p for m, p in segs if m == 0xDE)
    # drop the DHP and make the first frame differential (SOF3->SOF7):
    # a differential frame must never decode outside a hierarchy
    ln = (payload[dhp + 2] << 8) | payload[dhp + 3]
    del payload[dhp:dhp + 2 + ln]
    sof3 = next(p for m, p in _segments(bytes(payload)) if m == 0xC3)
    payload[sof3 + 1] = 0xC7
    with pytest.raises(ValueError, match="differential frame outside"):
        decode_jpeg(bytes(payload))


def test_missing_exp_dims_mismatch_rejected():
    payload = bytearray(encode_jpeg_hierarchical(_img(16, 16, 3)))
    segs = _segments(bytes(payload))
    exp = next(p for m, p in segs if m == 0xDF)
    del payload[exp:exp + 5]  # FF DF 00 03 11
    with pytest.raises(ValueError, match="missing EXP|dims"):
        decode_jpeg(bytes(payload))


def test_second_dhp_rejected():
    payload = bytearray(encode_jpeg_hierarchical(_img(8, 8, 4)))
    segs = _segments(bytes(payload))
    dhp = next(p for m, p in segs if m == 0xDE)
    ln = (payload[dhp + 2] << 8) | payload[dhp + 3]
    seg = bytes(payload[dhp:dhp + 2 + ln])
    payload[dhp:dhp] = seg  # duplicate the DHP
    with pytest.raises(ValueError, match="second DHP"):
        decode_jpeg(bytes(payload))


def test_truncation_never_escapes_valueerror_at_boundary():
    # A cut mid-entropy may still complete: the QM coder zero-feeds
    # past a marker (T.81 byte-stuffing semantics — same documented
    # truncation degrade as the SOF11 path), yielding a partial-
    # quality image of the right dims.  What must never happen is an
    # exception OTHER than ValueError/NotImplementedError escaping
    # the production boundary.
    from rust_paddle_ocr_ray.stages.multimodal import decode_payload

    payload = encode_jpeg_hierarchical(_img(16, 16, 6), arith=True)
    for cut in range(2, len(payload), 3):
        try:
            out = decode_payload(payload[:cut])
        except (ValueError, NotImplementedError):
            continue
        assert out.shape == (16, 16, 1)
