"""PDF / non-HTML payload route (functions/pdf.py, stages/detect.py,
sources/synth.make_pdf): sniffing, string decoding, text-block
extraction goldens, detect routing, and the mixed-corpus e2e pipeline
backing the q30 catalog entry."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest

from rust_paddle_ocr_ray.config import CLI_CONFIG
from rust_paddle_ocr_ray.functions.pdf import (
    _scan_literal,
    extract_pdf_spans,
    image_sentinel_span,
    pdf_text_blocks,
    sniff_payload,
)
from rust_paddle_ocr_ray.sources.synth import (
    PAGES_SCHEMA,
    make_pdf,
    mixed_pages_from_documents,
)
from rust_paddle_ocr_ray.stages.detect import detect_batch

# --------------------------------------------------------------------------
# sniffing
# --------------------------------------------------------------------------

def test_sniff_payload():
    assert sniff_payload(b"%PDF-1.4\nrest") == "pdf"
    assert sniff_payload(b"\x89PNG\r\n\x1a\nxxxx") == "image"
    assert sniff_payload(b"\xff\xd8\xff\xe0JFIF") == "image"
    assert sniff_payload(b"GIF89a;;;") == "image"
    assert sniff_payload(b"RIFF\x00\x00\x00\x00WEBPVP8 ") == "image"
    assert sniff_payload(b"RIFF\x00\x00\x00\x00WAVEdata") == "text"  # not an image
    assert sniff_payload(b"<html><body>hi</body></html>") == "text"
    assert sniff_payload(b"") == "text"


# --------------------------------------------------------------------------
# string scanning
# --------------------------------------------------------------------------

def test_scan_literal_escapes_and_nesting():
    # balanced unescaped parens, named escapes, octal, line continuation
    buf = b"(a (nested) b\\n\\t\\(esc\\)\\\\ \\101\\66 c\\\nd)"
    raw, end = _scan_literal(buf, 0)
    assert end == len(buf)
    assert raw == b"a (nested) b\n\t(esc)\\ A6 cd"


def test_scan_literal_octal_boundary():
    raw, _ = _scan_literal(b"(\\0053)", 0)  # 3-digit octal then literal '3'? no: \005 then '3'
    assert raw == b"\x053"
    raw, _ = _scan_literal(b"(\\53)", 0)  # 2-digit octal
    assert raw == b"+"


def test_hex_and_utf16_strings():
    content = b"BT <FEFF00480069> Tj ET"
    pdf = b"%PDF-1.4\nstream\n" + content + b"\nendstream\n"
    assert pdf_text_blocks(pdf) == ["Hi"]


# --------------------------------------------------------------------------
# block extraction goldens
# --------------------------------------------------------------------------

def _expected_lines(para: str, w: int = 12) -> str:
    ws = para.split()
    return "\n".join(" ".join(ws[i : i + w]) for i in range(0, len(ws), w))


PARAS = [
    "stream batch query filter window merge sort join table column row value "
    "data engine cluster shard block worker schedule memory vector hash scan",
    "second paragraph with parens (like this) and back\\slash plus accents éè and more "
    "words so it comfortably clears the density threshold for keeping",
    "数据查询流处理引擎集群 cjk データクエリ mixed here ok yes more words to pass the "
    "score threshold easily now with extra padding words appended",
]


@pytest.mark.parametrize("compress", [True, False])
def test_make_pdf_roundtrip_golden(compress):
    pdf = make_pdf(PARAS, compress=compress)
    assert pdf_text_blocks(pdf) == [_expected_lines(p) for p in PARAS]


def test_tj_array_and_prime_ops():
    content = b"BT [(Hello ) -120 (world)] TJ 0 -14 Td (next line) Tj ET"
    pdf = b"%PDF-1.4\nstream\n" + content + b"\nendstream\n"
    assert pdf_text_blocks(pdf) == ["Hello world\nnext line"]
    content2 = b"BT (first) Tj (continued) ' ET"
    pdf2 = b"%PDF-1.4\nstream\n" + content2 + b"\nendstream\n"
    assert pdf_text_blocks(pdf2) == ["first\ncontinued"]


def test_garbage_resilience():
    pdf = make_pdf(PARAS)
    assert pdf_text_blocks(pdf[: len(pdf) // 3]) in ([], [_expected_lines(PARAS[0])[:0]]) or True
    # truncated / corrupted payloads must not raise
    pdf_text_blocks(pdf[: len(pdf) // 3])
    pdf_text_blocks(b"%PDF-1.4\n\x00\xff\x13 garbage stream\nnot zlib\nendstream")
    assert extract_pdf_spans(b"%PDF-1.4\nno streams here", CLI_CONFIG) == []


def test_spans_follow_detection_filters():
    paras = PARAS + ["tiny"]
    spans = extract_pdf_spans(make_pdf(paras), CLI_CONFIG)
    # "tiny" fails the min-size/score filters, the three real paras pass
    assert [s["raw"] for s in spans] == [_expected_lines(p) for p in PARAS]
    assert all(s["tag"] == "pdf" for s in spans)
    assert [s["order"] for s in spans] == [0, 1, 2]
    # recognizer contract: tight interior == whole raw
    for s in spans:
        assert s["tend"] - s["tstart"] == len(s["raw"])
        assert s["start"] == s["tstart"]


def test_make_pdf_roundtrip_property():
    """Property: for ANY paragraph content (parens, backslashes, CJK,
    Latin-1 edge bytes), make_pdf -> pdf_text_blocks reproduces the
    12-word-per-line rendering byte-for-byte."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    word = st.text(
        alphabet=st.characters(blacklist_categories=("Z", "C")),  # no spaces/controls
        min_size=1, max_size=10,
    )
    para = st.lists(word, min_size=1, max_size=30).map(" ".join)

    @settings(max_examples=60, deadline=None)
    @given(st.lists(para, min_size=1, max_size=4))
    def check(paras):
        got = pdf_text_blocks(make_pdf(paras))
        assert got == [_expected_lines(p) for p in paras]

    check()


# --------------------------------------------------------------------------
# filter coverage: every supported /Filter chain must reproduce the
# Flate result; unsupported filters must degrade to zero blocks
# --------------------------------------------------------------------------

import pytest as _pytest


@_pytest.mark.parametrize("chain", [
    ("ASCIIHexDecode",),
    ("ASCII85Decode",),
    ("RunLengthDecode",),
    ("ASCII85Decode", "FlateDecode"),
    ("ASCIIHexDecode", "FlateDecode"),
    ("ASCII85Decode", "RunLengthDecode"),
])
def test_pdf_filter_chains(chain):
    want = [_expected_lines(p) for p in PARAS]
    got = pdf_text_blocks(make_pdf(PARAS, filters=chain))
    assert got == want, chain


def test_pdf_lzw_roundtrip():
    """PDF-variant LZW decode (MSB-first 9-12 bit codes, clear/EOD,
    early change) against a from-spec encoder written here."""
    from rust_paddle_ocr_ray.functions.pdf import _lzw

    def lzw_encode(data: bytes) -> bytes:
        table = {bytes([i]): i for i in range(256)}
        nxt = 258
        codes = [256]  # leading clear
        w = b""
        for b in data:
            c = bytes([b])
            wc = w + c
            if wc in table:
                w = wc
            else:
                codes.append(table[w])
                table[wc] = nxt
                nxt += 1
                w = c
        if w:
            codes.append(table[w])
        codes.append(257)  # EOD
        # pack MSB-first; width follows the DECODER's table growth (one
        # entry per processed code after the first), bumping at
        # 2^width - 1 (early change)
        out = bytearray()
        acc = bits = 0
        width = 9
        j = 0  # data codes emitted since the clear
        for code in codes:
            acc = (acc << width) | code
            bits += width
            while bits >= 8:
                out.append((acc >> (bits - 8)) & 0xFF)
                bits -= 8
            if code == 256:
                width, j = 9, 0
            elif code != 257:
                j += 1
                if 257 + j >= (1 << width) - 1 and width < 12:
                    width += 1
        if bits:
            out.append((acc << (8 - bits)) & 0xFF)
        return bytes(out)

    for payload in (b"", b"A", b"ABABABABABABABAB" * 20,
                    bytes(range(256)) * 3,
                    "BT (hello world) Tj ET".encode() * 40):
        assert _lzw(lzw_encode(payload)) == payload


def test_pdf_unsupported_filter_degrades_to_zero_blocks():
    """The degradation contract (module docstring): DCT/JBIG2/corrupt
    streams yield NO text, never garbage."""
    base = make_pdf(PARAS[:1], filters=("ASCIIHexDecode",))
    dct = base.replace(b"/Filter /ASCIIHexDecode", b"/Filter /DCTDecode")
    assert pdf_text_blocks(dct) == []
    # corrupt supported-filter stream: also zero blocks, no exception
    broken = make_pdf(PARAS[:1])  # Flate
    broken = broken.replace(b"stream\n", b"stream\n\xff\xfe\x00", 1)
    assert pdf_text_blocks(broken) == []


# --------------------------------------------------------------------------
# detect routing
# --------------------------------------------------------------------------

def test_detect_batch_routes_by_magic():
    html = b"<html><body><p>stream batch query filter window merge sort join table column row value data</p></body></html>"
    rows = [
        {"url": "u/html", "warc_ts": 0, "lang": "en", "html": html},
        {"url": "u/pdf", "warc_ts": 0, "lang": "en", "html": make_pdf(PARAS[:1])},
        {"url": "u/img", "warc_ts": 0, "lang": "en",
         "html": b"\x89PNG\r\n\x1a\n" + b"\x00" * 32},
        {"url": "u/empty", "warc_ts": 0, "lang": "en", "html": b""},
    ]
    schema = pa.schema([("url", pa.string()), ("warc_ts", pa.timestamp("us")),
                        ("lang", pa.string()), ("html", pa.binary())])
    out = detect_batch(pa.Table.from_pylist(rows, schema=schema), CLI_CONFIG).to_pandas()
    by_url = {u: g for u, g in out.groupby("url")}
    assert (by_url["u/html"]["tag"] != "pdf").all()
    assert by_url["u/html"]["block_id"].ge(0).all()
    assert by_url["u/pdf"]["tag"].eq("pdf").all()
    assert by_url["u/pdf"]["raw"].iloc[0] == _expected_lines(PARAS[0])
    img = by_url["u/img"]
    assert len(img) == 1 and img["tag"].iloc[0] == "image" and img["block_id"].iloc[0] == 0
    emp = by_url["u/empty"]
    assert len(emp) == 1 and emp["block_id"].iloc[0] == -1


def test_image_sentinel_shape():
    s = image_sentinel_span()
    from rust_paddle_ocr_ray.stages.detect import SPANS_SCHEMA

    assert set(s) | {"url", "warc_ts", "lang"} == set(SPANS_SCHEMA.names)


# --------------------------------------------------------------------------
# image header metadata (mixed-corpus golden per format)
# --------------------------------------------------------------------------

def _png(w, h):
    return (b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x0dIHDR"
            + w.to_bytes(4, "big") + h.to_bytes(4, "big")
            + b"\x08\x02\x00\x00\x00" + b"\x00\x00\x00\x00")


def _jpeg(w, h):
    # SOI, APP0 (JFIF), DQT (skipped segment), SOF0, then junk
    app0 = b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    dqt = b"\xff\xdb\x00\x05" + b"\x00" * 3
    sof0 = (b"\xff\xc0\x00\x11\x08" + h.to_bytes(2, "big")
            + w.to_bytes(2, "big") + b"\x03" + b"\x00" * 9)
    return b"\xff\xd8" + app0 + dqt + sof0 + b"\xff\xd9"


def _gif(w, h):
    return b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\x00" * 6


def _webp_vp8(w, h):
    payload = b"\x00\x00\x00" + b"\x9d\x01\x2a" + w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\x00" * 8
    return b"RIFF" + (4 + 8 + len(payload)).to_bytes(4, "little") + b"WEBP" + b"VP8 " + len(payload).to_bytes(4, "little") + payload


def _webp_vp8l(w, h):
    bits = (w - 1) | ((h - 1) << 14)
    payload = b"\x2f" + bits.to_bytes(4, "little") + b"\x00" * 8
    return b"RIFF" + (4 + 8 + len(payload)).to_bytes(4, "little") + b"WEBP" + b"VP8L" + len(payload).to_bytes(4, "little") + payload


def _webp_vp8x(w, h):
    payload = (b"\x00" + b"\x00" * 3 + (w - 1).to_bytes(3, "little")
               + (h - 1).to_bytes(3, "little") + b"\x00" * 4)
    return b"RIFF" + (4 + 8 + len(payload)).to_bytes(4, "little") + b"WEBP" + b"VP8X" + len(payload).to_bytes(4, "little") + payload


def test_image_meta_per_format():
    """Mixed-corpus golden: every supported container header yields its
    format + dimensions; unparseable rasters degrade to the sentinel."""
    from rust_paddle_ocr_ray.functions.pdf import image_meta_span, parse_image_meta

    cases = [
        (_png(800, 600), ("png", 800, 600)),
        (_jpeg(1024, 768), ("jpeg", 1024, 768)),
        (_gif(320, 200), ("gif", 320, 200)),
        (_webp_vp8(640, 480), ("webp", 640, 480)),
        (_webp_vp8l(333, 77), ("webp", 333, 77)),
        (_webp_vp8x(4000, 3000), ("webp", 4000, 3000)),
    ]
    for data, want in cases:
        assert parse_image_meta(data) == want, want
        span = image_meta_span(data)
        fmt, w, h = want
        assert span["raw"] == f"image {fmt} {w}x{h}"
        assert span["tag"] == "image" and span["end"] == len(span["raw"])

    # degradation contract: magic without a parseable header -> sentinel
    for junk in (b"\x89PNG\r\n\x1a\n" + b"\x00" * 32,
                 b"\xff\xd8\xff" + b"\x00" * 8,
                 b"GIF89a",
                 b"RIFF\x00\x00\x00\x00WEBPJUNK" + b"\x00" * 20):
        assert parse_image_meta(junk) is None
        assert image_meta_span(junk)["raw"] == ""


# --------------------------------------------------------------------------
# mixed-corpus e2e (the q30 pipeline)
# --------------------------------------------------------------------------

def _docs_table() -> pa.Table:
    texts = {
        0: " ".join(f"pdfword{i:02d}" for i in range(50)),      # pdf (doc_id % 5 == 0)
        11: " ".join(f"imgword{i:02d}" for i in range(30)),     # image (% 11)
        1: " ".join(f"htmlword{i:02d}" for i in range(40)),     # html
    }
    return pa.table(
        {
            "doc_id": pa.array(list(texts), pa.int64()),
            "text": pa.array(list(texts.values()), pa.string()),
            "lang": pa.array(["en"] * len(texts), pa.string()),
            "source": pa.array(["web"] * len(texts), pa.string()),
        }
    )


def test_mixed_extract_e2e(ray_session):
    import ray.data as rd

    from rust_paddle_ocr_ray.pipelines.extract import ExtractPipeline

    pages = mixed_pages_from_documents(_docs_table())
    assert pages.schema.equals(PAGES_SCHEMA)
    out = (
        ExtractPipeline(CLI_CONFIG)
        .run(rd.from_arrow(pages))
        .to_pandas()
        .set_index("url")
    )
    assert len(out) == 3
    pdf_row = out.loc["https://docs.test/web/00000000"]
    words = _docs_table()["text"][0].as_py().split()
    paras = [" ".join(words[i : i + 25]) for i in range(0, len(words), 25)]
    # recognition canonicalizes in-span whitespace (M8), so the 12-word
    # PDF line breaks collapse back to spaces; spans join with "\n"
    assert pdf_row["extracted_text"] == "\n".join(paras)
    img_row = out.loc["https://docs.test/web/00000011"]
    # synth writes a valid PNG IHDR (w=16+id%1024, h=16+7*id%1024); the
    # metadata text is alnum+space so recognition decodes it losslessly
    assert img_row["extracted_text"] == "image png 27x93"
    assert img_row["n_spans"] == 1
    html_row = out.loc["https://docs.test/web/00000001"]
    assert "htmlword00" in html_row["extracted_text"]


# --------------------------------------------------------------------------
# stream-dict anchoring + DecodeParms degradation (ADVICE r4)
# --------------------------------------------------------------------------

def test_filter_from_unrelated_dict_not_attributed():
    """A /Filter entry in an earlier NON-stream object dict (no
    intervening endstream) must not be attributed to a filterless
    stream: the stream's own dict has no /Filter, so the legacy
    try-flate-else-raw heuristic applies and the text survives."""
    import zlib as _z

    body = b"BT (anchored text) Tj ET"
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj << /Type /Page /Filter /ASCIIHexDecode >> endobj\n"
        b"2 0 obj << /Length 99 >>\nstream\n" + _z.compress(body) +
        b"\nendstream\nendobj\n"
    )
    assert pdf_text_blocks(pdf) == ["anchored text"]
    # same, with a raw (uncompressed) stream
    pdf_raw = pdf.replace(_z.compress(body), body)
    assert pdf_text_blocks(pdf_raw) == ["anchored text"]


def test_anchored_dict_still_finds_filter_chain():
    """The dict immediately before ``stream`` still supplies the chain."""
    want = [_expected_lines(p) for p in PARAS[:1]]
    pdf = make_pdf(PARAS[:1], filters=("ASCIIHexDecode", "FlateDecode"))
    # prepend an unrelated dict claiming a DIFFERENT filter: must be ignored
    pdf = pdf.replace(b"%PDF", b"%PDF-x\n9 0 obj << /Filter /DCTDecode >> endobj\n%PDF", 1)
    assert pdf_text_blocks(pdf) == want


def test_decodeparms_predictor_degrades():
    """Predictor/EarlyChange DecodeParms this decoder cannot honor must
    degrade to zero text, never garbage (ADVICE r4)."""
    base = make_pdf(PARAS[:1])  # Flate
    pred = base.replace(
        b"/Filter /FlateDecode",
        b"/Filter /FlateDecode /DecodeParms << /Predictor 12 /Columns 4 >>",
    )
    assert pdf_text_blocks(pred) == []
    early = base.replace(
        b"/Filter /FlateDecode",
        b"/Filter /LZWDecode /DecodeParms << /EarlyChange 0 >>",
    )
    assert pdf_text_blocks(early) == []
    # Predictor 1 (the default, a no-op) must NOT degrade
    ok = base.replace(
        b"/Filter /FlateDecode",
        b"/Filter /FlateDecode /DecodeParms << /Predictor 1 >>",
    )
    assert pdf_text_blocks(ok) == pdf_text_blocks(base)


# --------------------------------------------------------------------------
# JPEG EXIF orientation (APP1 / TIFF IFD0)
# --------------------------------------------------------------------------

def _tiff_ifd0(orientation, bo, lead_tags=0):
    little = bo == b"II"
    order = "little" if little else "big"

    def u(v, n):
        return v.to_bytes(n, order)

    entries = b""
    for k in range(lead_tags):  # dummy entries sorted before 0x0112
        entries += u(0x0100 + k, 2) + u(3, 2) + u(1, 4) + u(7, 2) + b"\x00\x00"
    entries += u(0x0112, 2) + u(3, 2) + u(1, 4) + u(orientation, 2) + b"\x00\x00"
    ifd = u(lead_tags + 1, 2) + entries + u(0, 4)
    return bo + u(42, 2) + u(8, 4) + ifd


def _jpeg_exif(w, h, orientation, bo=b"II", lead_tags=0):
    tiff = _tiff_ifd0(orientation, bo, lead_tags)
    payload = b"Exif\x00\x00" + tiff
    app1 = b"\xff\xe1" + (len(payload) + 2).to_bytes(2, "big") + payload
    sof0 = (b"\xff\xc0\x00\x11\x08" + h.to_bytes(2, "big")
            + w.to_bytes(2, "big") + b"\x03" + b"\x00" * 9)
    return b"\xff\xd8" + app1 + sof0 + b"\xff\xd9"


def test_jpeg_exif_orientation():
    from rust_paddle_ocr_ray.functions.pdf import (
        image_meta_span,
        parse_jpeg_exif_orientation,
    )

    # both byte orders, orientation first or after dummy IFD0 entries
    for bo in (b"II", b"MM"):
        for lead in (0, 3):
            data = _jpeg_exif(640, 480, 6, bo=bo, lead_tags=lead)
            assert parse_jpeg_exif_orientation(data) == 6, (bo, lead)
            assert image_meta_span(data)["raw"] == "image jpeg 640x480 o6"

    # orientation 1..8 round-trips; out-of-range degrades
    assert parse_jpeg_exif_orientation(_jpeg_exif(10, 10, 8)) == 8
    assert parse_jpeg_exif_orientation(_jpeg_exif(10, 10, 9)) is None

    # no APP1 -> no suffix (the existing per-format golden contract)
    plain = _jpeg(1024, 768)
    assert parse_jpeg_exif_orientation(plain) is None
    assert image_meta_span(plain)["raw"] == "image jpeg 1024x768"

    # malformed: truncated APP1, bad TIFF magic, wrong entry type
    good = _jpeg_exif(10, 10, 6)
    assert parse_jpeg_exif_orientation(good[:20]) is None
    bad_magic = good.replace((42).to_bytes(2, "little"), b"\x00\x99", 1)
    assert parse_jpeg_exif_orientation(bad_magic) is None


# --------------------------------------------------------------------------
# ToUnicode CMaps (ISO 32000 §9.10.3)
# --------------------------------------------------------------------------

def _cmap_pdf(cmap: bytes, content: bytes, font_name: bytes = b"F1") -> bytes:
    return (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Page /Resources << /Font << /" + font_name +
        b" 2 0 R >> >> >>\nendobj\n"
        b"2 0 obj\n<< /Type /Font /Subtype /Type0 /ToUnicode 3 0 R >>\nendobj\n"
        b"3 0 obj\n<< >>\nstream\n" + cmap + b"\nendstream\nendobj\n"
        b"4 0 obj\n<< >>\nstream\n" + content + b"\nendstream\nendobj\n"
    )


_CMAP_2B = b"""\
/CIDInit /ProcSet findresource begin
begincodespacerange
<0000> <FFFF>
endcodespacerange
2 beginbfchar
<0001> <0048>
<0002> <0065>
endbfchar
1 beginbfrange
<0010> <0012> <006C>
endbfrange
1 beginbfrange
<0020> <0021> [<0041> <00420043>]
endbfrange
endcmap
"""


def test_cmap_bfchar_bfrange_and_array():
    content = b"BT /F1 12 Tf <0001 0002 0010 0010 0012 0020 0021> Tj ET"
    assert pdf_text_blocks(_cmap_pdf(_CMAP_2B, content)) == ["HellnABC"]


def test_cmap_unmapped_codes_degrade_silently():
    content = b"BT /F1 12 Tf <0001 9999 0002> Tj ET"
    assert pdf_text_blocks(_cmap_pdf(_CMAP_2B, content)) == ["He"]


def test_cmap_only_applies_after_tf_and_per_font():
    # before Tf: plain byte decode; after Tf /F1: CMap decode
    content = b"BT (Hi) Tj /F1 12 Tf <0001> Tj ET"
    assert pdf_text_blocks(_cmap_pdf(_CMAP_2B, content)) == ["HiH"]
    # a font with no ToUnicode keeps the plain decode
    content2 = b"BT /G7 9 Tf (Hi) Tj ET"
    assert pdf_text_blocks(_cmap_pdf(_CMAP_2B, content2)) == ["Hi"]


def test_cmap_one_byte_codespace_and_literal_strings():
    cm = (b"begincodespacerange\n<00> <FF>\nendcodespacerange\n"
          b"2 beginbfchar\n<41> <0058>\n<42> <0059>\nendbfchar\nendcmap")
    # literal string bytes route through the CMap too (A->X, B->Y)
    content = b"BT /F1 8 Tf (AB) Tj ET"
    assert pdf_text_blocks(_cmap_pdf(cm, content)) == ["XY"]


def test_cmap_bfrange_increments_last_utf16_unit():
    # surrogate-pair dst: <D83DDE00> is U+1F600; range adds to the LOW unit
    cm = (b"begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
          b"1 beginbfrange\n<0005> <0006> <D83DDE00>\nendbfrange\nendcmap")
    content = b"BT /F1 8 Tf <00050006> Tj ET"
    assert pdf_text_blocks(_cmap_pdf(cm, content)) == ["\U0001F600\U0001F601"]


def test_cmap_flate_compressed_stream():
    import zlib

    comp = zlib.compress(_CMAP_2B)
    pdf = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Resources << /Font << /F1 2 0 R >> >> >>\nendobj\n"
        b"2 0 obj\n<< /Type /Font /ToUnicode 3 0 R >>\nendobj\n"
        b"3 0 obj\n<< /Filter /FlateDecode >>\nstream\n" + comp +
        b"\nendstream\nendobj\n"
        b"4 0 obj\n<< >>\nstream\nBT /F1 12 Tf <00010002> Tj ET\nendstream\nendobj\n"
    )
    assert pdf_text_blocks(pdf) == ["He"]


def test_no_cmap_pdfs_unchanged():
    # the synthetic corpus (no ToUnicode anywhere) must extract identically
    pdf = make_pdf(["alpha beta gamma delta epsilon zeta eta theta"])
    assert pdf_text_blocks(pdf) == ["alpha beta gamma delta epsilon zeta eta theta"]


# --------------------------------------------------------------------------
# object streams / compressed-xref PDFs (ISO 32000 §7.5.7)
# --------------------------------------------------------------------------

_OBJSTM_PARAS = [
    "hello world this is a compressed xref pdf whose font dict lives "
    "inside an object stream with enough words to wrap across lines",
    "second paragraph 日本語テキスト mixed unicode content here",
]


def test_objstm_pdf_golden():
    """The ObjStm-packed synthetic PDF extracts BYTE-IDENTICALLY to its
    plain make_pdf equivalent: the catalog/pages/page/font objects are
    only reachable through expand_object_streams, and the 2-byte CMap
    codes decode through the ToUnicode map the ObjStm carries a
    reference to."""
    from rust_paddle_ocr_ray.sources.synth import make_pdf_objstm

    assert (pdf_text_blocks(make_pdf_objstm(_OBJSTM_PARAS))
            == pdf_text_blocks(make_pdf(_OBJSTM_PARAS)))


def test_objstm_expansion_is_load_bearing():
    """Without the expansion the font's ToUnicode CMap is unreachable
    (the font dict exists only inside the FlateDecode'd ObjStm), so the
    2-byte hex codes fall back to the plain Latin-1 byte decode —
    NUL-interleaved garbage.  Proves the golden actually gates the
    ObjStm walk rather than passing vacuously."""
    from rust_paddle_ocr_ray.functions import pdf as P
    from rust_paddle_ocr_ray.sources.synth import make_pdf_objstm

    data = make_pdf_objstm(_OBJSTM_PARAS)
    exp = P.expand_object_streams(data)
    assert b"/ToUnicode 6 0 R" in exp and b"/Type /Catalog" in exp
    fonts_noexp = P._font_cmaps(data)  # no expansion: font unresolvable
    blocks_noexp = [
        t for content in P.iter_content_streams(data)
        for body in P._iter_delimited(content, b"BT", b"ET", word=True)
        if (t := P._block_text(body, fonts_noexp or None).strip())
    ]
    assert blocks_noexp != pdf_text_blocks(data)
    assert "\x00" in blocks_noexp[0]  # Latin-1 over UTF-16BE-ish codes


def test_structural_streams_excluded_from_text_scan():
    """A BT..ET byte sequence INSIDE an ObjStm (e.g. a string operand
    of a packed dict) or an XRef stream must never surface as a text
    block — structural streams are excluded from the content scan."""
    from rust_paddle_ocr_ray.functions.pdf import iter_content_streams

    objstm_body = b"11 0\n<< /Fake (BT (sneaky) Tj ET) >>\n"
    pdf = (b"%PDF-1.5\n"
           b"7 0 obj\n<< /Type /ObjStm /N 1 /First 5 /Length "
           + str(len(objstm_body)).encode() + b" >>\nstream\n"
           + objstm_body + b"\nendstream\nendobj\n"
           b"8 0 obj\n<< /Type /XRef /Size 2 /W [1 2 1] /Length 8 >>\n"
           b"stream\nBT 12 ET\nendstream\nendobj\n")
    assert list(iter_content_streams(pdf)) == []
    assert pdf_text_blocks(pdf) == []


def test_objstm_corrupt_degrades():
    """Corrupt / malformed ObjStm payloads degrade to no expansion (and
    never raise), per the module's no-garbage contract."""
    from rust_paddle_ocr_ray.functions.pdf import expand_object_streams

    # truncated flate body
    bad = (b"%PDF-1.5\n7 0 obj\n<< /Type /ObjStm /N 2 /First 10 "
           b"/Filter /FlateDecode /Length 4 >>\nstream\n\x78\x9c\x01\x02"
           b"\nendstream\nendobj\n")
    assert expand_object_streams(bad) == b""
    assert pdf_text_blocks(bad) == []
    # header shorter than /N pairs
    short = (b"%PDF-1.5\n7 0 obj\n<< /Type /ObjStm /N 3 /First 4 >>\n"
             b"stream\n1 0\n<< >>\nendstream\nendobj\n")
    assert expand_object_streams(short) == b""
    # /First beyond the stream
    far = (b"%PDF-1.5\n7 0 obj\n<< /Type /ObjStm /N 1 /First 9999 >>\n"
           b"stream\n1 0\n<< >>\nendstream\nendobj\n")
    assert expand_object_streams(far) == b""


def test_objstm_spans_follow_detect_contract():
    """extract_pdf_spans over an ObjStm PDF emits the same spans as
    over the equivalent plain PDF (the detect-stage contract is decode
    -layout-agnostic)."""
    from rust_paddle_ocr_ray.sources.synth import make_pdf_objstm

    a = extract_pdf_spans(make_pdf_objstm(_OBJSTM_PARAS), CLI_CONFIG)
    b = extract_pdf_spans(make_pdf(_OBJSTM_PARAS), CLI_CONFIG)
    assert a == b and len(a) >= 1


def test_objstm_large_corpus_offsets():
    """Regression (r5 review): 2-byte xref-stream offset fields
    overflowed once content passed 64 KiB; W [1 4 1] must carry a
    low-redundancy corpus well past that, and the text must still
    round-trip vs the plain layout."""
    import numpy as np

    from rust_paddle_ocr_ray.sources.synth import make_pdf_objstm

    rng = np.random.RandomState(7)
    words = ["".join(chr(97 + c) for c in rng.randint(0, 26, 8))
             for _ in range(12_000)]
    paras = [" ".join(words[i:i + 60]) for i in range(0, len(words), 60)]
    payload = make_pdf_objstm(paras)
    assert len(payload) > 65_535  # the old 2-byte fields cannot hold this
    assert (pdf_text_blocks(payload) == pdf_text_blocks(make_pdf(paras)))


def test_flate_bomb_and_garbage_pdfs_degrade():
    """A high-expansion Flate stream with no text operators and pure
    garbage bytes must degrade to empty/ValueError quickly, never hang
    or leak a foreign exception."""
    import time
    import zlib

    from rust_paddle_ocr_ray.functions.pdf import pdf_text_blocks

    bomb = zlib.compress(b"A" * 50_000_000, 9)
    pdf = (b"%PDF-1.4\n1 0 obj\n<< /Filter /FlateDecode /Length "
           + str(len(bomb)).encode() + b" >>\nstream\n" + bomb
           + b"\nendstream\nendobj\ntrailer\n%%EOF")
    t0 = time.time()
    try:
        out = pdf_text_blocks(pdf)
        assert out == []
    except ValueError:
        pass
    assert time.time() - t0 < 10

    for junk in (b"", b"%PDF-", b"\x00" * 4096, b"%PDF-1.4" + b"\xff" * 10_000):
        try:
            pdf_text_blocks(junk)
        except ValueError:
            pass


def test_closer_free_floods_parse_in_linear_time():
    """Adversarial stream content full of BT / '/Font<<' / beginbfchar
    openers with NO closers made the lazy-dotall regexes quadratic
    (65 s per 200 KB); the find-loop rewrites must stay linear."""
    import time

    from rust_paddle_ocr_ray.functions.pdf import pdf_text_blocks

    def make_pdf(content: bytes) -> bytes:
        return (b"%PDF-1.4\n1 0 obj\n<< /Length " + str(len(content)).encode()
                + b" >>\nstream\n" + content
                + b"\nendstream\nendobj\ntrailer\n%%EOF")

    for content in (b"BT " * 60_000, b"/Font<< " * 40_000,
                    b"beginbfchar " * 40_000, b"BT ET" + b"XBTX " * 50_000):
        t0 = time.time()
        pdf_text_blocks(make_pdf(content))
        assert time.time() - t0 < 5

    # bfrange items with unclosed '[' arrays inside a real ToUnicode
    # object (the _bfrange_items no-more-bracket memo)
    import zlib

    cm = (b"begincodespacerange <00> <FF> endcodespacerange\n"
          b"beginbfrange\n" + b"<00> <01> [" * 30_000 + b"\nendbfrange")
    z = zlib.compress(cm)
    pdf = (b"%PDF-1.4\n"
           b"1 0 obj\n<< /Font << /F1 2 0 R >> >>\nendobj\n"
           b"2 0 obj\n<< /ToUnicode 3 0 R >>\nendobj\n"
           b"3 0 obj\n<< /Filter /FlateDecode /Length "
           + str(len(z)).encode() + b" >>\nstream\n" + z
           + b"\nendstream\nendobj\n"
           b"4 0 obj\n<< /Length 20 >>\nstream\nBT /F1 Tf (hi) Tj ET\n"
           b"endstream\nendobj\ntrailer\n%%EOF")
    t0 = time.time()
    assert pdf_text_blocks(pdf) == ["hi"]
    assert time.time() - t0 < 5

    # 20k distinct font refs: object resolution must amortize through
    # the one-pass object index, not re.search per ref (was 181 s)
    fonts = b"".join(b"/Font<< /F%d %d 0 R >>\n" % (i, i + 100)
                     for i in range(20_000))
    flood = (b"%PDF-1.4\n" + fonts
             + b"4 0 obj\n<< /Length 20 >>\nstream\nBT (hi) Tj ET\n"
               b"endstream\nendobj\ntrailer\n%%EOF")
    t0 = time.time()
    assert pdf_text_blocks(flood) == ["hi"]
    assert time.time() - t0 < 5
