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
    assert img_row["extracted_text"] == "" and img_row["n_spans"] == 1
    html_row = out.loc["https://docs.test/web/00000001"]
    assert "htmlword00" in html_row["extracted_text"]
