"""Non-HTML payload routing: magic-byte sniffing + minimal pure-Python
PDF text extraction for the detection stage.

``BASELINE.json`` north_rule names "PDF/layout parse" and north_star
"DB-style text-region detection on image/PDF-bearing pages"; real
crawls are full of PDFs, and round 1 fed them through the UTF-8 html
decoder into garbage segmentation.  This module is the payload router
the detect stage (stages/detect.py) now calls first.

The PDF parser is public-format knowledge only (PDF 1.x / ISO 32000):

* content streams are located via the ``stream``/``endstream``
  keywords; FlateDecode is undone with stdlib ``zlib`` (the only
  filter in scope — no external PDF library exists in this
  environment); already-plain streams pass through;
* text is recovered from the text-showing operators (``Tj``, ``'``,
  ``"``, ``TJ``) inside ``BT``...``ET`` text objects, with literal
  strings (incl. balanced parens, all escape forms, octal) and hex
  strings (incl. UTF-16BE with BOM) decoded per spec;
* any text-positioning operator (``Td``/``TD``/``T*``/``Tm``) between
  shows becomes a line break; one BT..ET object = one candidate block.

Everything else (xref, page tree, fonts, encodings beyond the above)
is intentionally out of scope: the parser covers the common text-PDF
subset and degrades to zero spans on anything it cannot parse —
mirroring how the reference's det model simply finds no boxes on an
unreadable raster (/root/reference/src/det.rs:351-360).

Reference analog: the det model path on image-bearing inputs,
/root/reference/src/det.rs:176-360.
"""

from __future__ import annotations

import re
import zlib

# --------------------------------------------------------------------------
# payload sniffing
# --------------------------------------------------------------------------

_IMAGE_MAGICS = (
    b"\x89PNG\r\n\x1a\n",
    b"\xff\xd8\xff",  # JPEG
    b"GIF87a",
    b"GIF89a",
)


def sniff_payload(data: bytes) -> str:
    """Classify a page payload: ``"pdf"`` | ``"image"`` | ``"text"``
    (text = html or plain text; the default route)."""
    if not data:
        return "text"
    if data[:4] == b"%PDF":
        return "pdf"
    for magic in _IMAGE_MAGICS:
        if data.startswith(magic):
            return "image"
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return "image"
    return "text"


# --------------------------------------------------------------------------
# PDF string decoding
# --------------------------------------------------------------------------

_ESCAPES = {ord("n"): 0x0A, ord("r"): 0x0D, ord("t"): 0x09,
            ord("b"): 0x08, ord("f"): 0x0C}


def _scan_literal(buf: bytes, i: int) -> tuple[bytes, int]:
    """Scan a literal string starting at ``buf[i] == '('``; returns the
    unescaped raw bytes and the index just past the closing paren.
    Handles balanced unescaped parens, the \\n \\r \\t \\b \\f \\( \\) \\\\
    escapes, 1-3 digit octal escapes and line continuations."""
    out = bytearray()
    depth = 1
    i += 1
    n = len(buf)
    while i < n:
        c = buf[i]
        if c == 0x5C and i + 1 < n:  # backslash
            d = buf[i + 1]
            if d in _ESCAPES:
                out.append(_ESCAPES[d])
                i += 2
            elif d in (0x28, 0x29, 0x5C):
                out.append(d)
                i += 2
            elif 0x30 <= d <= 0x37:  # octal, up to 3 digits
                j = i + 1
                val = 0
                while j < n and j < i + 4 and 0x30 <= buf[j] <= 0x37:
                    val = val * 8 + (buf[j] - 0x30)
                    j += 1
                out.append(val & 0xFF)
                i = j
            elif d in (0x0A, 0x0D):  # line continuation
                i += 2
                if d == 0x0D and i < n and buf[i] == 0x0A:
                    i += 1
            else:  # lone backslash: drop it, keep the char
                out.append(d)
                i += 2
        elif c == 0x28:
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                return bytes(out), i + 1
            out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    return bytes(out), n


def _pdf_text(raw: bytes) -> str:
    """PDF string bytes -> text: UTF-16BE when BOM'd, else Latin-1
    (the identity superset of PDFDocEncoding's printable range)."""
    if raw[:2] == b"\xfe\xff":
        return raw[2:].decode("utf-16-be", errors="replace")
    return raw.decode("latin-1")


# --------------------------------------------------------------------------
# content-stream tokenizing
# --------------------------------------------------------------------------

_STREAM_RE = re.compile(rb"stream\r?\n")
_BT_RE = re.compile(rb"\bBT\b(.*?)\bET\b", re.S)
_OP_RE = re.compile(rb"[A-Za-z'\"*]+")
_SHOW_OPS = (b"Tj", b"TJ")
_NEWLINE_SHOW_OPS = (b"'", b'"')
_NEWLINE_OPS = (b"Td", b"TD", b"T*", b"Tm")


def iter_content_streams(data: bytes):
    """Yield every decoded stream in the file that contains a BT text
    object (zlib-decompressed when FlateDecode'd, raw otherwise)."""
    pos = 0
    while True:
        m = _STREAM_RE.search(data, pos)
        if m is None:
            return
        start = m.end()
        end = data.find(b"endstream", start)
        if end == -1:
            return
        raw = data[start:end]
        pos = end + len(b"endstream")
        # Flate first, on the UNSTRIPPED bytes: the spec's EOL before
        # `endstream` is not part of the stream, but compressed data may
        # itself end in 0x0D/0x0A, so guessing which bytes to strip can
        # eat a real data byte (~1/256 of streams).  decompressobj stops
        # exactly at the deflate stream end and leaves any trailing EOL
        # in unused_data — no stripping needed on this path.
        try:
            d = zlib.decompressobj()
            content = d.decompress(raw)
            if not d.eof:
                raise zlib.error("truncated deflate stream")
        except zlib.error:
            # Not Flate (or truncated): pass the bytes through raw, with
            # the spec EOL separator stripped.
            if raw.endswith(b"\r\n"):
                raw = raw[:-2]
            elif raw.endswith((b"\n", b"\r")):
                raw = raw[:-1]
            content = raw
        if b"BT" in content:
            yield content


def _block_text(region: bytes) -> str:
    """One BT..ET region -> its shown text, positioning ops as newlines."""
    parts: list[str] = []
    pend: list[str] = []
    n = len(region)
    i = 0

    def newline() -> None:
        if parts and not parts[-1].endswith("\n"):
            parts.append("\n")

    while i < n:
        c = region[i]
        if c == 0x28:  # ( literal string
            raw, i = _scan_literal(region, i)
            pend.append(_pdf_text(raw))
        elif c == 0x3C:  # < hex string or << dict
            if region[i:i + 2] == b"<<":
                depth = 1
                i += 2
                while i < n and depth:
                    two = region[i:i + 2]
                    if two == b"<<":
                        depth += 1
                        i += 2
                    elif two == b">>":
                        depth -= 1
                        i += 2
                    else:
                        i += 1
            else:
                j = region.find(b">", i + 1)
                if j == -1:
                    break
                hx = re.sub(rb"\s", b"", region[i + 1:j])
                if len(hx) % 2:
                    hx += b"0"
                try:
                    pend.append(_pdf_text(bytes.fromhex(hx.decode("ascii"))))
                except (ValueError, UnicodeDecodeError):
                    pass
                i = j + 1
        else:
            m = _OP_RE.match(region, i)
            if m is None:
                i += 1
                continue
            op = m.group()
            i = m.end()
            if op in _SHOW_OPS:
                parts.extend(pend)
                pend.clear()
            elif op in _NEWLINE_SHOW_OPS:
                newline()
                parts.extend(pend)
                pend.clear()
            elif op in _NEWLINE_OPS:
                newline()
                pend.clear()
    return "".join(parts)


def pdf_text_blocks(data: bytes) -> list[str]:
    """All non-empty text blocks of a PDF payload, in stream order."""
    blocks: list[str] = []
    for content in iter_content_streams(data):
        for m in _BT_RE.finditer(content):
            t = _block_text(m.group(1)).strip()
            if t:
                blocks.append(t)
    return blocks


# --------------------------------------------------------------------------
# span construction (the detect-stage contract)
# --------------------------------------------------------------------------

def extract_pdf_spans(data: bytes, cfg) -> list[dict]:
    """PDF payload -> span dicts in the exact shape ``segment_page``
    emits for html (stages/detect.SPANS_SCHEMA): one span per BT..ET
    text block that clears the same density-score threshold and
    min-size filter as html blocks.  Offsets index into the virtual
    page text (blocks joined by newlines) — there is no html string to
    slice, so ``raw`` carries the block text itself and the tight
    interior spans all of it."""
    from .html import block_score

    spans: list[dict] = []
    offset = 0
    line = 0
    order = 0
    for text in pdf_text_blocks(data):
        vis = sum(len(p) for p in text.split())
        score = block_score(vis, 0, False, cfg)
        nl = text.count("\n")
        if score > cfg.threshold and vis > cfg.min_box_size:
            spans.append(
                {
                    "block_id": order,
                    "start": offset,
                    "end": offset + len(text),
                    "tstart": offset,
                    "tend": offset + len(text),
                    "line_start": line,
                    "line_end": line + nl,
                    "tag": "pdf",
                    "depth": 1,
                    "order": order,
                    "score": float(score),
                    "raw": text,
                }
            )
            order += 1
            if order >= cfg.max_spans_per_page:
                break
        offset += len(text) + 1
        line += nl + 1
    return spans


def image_sentinel_span() -> dict:
    """One marker span for an image payload: the page is media-bearing
    (downstream multimodal stages pick it up via ``tag == 'image'``)
    but contributes no text."""
    return {
        "block_id": 0, "start": 0, "end": 0, "tstart": 0, "tend": 0,
        "line_start": 0, "line_end": 0, "tag": "image", "depth": 0,
        "order": 0, "score": 0.0, "raw": "",
    }
