"""Non-HTML payload routing: magic-byte sniffing + minimal pure-Python
PDF text extraction for the detection stage.

``BASELINE.json`` north_rule names "PDF/layout parse" and north_star
"DB-style text-region detection on image/PDF-bearing pages"; real
crawls are full of PDFs, and round 1 fed them through the UTF-8 html
decoder into garbage segmentation.  This module is the payload router
the detect stage (stages/detect.py) now calls first.

The PDF parser is public-format knowledge only (PDF 1.x / ISO 32000):

* content streams are located via the ``stream``/``endstream``
  keywords; the stream dict's declared /Filter chain is applied in
  order — FlateDecode (stdlib ``zlib``), ASCIIHexDecode,
  ASCII85Decode, RunLengthDecode and LZWDecode (ISO 32000 §7.4.4,
  implemented here) are in scope; unsupported filters (DCT, JBIG2,
  CCITT, JPX, Crypt) and corrupt streams degrade to zero text blocks;
  already-plain streams pass through;
* text is recovered from the text-showing operators (``Tj``, ``'``,
  ``"``, ``TJ``) inside ``BT``...``ET`` text objects, with literal
  strings (incl. balanced parens, all escape forms, octal) and hex
  strings (incl. UTF-16BE with BOM) decoded per spec;
* any text-positioning operator (``Td``/``TD``/``T*``/``Tm``) between
  shows becomes a line break; one BT..ET object = one candidate block.

* object streams (ISO 32000 §7.5.7, ``/Type /ObjStm``) are EXPANDED:
  the stream decodes through the same filter machinery, its
  ``/N``/``/First`` header (objnum/offset integer pairs) is walked,
  and every packed object is surfaced as a synthetic ``N 0 obj``
  body so the font/ToUnicode resolution and any other object-level
  scan see objects that compressed-xref ("PDF 1.5+") writers hide
  inside ObjStm.  Content streams themselves are never inside an
  ObjStm (the spec forbids stream objects there) and keep being
  found by the linear scan; ``/Type /ObjStm`` and ``/Type /XRef``
  streams are structural and excluded from the text scan.

Everything else (the xref TABLE itself — this parser scans linearly
and never needs byte offsets — page tree, fonts, encodings beyond
the above) is intentionally out of scope: the parser covers the
common text-PDF subset and degrades to zero spans on anything it
cannot parse — mirroring how the reference's det model simply finds
no boxes on an unreadable raster (/root/reference/src/det.rs:351-360).

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
_FILTER_RE = re.compile(rb"/Filter\s*(?:\[([^\]]*)\]|/([A-Za-z0-9]+))")
_NAME_RE = re.compile(rb"/([A-Za-z0-9]+)")
_OP_RE = re.compile(rb"[A-Za-z'\"*]+")


def _is_word_byte(c: int) -> bool:
    return (48 <= c <= 57) or (65 <= c <= 90) or (97 <= c <= 122) or c == 95


def _find_word(data: bytes, word: bytes, start: int) -> int:
    """Leftmost ``\\bword\\b`` at or after ``start`` (bytes \\b)."""
    i = data.find(word, start)
    while i != -1:
        if ((i == 0 or not _is_word_byte(data[i - 1]))
                and (i + len(word) >= len(data)
                     or not _is_word_byte(data[i + len(word)]))):
            return i
        i = data.find(word, i + 1)
    return -1


def _iter_delimited(data: bytes, start: bytes, end: bytes,
                    word: bool = False):
    """Exact semantics of ``finditer(rb"START(.*?)END", re.S)`` in
    guaranteed-linear time, yielding each inner group.  The lazy
    regex form rescans to EOF at every START with no following END —
    adversarial PDFs like ``b"BT " * 60k`` (no ET) stalled the parse
    65 s; str.find makes the same walk O(n).  Leftmost-match
    equivalence: if the earliest remaining START has no END after it,
    no later START can have one either, so stopping is exact."""
    find_s = (lambda i: _find_word(data, start, i)) if word \
        else (lambda i: data.find(start, i))
    find_e = (lambda i: _find_word(data, end, i)) if word \
        else (lambda i: data.find(end, i))
    i = 0
    while True:
        a = find_s(i)
        if a < 0:
            return
        b = find_e(a + len(start))
        if b < 0:
            return
        yield data[a + len(start):b]
        i = b + len(end)
_SHOW_OPS = (b"Tj", b"TJ")
_NEWLINE_SHOW_OPS = (b"'", b'"')
_NEWLINE_OPS = (b"Td", b"TD", b"T*", b"Tm")


def _strip_eol(raw: bytes) -> bytes:
    """Strip the spec EOL separator before ``endstream``."""
    if raw.endswith(b"\r\n"):
        return raw[:-2]
    if raw.endswith((b"\n", b"\r")):
        return raw[:-1]
    return raw


def _flate(raw: bytes) -> bytes:
    """FlateDecode on the UNSTRIPPED bytes: the spec's EOL before
    ``endstream`` is not part of the stream, but compressed data may
    itself end in 0x0D/0x0A, so guessing which bytes to strip can eat a
    real data byte (~1/256 of streams).  decompressobj stops exactly at
    the deflate stream end and leaves any trailing EOL in unused_data —
    no stripping needed."""
    d = zlib.decompressobj()
    content = d.decompress(raw)
    if not d.eof:
        raise zlib.error("truncated deflate stream")
    return content


def _asciihex(raw: bytes) -> bytes:
    body = raw.split(b">", 1)[0]
    hx = re.sub(rb"\s", b"", body)
    if len(hx) % 2:
        hx += b"0"
    return bytes.fromhex(hx.decode("ascii"))


def _ascii85(raw: bytes) -> bytes:
    import base64

    body = re.sub(rb"\s", b"", raw)
    if body.startswith(b"<~"):
        body = body[2:]
    end = body.find(b"~>")
    if end != -1:
        body = body[:end]
    return base64.a85decode(body)


def _runlength(raw: bytes) -> bytes:
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        l = raw[i]
        if l == 128:
            break
        if l < 128:
            out += raw[i + 1 : i + 2 + l]
            i += 2 + l
        else:
            out += raw[i + 1 : i + 2] * (257 - l)
            i += 2
    return bytes(out)


def _lzw(raw: bytes) -> bytes:
    """PDF LZWDecode (ISO 32000 §7.4.4): MSB-first variable-width codes
    (9→12 bits), clear=256, EOD=257, 'early change' code-width bump."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    width = 9
    prev: bytes | None = None
    acc = bits = 0
    for byte in raw:
        acc = (acc << 8) | byte
        bits += 8
        while bits >= width:
            code = (acc >> (bits - width)) & ((1 << width) - 1)
            bits -= width
            if code == 256:
                table = [bytes([i]) for i in range(256)] + [b"", b""]
                width = 9
                prev = None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            else:
                entry = prev + prev[:1]
                table.append(entry)
            out += entry
            prev = entry
            if len(table) >= (1 << width) - 1 and width < 12:  # early change
                width += 1
    return bytes(out)


#: supported stream filters, applied in declared order.  Flate runs on
#: unstripped bytes (self-delimiting); the ASCII family ignores
#: whitespace so stripping is moot; RunLength/LZW self-delimit via EOD.
_FILTERS = {
    b"FlateDecode": _flate, b"Fl": _flate,
    b"ASCIIHexDecode": _asciihex, b"AHx": _asciihex,
    b"ASCII85Decode": _ascii85, b"A85": _ascii85,
    b"RunLengthDecode": _runlength, b"RL": _runlength,
    b"LZWDecode": _lzw, b"LZW": _lzw,
}


#: sentinel filter name: the stream declares DecodeParms this decoder
#: cannot honor (Predictor > 1, LZW EarlyChange 0) — decoding with the
#: raw filter would emit garbage text, so the caller degrades instead
_UNSUPPORTED = b"__unsupported_parms__"

#: how far back a stream's own dict may start (dicts are tens of bytes;
#: this bounds the backward nesting scan on malformed input)
_DICT_SCAN_MAX = 8192


def _stream_dict(data: bytes, stream_kw_at: int) -> bytes | None:
    """The ``<< ... >>`` dict IMMEDIATELY preceding the ``stream``
    keyword (ISO 32000 §7.3.8: every stream is dict + ``stream``), or
    None when no well-formed dict sits there.  Anchoring the /Filter
    search to this dict — instead of a flat lookback window — stops a
    /Filter entry of an unrelated earlier (non-stream) object dict from
    being attributed to a filterless stream (which would decode with
    the wrong filter and silently drop text the try-flate-else-raw
    heuristic recovers)."""
    j = stream_kw_at
    while j > 0 and data[j - 1] in (0x20, 0x09, 0x0D, 0x0A):
        j -= 1
    if data[j - 2:j] != b">>":
        return None
    depth = 0
    i = j
    floor = max(0, j - _DICT_SCAN_MAX)
    while i - 2 >= floor:
        two = data[i - 2:i]
        if two == b">>":
            depth += 1
            i -= 2
        elif two == b"<<":
            depth -= 1
            i -= 2
            if depth == 0:
                return data[i:j]
        else:
            i -= 1
    return None


def _stream_filters(data: bytes, stream_kw_at: int) -> list[bytes] | None:
    """Filter-name chain from the stream's OWN dict, or None when the
    dict is absent/malformed or carries no /Filter entry (plain stream
    -> legacy try-flate-else-raw heuristic).  Streams whose DecodeParms
    declares a Predictor > 1 or LZW EarlyChange 0 return the
    ``_UNSUPPORTED`` sentinel so the caller degrades to zero text
    instead of decoding garbage."""
    d = _stream_dict(data, stream_kw_at)
    if d is None:
        return None
    if re.search(rb"/(?:DecodeParms|DP)\b", d) is not None:
        pm = re.search(rb"/Predictor\s+(\d+)", d)
        if pm is not None and int(pm.group(1)) > 1:
            return [_UNSUPPORTED]
        if re.search(rb"/EarlyChange\s+0\b", d) is not None:
            return [_UNSUPPORTED]
    m = _FILTER_RE.search(d)
    if m is None:
        return None
    if m.group(2) is not None:
        return [m.group(2)]
    return _NAME_RE.findall(m.group(1))


#: stream-dict /Type values that are file STRUCTURE, not page content:
#: their decoded bytes must never be scanned for BT text objects (an
#: ObjStm packs arbitrary dicts whose strings may contain "BT"; an
#: unpredicted XRef stream is binary that can alias any byte pair)
_STRUCTURAL_TYPE_RE = re.compile(rb"/Type\s*/(?:ObjStm|XRef)\b")
_OBJSTM_TYPE_RE = re.compile(rb"/Type\s*/ObjStm\b")
_OBJSTM_N_RE = re.compile(rb"/N\s+(\d+)")
_OBJSTM_FIRST_RE = re.compile(rb"/First\s+(\d+)")
_INT_RE = re.compile(rb"\d+")
_OBJSTM_MAX_OBJECTS = 1 << 16  # bounds the header walk on hostile input


def _decode_stream_body(data: bytes, stream_kw_at: int,
                        raw: bytes) -> bytes | None:
    """Decode one stream's raw bytes through its declared /Filter chain
    (None on unsupported filter / corrupt data — the caller degrades);
    without a visible /Filter entry the legacy heuristic applies: try
    Flate, else pass bytes through raw."""
    chain = _stream_filters(data, stream_kw_at)
    if chain is not None:
        if not all(f in _FILTERS for f in chain):
            return None  # unsupported filter: degrade
        content = raw
        try:
            for f in chain:
                content = _FILTERS[f](content)
        except Exception:
            return None  # corrupt stream: degrade
        return content
    try:
        return _flate(raw)
    except zlib.error:
        return _strip_eol(raw)


def _iter_raw_streams(data: bytes):
    """(stream-keyword offset, raw bytes, own dict or None) for every
    ``stream``/``endstream`` pair in file order."""
    pos = 0
    while True:
        m = _STREAM_RE.search(data, pos)
        if m is None:
            return
        start = m.end()
        end = data.find(b"endstream", start)
        if end == -1:
            return
        pos = end + len(b"endstream")
        yield m.start(), data[start:end], _stream_dict(data, m.start())


def expand_object_streams(data: bytes) -> bytes:
    """Synthetic ``N 0 obj ... endobj`` bytes for every object packed
    inside a ``/Type /ObjStm`` stream (ISO 32000 §7.5.7), or ``b""``.

    The decoded ObjStm starts with ``/N`` pairs of integers (object
    number, byte offset relative to ``/First``); each object's body is
    the slice between consecutive offsets.  Appending the expansion to
    the original file bytes makes the packed objects visible to every
    regex-level object scan (``_object_body``, the /Font resource
    walk) exactly as if the writer had emitted them uncompressed —
    which is all this parser ever needs, since it scans linearly and
    ignores xref offsets.  Malformed headers/streams degrade to
    ``b""`` per the module's no-garbage contract.  Stream objects
    cannot appear inside an ObjStm (spec), so the expansion never
    introduces new content streams."""
    out = bytearray()
    for kw_at, raw, d in _iter_raw_streams(data):
        if d is None or _OBJSTM_TYPE_RE.search(d) is None:
            continue
        nm = _OBJSTM_N_RE.search(d)
        fm = _OBJSTM_FIRST_RE.search(d)
        if nm is None or fm is None:
            continue
        n, first = int(nm.group(1)), int(fm.group(1))
        if not (0 < n <= _OBJSTM_MAX_OBJECTS) or first <= 0:
            continue
        content = _decode_stream_body(data, kw_at, raw)
        if content is None or first > len(content):
            continue
        ints = _INT_RE.findall(content[:first])
        if len(ints) < 2 * n:
            continue
        pairs = [(int(ints[2 * i]), int(ints[2 * i + 1])) for i in range(n)]
        for i, (num, off) in enumerate(pairs):
            stop = pairs[i + 1][1] if i + 1 < n else len(content) - first
            if not (0 <= off <= stop <= len(content) - first):
                continue
            body = content[first + off:first + stop].strip()
            out += (str(num).encode("ascii") + b" 0 obj\n" + body
                    + b"\nendobj\n")
    return bytes(out)


def iter_content_streams(data: bytes):
    """Yield every decoded stream in the file that contains a BT text
    object.  The declared /Filter chain (Flate, ASCIIHex, ASCII85,
    RunLength, LZW — incl. chains like [/ASCII85Decode /FlateDecode])
    is applied in order; a stream with an unsupported filter
    (DCT/JBIG2/...) or a failing decode degrades to zero text blocks,
    mirroring the reference's no-boxes result on unreadable input
    (src/det.rs:351-360).  Without a visible /Filter entry the legacy
    heuristic applies: try Flate, else pass bytes through raw.
    Structural streams (``/Type /ObjStm``, ``/Type /XRef``) are
    skipped — they pack dicts / xref rows, not page content."""
    for kw_at, raw, d in _iter_raw_streams(data):
        if d is not None and _STRUCTURAL_TYPE_RE.search(d) is not None:
            continue
        content = _decode_stream_body(data, kw_at, raw)
        if content is not None and b"BT" in content:
            yield content


# --------------------------------------------------------------------------
# ToUnicode CMaps (ISO 32000 §9.10.3, Adobe CMap/CIDFont spec TN 5014)
# --------------------------------------------------------------------------

_OBJ_RE_TMPL = rb"(?<![0-9])%d\s+\d+\s+obj\b"
_FONTREF_RE = re.compile(rb"/([A-Za-z0-9]+)\s+(\d+)\s+\d+\s+R")
_TOUNI_RE = re.compile(rb"/ToUnicode\s+(\d+)\s+\d+\s+R")
_HEX_TOK_RE = re.compile(rb"<([0-9A-Fa-f]+)>")
_PDF_WS = b" \t\r\n\f\x0b"


def _iter_font_dicts(data: bytes):
    """Exact semantics of ``finditer(rb"/Font\\s*<<(.*?)>>", re.S)``
    in linear time (same stall class as _iter_delimited: b"/Font<< "
    floods with no ">>" rescanned to EOF per occurrence — 64 s on
    200 KB)."""
    i = 0
    while True:
        a = data.find(b"/Font", i)
        if a < 0:
            return
        j = a + 5
        while j < len(data) and data[j] in _PDF_WS:
            j += 1
        if data[j:j + 2] != b"<<":
            i = a + 1
            continue
        b = data.find(b">>", j + 2)
        if b < 0:
            return
        yield data[j + 2:b]
        i = b + 2
_CMAP_MAX_ENTRIES = 1 << 16  # bound per-font mapping memory
_HEX_DIGITS = frozenset(b"0123456789ABCDEFabcdef")


def _bfrange_items(s: bytes) -> list[tuple[bytes, bytes, bytes]]:
    """Exact semantics of ``findall(rb"<(hex)>\\s*<(hex)>\\s*"
    rb"(\\[[^\\]]*\\]|<hex>)")`` in linear time: the ``\\[[^\\]]*\\]``
    branch rescanned to EOF at every item whose ``[`` has no closer
    (6.7 s on a 360 KB adversarial CMap).  A single no-more-``]`` memo
    makes that failure O(1) after the first scan; matched arrays
    consume to their ``]``, so total scan work stays O(n)."""
    def hex_tok(i: int) -> tuple[bytes, int] | None:
        if i >= len(s) or s[i] != 0x3C:  # '<'
            return None
        j = i + 1
        while j < len(s) and s[j] in _HEX_DIGITS:
            j += 1
        if j == i + 1 or j >= len(s) or s[j] != 0x3E:  # '>'
            return None
        return s[i + 1:j], j + 1

    def skip_ws(i: int) -> int:
        while i < len(s) and s[i] in _PDF_WS:
            i += 1
        return i

    items: list[tuple[bytes, bytes, bytes]] = []
    no_bracket_after = len(s)  # positions >= this have no ']'
    i = 0
    while True:
        a = s.find(b"<", i)
        if a < 0:
            return items
        t1 = hex_tok(a)
        if t1 is None:
            i = a + 1
            continue
        lo, p = t1
        t2 = hex_tok(skip_ws(p))
        if t2 is None:
            i = a + 1
            continue
        hi, p = t2
        p = skip_ws(p)
        if p < len(s) and s[p] == 0x5B:  # '['
            if p >= no_bracket_after:
                i = a + 1
                continue
            b = s.find(b"]", p + 1)
            if b < 0:
                no_bracket_after = min(no_bracket_after, p)
                i = a + 1
                continue
            items.append((lo, hi, s[p:b + 1]))
            i = b + 1
        else:
            t3 = hex_tok(p)
            if t3 is None:
                i = a + 1
                continue
            dst, p2 = t3
            items.append((lo, hi, b"<" + dst + b">"))
            i = p2


_OBJ_HDR_RE = re.compile(rb"(?<![0-9])(\d+)\s+\d+\s+obj\b")


def _object_index(data: bytes) -> dict[int, int]:
    """objnum -> body-start offset of its LEFTMOST ``num gen obj``
    header, built in ONE pass.  Equivalent to per-num ``re.search``
    (every per-num match starts at a generic-header start: the gen
    field alone cannot re-match the two-number template, and the
    digit lookbehind blocks suffix starts), but O(n) total instead of
    O(refs × n) — a 20k-font-ref flood in a 560 KB PDF took 181 s
    through per-ref searches, 0.1 s through the index."""
    idx: dict[int, int] = {}
    for m in _OBJ_HDR_RE.finditer(data):
        idx.setdefault(int(m.group(1)), m.end())
    return idx


def _object_body(data: bytes, num: int,
                 index: dict[int, int] | None = None) -> bytes | None:
    """Bytes between ``<num> <gen> obj`` and its ``endobj``, or None."""
    if index is not None:
        start = index.get(num)
        if start is None:
            return None
    else:
        m = re.search(_OBJ_RE_TMPL % num, data)
        if m is None:
            return None
        start = m.end()
    end = data.find(b"endobj", start)
    return data[start:end if end != -1 else len(data)]


def _decode_stream_in(body: bytes) -> bytes | None:
    """First stream inside an object body, decoded through its declared
    filter chain (same machinery/degradation as iter_content_streams)."""
    m = _STREAM_RE.search(body)
    if m is None:
        return None
    end = body.find(b"endstream", m.end())
    if end == -1:
        return None
    raw = body[m.end():end]
    chain = _stream_filters(body, m.start())
    if chain is not None:
        if not all(f in _FILTERS for f in chain):
            return None
        try:
            for f in chain:
                raw = _FILTERS[f](raw)
            return raw
        except Exception:
            return None
    try:
        return _flate(raw)
    except zlib.error:
        return _strip_eol(raw)


def _utf16be(hx: bytes) -> str:
    try:
        return bytes.fromhex(hx.decode("ascii")).decode("utf-16-be", "replace")
    except (ValueError, UnicodeDecodeError):
        return ""


def _parse_cmap(cm: bytes) -> tuple[int, dict[int, str]] | None:
    """(code byte-width, code -> text) from a ToUnicode CMap stream.
    Width from the codespace range (fallback: first bfchar src token);
    bfrange increments the LAST 16-bit unit of the dst (per spec).
    Only widths 1 and 2 are supported; anything else degrades to None
    (callers fall back to the plain byte decode)."""
    width = None
    cs = next(_iter_delimited(
        cm, b"begincodespacerange", b"endcodespacerange"), None)
    if cs is not None:
        h = _HEX_TOK_RE.search(cs)
        if h is not None:
            width = len(h.group(1)) // 2
    mapping: dict[int, str] = {}
    for body in _iter_delimited(cm, b"beginbfchar", b"endbfchar"):
        toks = _HEX_TOK_RE.findall(body)
        for s, d in zip(toks[0::2], toks[1::2]):
            if width is None:
                width = len(s) // 2
            if len(mapping) >= _CMAP_MAX_ENTRIES:
                break
            mapping[int(s, 16)] = _utf16be(d)
    for lo, hi, dst in (item for rng in _iter_delimited(
                            cm, b"beginbfrange", b"endbfrange")
                        for item in _bfrange_items(rng)):
        lo_i, hi_i = int(lo, 16), int(hi, 16)
        if width is None:
            width = len(lo) // 2
        hi_i = min(hi_i, lo_i + _CMAP_MAX_ENTRIES)
        if dst.startswith(b"["):
            ds = _HEX_TOK_RE.findall(dst)
            for off, d in enumerate(ds):
                if lo_i + off > hi_i or len(mapping) >= _CMAP_MAX_ENTRIES:
                    break
                mapping[lo_i + off] = _utf16be(d)
        else:
            try:
                base = bytes.fromhex(dst[1:-1].decode("ascii"))
            except (ValueError, UnicodeDecodeError):
                continue
            if len(base) < 2 or len(base) % 2:
                continue
            prefix, last = base[:-2], int.from_bytes(base[-2:], "big")
            for c in range(lo_i, hi_i + 1):
                if len(mapping) >= _CMAP_MAX_ENTRIES:
                    break
                u = last + (c - lo_i)
                if u > 0xFFFF:
                    break
                mapping[c] = (prefix + u.to_bytes(2, "big")).decode(
                    "utf-16-be", "replace")
    if width not in (1, 2) or not mapping:
        return None
    return width, mapping


def _font_cmaps(data: bytes) -> dict[bytes, tuple[int, dict[int, str]]]:
    """Resource font name (e.g. b"F1") -> parsed ToUnicode CMap, for
    every font bound by INDIRECT REFERENCE in a ``/Font << ... >>``
    resource dict (the overwhelmingly common form; inline font dicts
    are not resolved — their shows fall back to the byte decode)."""
    out: dict[bytes, tuple[int, dict[int, str]]] = {}
    cmap_cache: dict[int, tuple[int, dict[int, str]] | None] = {}
    obj_idx: dict[int, int] | None = None
    for fd in _iter_font_dicts(data):
        for name, objnum in _FONTREF_RE.findall(fd):
            if name in out:
                continue
            if obj_idx is None:  # one O(n) pass, amortized over all refs
                obj_idx = _object_index(data)
            body = _object_body(data, int(objnum), obj_idx)
            if body is None:
                continue
            tu = _TOUNI_RE.search(body)
            if tu is None:
                continue
            tu_num = int(tu.group(1))
            if tu_num not in cmap_cache:
                tu_body = _object_body(data, tu_num, obj_idx)
                cm = _decode_stream_in(tu_body) if tu_body is not None else None
                cmap_cache[tu_num] = _parse_cmap(cm) if cm is not None else None
            if cmap_cache[tu_num] is not None:
                out[name] = cmap_cache[tu_num]
    return out


def _cmap_decode(raw: bytes, cmap: tuple[int, dict[int, str]]) -> str:
    """Show-string bytes -> text through a ToUnicode CMap: consume
    ``width``-byte codes, emit the mapped text; unmapped codes emit
    nothing (degrade silently, never garbage)."""
    width, mapping = cmap
    return "".join(
        mapping.get(int.from_bytes(raw[i:i + width], "big"), "")
        for i in range(0, len(raw) - width + 1, width)
    )


def _block_text(region: bytes,
                fonts: dict[bytes, tuple[int, dict[int, str]]] | None = None) -> str:
    """One BT..ET region -> its shown text, positioning ops as newlines.
    String operands stay RAW until their show operator executes, so the
    font selected by the preceding ``Tf`` decides the decode: a font
    with a ToUnicode CMap decodes through it, everything else through
    the plain PDF string rules (BOM'd UTF-16BE / Latin-1)."""
    parts: list[str] = []
    pend: list[bytes] = []
    n = len(region)
    i = 0
    last_name: bytes | None = None
    cmap: tuple[int, dict[int, str]] | None = None

    def newline() -> None:
        if parts and not parts[-1].endswith("\n"):
            parts.append("\n")

    def show() -> None:
        for raw in pend:
            parts.append(_cmap_decode(raw, cmap) if cmap is not None
                         else _pdf_text(raw))
        pend.clear()

    while i < n:
        c = region[i]
        if c == 0x28:  # ( literal string
            raw, i = _scan_literal(region, i)
            pend.append(raw)
        elif c == 0x2F:  # / name (a Tf operand candidate)
            m = _NAME_RE.match(region, i)
            if m is not None:
                last_name = m.group(1)
                i = m.end()
            else:
                i += 1
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
                    pend.append(bytes.fromhex(hx.decode("ascii")))
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
                show()
            elif op in _NEWLINE_SHOW_OPS:
                newline()
                show()
            elif op in _NEWLINE_OPS:
                newline()
                pend.clear()
            elif op == b"Tf" and fonts is not None:
                cmap = fonts.get(last_name) if last_name is not None else None
    return "".join(parts)


def pdf_text_blocks(data: bytes) -> list[str]:
    """All non-empty text blocks of a PDF payload, in stream order.
    Object streams are expanded first (appended as synthetic bodies)
    so compressed-xref PDFs — whose font / ToUnicode-bearing dicts
    live inside ``/Type /ObjStm`` — resolve fonts identically to
    their uncompressed equivalents."""
    exp = expand_object_streams(data)
    if exp:
        data = data + b"\n" + exp
    fonts = _font_cmaps(data)
    blocks: list[str] = []
    for content in iter_content_streams(data):
        for body in _iter_delimited(content, b"BT", b"ET", word=True):
            t = _block_text(body, fonts or None).strip()
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


# --------------------------------------------------------------------------
# image header metadata (pure-Python, public container formats)
# --------------------------------------------------------------------------

def _u16le(b: bytes, i: int) -> int:
    return b[i] | (b[i + 1] << 8)


def _u24le(b: bytes, i: int) -> int:
    return b[i] | (b[i + 1] << 8) | (b[i + 2] << 16)


def parse_image_meta(data: bytes) -> tuple[str, int, int] | None:
    """(format, width, height) from a raster payload's header, or None.

    Pure public-format knowledge, no image libraries: PNG IHDR
    (RFC 2083 §4.1.1), JPEG SOFn marker walk (ITU T.81 §B.2.2), GIF
    logical screen descriptor (GIF89a spec §18), WEBP VP8 key-frame /
    VP8L signature / VP8X canvas chunks (public RIFF container docs).
    The analog of the reference's det-model raster ingestion
    (/root/reference/src/det.rs:176-360) reduced to the metadata this
    engine can extract without a decoder."""
    try:
        if data[:8] == b"\x89PNG\r\n\x1a\n":
            # 8-byte sig, 4-byte chunk len, b"IHDR", then w/h u32 BE
            if len(data) >= 24 and data[12:16] == b"IHDR":
                w = int.from_bytes(data[16:20], "big")
                h = int.from_bytes(data[20:24], "big")
                if w and h:
                    return ("png", w, h)
            return None
        if data[:3] == b"\xff\xd8\xff":
            # marker walk to the first SOFn frame header
            i = 2
            n = len(data)
            while i + 9 < n:
                if data[i] != 0xFF:
                    i += 1
                    continue
                marker = data[i + 1]
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    i += 2  # standalone markers, no length
                    continue
                seg_len = (data[i + 2] << 8) | data[i + 3]
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    h = (data[i + 5] << 8) | data[i + 6]
                    w = (data[i + 7] << 8) | data[i + 8]
                    if w and h:
                        return ("jpeg", w, h)
                    return None
                if seg_len < 2:
                    return None
                i += 2 + seg_len
            return None
        if data[:6] in (b"GIF87a", b"GIF89a"):
            if len(data) >= 10:
                w, h = _u16le(data, 6), _u16le(data, 8)
                if w and h:
                    return ("gif", w, h)
            return None
        if data[:4] == b"RIFF" and data[8:12] == b"WEBP" and len(data) >= 30:
            chunk = data[12:16]
            if chunk == b"VP8 " and data[23:26] == b"\x9d\x01\x2a":
                return ("webp", _u16le(data, 26) & 0x3FFF,
                        _u16le(data, 28) & 0x3FFF)
            if chunk == b"VP8L" and data[20] == 0x2F:
                bits = int.from_bytes(data[21:25], "little")
                return ("webp", (bits & 0x3FFF) + 1,
                        ((bits >> 14) & 0x3FFF) + 1)
            if chunk == b"VP8X":
                return ("webp", _u24le(data, 24) + 1, _u24le(data, 27) + 1)
            return None
    except IndexError:
        return None
    return None


def parse_jpeg_exif_orientation(data: bytes) -> int | None:
    """EXIF orientation (1-8) from a JPEG's APP1 segment, or None.

    Pure public-spec parse (CIPA DC-008 Exif 2.x over TIFF 6.0): marker
    walk to the APP1 ``Exif\\0\\0`` payload, TIFF byte-order header
    (II/MM + magic 42), IFD0 entry scan for tag 0x0112 (type SHORT).
    Anything absent, truncated or malformed degrades to None — the
    same no-signal contract as :func:`parse_image_meta`.  The analog
    of the reference's raster ingestion honoring capture orientation
    before the det forward (/root/reference/src/det.rs:176-230)."""
    try:
        if data[:3] != b"\xff\xd8\xff":
            return None
        i, n = 2, len(data)
        while i + 4 <= n:
            if data[i] != 0xFF:
                i += 1
                continue
            marker = data[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            if marker == 0xDA:  # SOS: entropy-coded data, no EXIF past here
                return None
            seg_len = (data[i + 2] << 8) | data[i + 3]
            if seg_len < 2:
                return None
            seg = data[i + 4:i + 2 + seg_len]
            if marker == 0xE1 and seg[:6] == b"Exif\x00\x00":
                t = seg[6:]
                if t[:2] == b"II":
                    bo = "little"
                elif t[:2] == b"MM":
                    bo = "big"
                else:
                    return None
                if int.from_bytes(t[2:4], bo) != 42:
                    return None
                off = int.from_bytes(t[4:8], bo)
                if off + 2 > len(t):
                    return None
                cnt = int.from_bytes(t[off:off + 2], bo)
                for k in range(cnt):
                    e = off + 2 + 12 * k
                    if e + 12 > len(t):
                        return None
                    if int.from_bytes(t[e:e + 2], bo) == 0x0112:
                        if int.from_bytes(t[e + 2:e + 4], bo) != 3:  # SHORT
                            return None
                        v = int.from_bytes(t[e + 8:e + 10], bo)
                        return v if 1 <= v <= 8 else None
                return None
            i += 2 + seg_len
        return None
    except IndexError:
        return None


def image_meta_span(data: bytes) -> dict:
    """Image payload -> one ``tag="image"`` span.  When the container
    header parses, ``raw`` carries a deterministic metadata text
    (``"image <fmt> <w>x<h>"``, plus ``" o<n>"`` when a JPEG declares
    an EXIF orientation — alnum+space only, so recognition decodes it
    losslessly); otherwise the bare sentinel (empty text), mirroring
    the reference's no-boxes result on an unreadable raster
    (src/det.rs:351-360)."""
    meta = parse_image_meta(data)
    span = image_sentinel_span()
    if meta is not None:
        fmt, w, h = meta
        raw = f"image {fmt} {w}x{h}"
        if fmt == "jpeg":
            ori = parse_jpeg_exif_orientation(data)
            if ori is not None:
                raw += f" o{ori}"
        span["raw"] = raw
        span["end"] = span["tend"] = len(raw)
        span["score"] = 255.0
    return span
