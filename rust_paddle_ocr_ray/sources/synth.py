"""Deterministic synthetic Common-Crawl-style pages corpus (seed=42).

The golden-fixture generator demanded by FIXTURES.md §2: pages of
exactly the ``BASELINE.json.input_hint`` shape
(url, warc_ts, html, text, lang) built from a fixed template grammar —
link-dense nav/footer boilerplate, 1-N text-dense content blocks,
sub-threshold noise blocks, duplicate urls with differing warc_ts,
pathological heavy pages, empty html, and pages with zero
above-threshold blocks.

Each page is a pure function of ``(seed, i)`` so generation can be
distributed (a `ray.data.range(n).map_batches(pages_batch)` source
scales to any corpus size without a driver-side loop).

This module is test/bench INPUT ONLY — the expected outputs come from
the independent oracle in tests/oracle_impl.py.
"""

from __future__ import annotations

import hashlib
import random
import zlib

import numpy as np
import pyarrow as pa

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

_EPOCH_US = 1735689600_000_000  # 2025-01-01T00:00:00Z in microseconds
_VARIANT_OFFSET = 10_000_019  # id offset for duplicate-url variant content

_EN_WORDS = (
    "stream batch query filter window merge sort join table column row value "
    "data engine cluster shard block worker schedule memory vector hash scan "
    "index spill lineage partition shuffle actor arrow parquet object store "
    "backpressure throughput latency pipeline operator aggregate checkpoint"
).split()

_LATIN_WORDS = (
    "données fenêtre requête colonne mémoire sérialisé déjà très étape "
    "función tabla consulta línea señal años índice número también través "
    "größe straße müssen zwölf fähig übersicht wörter häufig grün schlüssel"
).split()

_ZH_CHARS = "数据查询流处理引擎集群分片块工作节点调度内存向量哈希扫描索引溢出血统分区洗牌执行器箭头对象存储吞吐量延迟管道算子聚合检查点合并排序连接表列行值窗口过滤批"
_JA_KANA = "データクエリストリームエンジンかきくけこさしすせそたちつてとなにぬねのはひふへほまみむめも"

_PUNCT_EN = [". ", ", ", "! ", "? ", "... ", "; ", ": "]
_PUNCT_CJK = ["。", "，", "！", "？", "……", "、", "。。。"]

_ENTITIES = ["&amp;", "&lt;", "&gt;", "&quot;", "&#39;"]


def _rng_for(seed: int, i: int) -> random.Random:
    return random.Random((seed * 1_000_003 + i) & 0xFFFFFFFF)


def _word(rng: random.Random, lang: str) -> str:
    if lang == "zh":
        k = rng.randint(1, 3)
        return "".join(rng.choice(_ZH_CHARS) for _ in range(k))
    if lang == "ja":
        if rng.random() < 0.5:
            k = rng.randint(2, 4)
            return "".join(rng.choice(_JA_KANA) for _ in range(k))
        k = rng.randint(1, 2)
        return "".join(rng.choice(_ZH_CHARS) for _ in range(k))
    if lang == "en":
        return rng.choice(_EN_WORDS)
    return rng.choice(_LATIN_WORDS + _EN_WORDS)


def _sentence(rng: random.Random, lang: str) -> str:
    cjk = lang in ("zh", "ja")
    n = rng.randint(5, 14)
    words = [_word(rng, lang) for _ in range(n)]
    if rng.random() < 0.12:
        words[rng.randrange(len(words))] = rng.choice(_ENTITIES)
    sep = "" if cjk else " "
    body = sep.join(words)
    end = rng.choice(_PUNCT_CJK) if cjk else rng.choice(_PUNCT_EN)
    return body + end.strip() + ("" if cjk else " ")


def _paragraph(rng: random.Random, lang: str, n_sentences: int | None = None) -> str:
    n = n_sentences if n_sentences is not None else rng.randint(2, 5)
    return "".join(_sentence(rng, lang) for _ in range(n)).strip()


def build_page(seed: int, i: int, scale: int = 1) -> dict:
    """One deterministic page row (pure function of seed, i, scale).

    ``scale`` multiplies the content-paragraph count so benchmark corpora
    can match realistic Common-Crawl page weights (tens of KB of html)
    without touching the scale=1 golden fixtures."""
    rng = _rng_for(seed, i)
    r = rng.random()
    lang = "en" if r < 0.4 else ("fr" if r < 0.55 else ("es" if r < 0.65 else (
        "de" if r < 0.7 else ("zh" if r < 0.85 else "ja"))))
    url = f"https://site{i % 50}.example.test/p/{i:07d}"
    ts = _EPOCH_US + i * 7_000_000

    if i % 101 == 100:  # empty-html edge row
        return {"url": url, "warc_ts": ts, "html": b"", "text": "", "lang": lang}

    heavy = i % 97 == 96
    barren = i % 53 == 52  # boilerplate only: zero above-threshold blocks
    n_paras = 300 if heavy else (0 if barren else scale * rng.randint(1, 8))

    nav_links = " | ".join(
        f'<a href="/s/{rng.randint(0, 99)}">{_word(rng, "en")} {_word(rng, "en")}</a>'
        for _ in range(rng.randint(3, 6))
    )
    title = " ".join(_word(rng, lang) for _ in range(rng.randint(2, 5)))
    parts = [
        "<html><head><title>", title, "</title>",
        "<style>body { margin: 0; color: #222; }</style>",
        '<script type="text/javascript">var t = "<p>not content</p>"; if (t.length > 3) { t = t; }</script>',
        "</head>\n<body>\n<header><nav>", nav_links, "</nav></header>\n",
    ]
    paras = []
    for p in range(n_paras):
        para = _paragraph(rng, lang, 2 if heavy else None)
        paras.append(para)
        deco = rng.random()
        if deco < 0.15:
            cut = para.find(" ", 10)
            if cut > 0:
                para = f"{para[:cut]} <b>{para[cut + 1 :]}</b>"
        elif deco < 0.25:
            para = f'{para} <a href="/ref/{rng.randint(0, 999)}">{_word(rng, lang)}</a>'
        tag = "p" if rng.random() < 0.8 else rng.choice(["blockquote", "li", "td"])
        if p == 0 and rng.random() < 0.7:
            h1 = " ".join(_word(rng, lang) for _ in range(rng.randint(4, 9)))
            parts.append(f"<h1>{h1}</h1>\n")
            paras.insert(0, h1)
        if tag == "li":
            parts.append(f"<ul><li>{para}</li></ul>\n")
        elif tag == "td":
            parts.append(f"<table><tr><td>{para}</td></tr></table>\n")
        else:
            parts.append(f"<{tag}>{para}</{tag}>\n")
        if rng.random() < 0.2:
            parts.append(f"<p>{_word(rng, 'en')[:4]}</p>\n")  # sub-threshold noise
        if rng.random() < 0.1:
            parts.append("<br>\n")
    if i % 71 == 70:  # exact min-size boundary probe (6 visible chars > MIN_BOX_SIZE=5)
        parts.append("<p>abcdef</p>\n")
        paras.append("abcdef")
    parts.append(
        f'<footer><a href="/terms">terms of use</a> <a href="/privacy">privacy policy</a>'
        f" <noscript>enable javascript for the full experience</noscript></footer>\n</body></html>"
    )
    html_text = "".join(parts)
    return {
        "url": url,
        "warc_ts": ts,
        "html": html_text.encode("utf-8"),
        "text": " ".join(paras),
        "lang": lang,
    }


def generate_pages(n: int, seed: int = 42, dup_every: int = 20) -> pa.Table:
    """Deterministic pages table; every ``dup_every``-th row duplicates the
    previous row's url with a later warc_ts and a variant html (for D3)."""
    rows = []
    for i in range(n):
        row = build_page(seed, i)
        if dup_every and i % dup_every == 3 and i > 0:
            prev = build_page(seed, i - 1)
            extra = build_page(seed, _VARIANT_OFFSET + i)  # deterministic variant
            row = {
                "url": prev["url"],
                "warc_ts": prev["warc_ts"] + 86_400_000_000,  # +1 day
                "html": extra["html"],
                "text": extra["text"],
                "lang": extra["lang"],
            }
        rows.append(row)
    return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)


def pages_batch(batch: dict, seed: int = 42, dup_every: int = 20, scale: int = 1) -> pa.Table:
    """Distributed source body: map a ``ray.data.range(n)`` id batch to pages."""
    ids = np.asarray(batch["id"], dtype=np.int64)
    rows = []
    for i in ids.tolist():
        row = build_page(seed, i, scale)
        if dup_every and i % dup_every == 3 and i > 0:
            prev = build_page(seed, i - 1, scale)
            extra = build_page(seed, _VARIANT_OFFSET + i, scale)
            row = {
                "url": prev["url"],
                "warc_ts": prev["warc_ts"] + 86_400_000_000,
                "html": extra["html"],
                "text": extra["text"],
                "lang": extra["lang"],
            }
        rows.append(row)
    return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)


def pages_from_documents(batch: pa.Table) -> pa.Table:
    """Deterministically wrap ``documents`` rows (doc_id, text, lang, source)
    into Common-Crawl-style pages so the extraction pipeline can run over
    the driver's test tables.  Pure function of the row (no RNG)."""
    rows = []
    for doc_id, text, lang, source in zip(
        batch["doc_id"].to_pylist(),
        batch["text"].to_pylist(),
        batch["lang"].to_pylist(),
        batch["source"].to_pylist(),
    ):
        words = (text or "").split()
        paras = [" ".join(words[i : i + 25]) for i in range(0, len(words), 25)]
        body = "\n".join(f"<p>{p}.</p>" for p in paras if p)
        html_text = (
            f"<html><head><title>doc {doc_id}</title></head>\n<body>\n"
            f'<nav><a href="/">home page</a> | <a href="/{source}">{source} index</a></nav>\n'
            f"{body}\n"
            f'<footer><a href="/terms">terms of use</a></footer>\n</body></html>'
        )
        rows.append(
            {
                "url": f"https://docs.test/{source}/{doc_id:08d}",
                "warc_ts": _EPOCH_US + int(doc_id) * 1_000_000,
                "html": html_text.encode("utf-8"),
                "text": text or "",
                "lang": lang or "en",
            }
        )
    return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)


# ---------------------------------------------------------------------------
# deterministic PDF payloads (for the non-HTML detection route)
# ---------------------------------------------------------------------------

def _pdf_string(line: str) -> bytes:
    """One PDF string operand: escaped literal when Latin-1-encodable,
    else a BOM'd UTF-16BE hex string (both per ISO 32000 §7.3.4)."""
    try:
        raw = line.encode("latin-1")
    except UnicodeEncodeError:
        raw = b"\xfe\xff" + line.encode("utf-16-be")
        return b"<" + raw.hex().encode("ascii") + b">"
    esc = raw.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")
    return b"(" + esc + b")"


def _rl_encode(data: bytes) -> bytes:
    """RunLengthDecode-compatible encoder: literal runs only + EOD."""
    out = bytearray()
    for i in range(0, len(data), 127):
        chunk = data[i : i + 127]
        out.append(len(chunk) - 1)
        out += chunk
    out.append(128)
    return bytes(out)


#: encoders matching functions/pdf._FILTERS (applied in REVERSE of the
#: declared decode chain when building a stream)
_PDF_ENCODERS = {
    "FlateDecode": zlib.compress,
    "ASCIIHexDecode": lambda b: b.hex().encode("ascii") + b">",
    "ASCII85Decode": lambda b: __import__("base64").a85encode(b) + b"~>",
    "RunLengthDecode": _rl_encode,
}


def make_pdf(paragraphs: list[str], words_per_line: int = 12,
             compress: bool = True,
             filters: tuple[str, ...] | None = None) -> bytes:
    """A minimal valid single-page PDF: one BT..ET text object per
    paragraph, lines broken every ``words_per_line`` words with ``T*``,
    content FlateDecode'd by default.  ``filters`` overrides the
    default: a /Filter decode chain in declared order (encoders run in
    reverse).  Pure function of its inputs."""
    ops = []
    for para in paragraphs:
        words = para.split()
        lines = [
            " ".join(words[i : i + words_per_line])
            for i in range(0, len(words), words_per_line)
        ] or [""]
        body = b"\nT*\n".join(_pdf_string(ln) + b" Tj" for ln in lines)
        ops.append(b"BT\n/F1 12 Tf\n72 720 Td\n" + body + b"\nET")
    content = b"\n".join(ops)
    if filters is not None:
        stream = content
        for f in reversed(filters):
            stream = _PDF_ENCODERS[f](stream)
        names = b" ".join(b"/" + f.encode("ascii") for f in filters)
        filt = (b"/Filter /" + filters[0].encode("ascii") + b" "
                if len(filters) == 1 else b"/Filter [" + names + b"] ")
    elif compress:
        stream, filt = zlib.compress(content), b"/Filter /FlateDecode "
    else:
        stream, filt = content, b""
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< " + filt + b"/Length " + str(len(stream)).encode("ascii")
        + b" >>\nstream\n" + stream + b"\nendstream",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for k, obj in enumerate(objs, 1):
        offsets.append(len(out))
        out += str(k).encode("ascii") + b" 0 obj\n" + obj + b"\nendobj\n"
    xref_pos = len(out)
    out += b"xref\n0 " + str(len(objs) + 1).encode("ascii") + b"\n"
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += (f"{off:010d} 00000 n \n").encode("ascii")
    out += (b"trailer\n<< /Size " + str(len(objs) + 1).encode("ascii")
            + b" /Root 1 0 R >>\nstartxref\n" + str(xref_pos).encode("ascii")
            + b"\n%%EOF\n")
    return bytes(out)


def make_pdf_objstm(paragraphs: list[str],
                    words_per_line: int = 12) -> bytes:
    """Compressed-xref ("PDF 1.5") variant of :func:`make_pdf`: every
    NON-stream object — catalog, page tree, page dict (with its /Font
    resource) and a Type0 font carrying the /ToUnicode reference — is
    packed inside a FlateDecode'd ``/Type /ObjStm`` object stream, the
    cross-reference is a ``/Type /XRef`` STREAM (W [1 2 1] rows,
    type-2 entries pointing into the ObjStm) instead of a classic
    table, and the page text is shown as 2-byte CMap codes in hex
    strings.  Extraction therefore REQUIRES object-stream expansion
    (functions/pdf.expand_object_streams): without it the font's
    ToUnicode CMap is unreachable (the font dict exists only inside
    the compressed ObjStm) and the hex codes decode to garbage; with
    it the text round-trips byte-identically to :func:`make_pdf`'s
    uncompressed layout.  Pure function of its inputs."""
    # 2-byte identity CMap over exactly the codepoints used (BMP only;
    # astral chars would need surrogate shows — out of synth scope)
    text_all = "\n".join(paragraphs)
    cps = sorted({ord(c) for c in text_all if ord(c) <= 0xFFFF})
    bf = bytearray()
    for i in range(0, len(cps), 100):  # <=100 entries per block (spec)
        chunk = cps[i:i + 100]
        bf += (str(len(chunk)).encode("ascii") + b" beginbfchar\n")
        for cp in chunk:
            bf += b"<%04X> <%04X>\n" % (cp, cp)
        bf += b"endbfchar\n"
    cmap = (b"/CIDInit /ProcSet findresource begin\n"
            b"begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
            + bytes(bf) + b"endcmap\n")

    def hexshow(line: str) -> bytes:
        codes = b"".join(b"%04X" % ord(c) for c in line if ord(c) <= 0xFFFF)
        return b"<" + codes + b"> Tj"

    ops = []
    for para in paragraphs:
        words = para.split()
        lines = [" ".join(words[i:i + words_per_line])
                 for i in range(0, len(words), words_per_line)] or [""]
        body = b"\nT*\n".join(hexshow(ln) for ln in lines)
        ops.append(b"BT\n/F1 12 Tf\n72 720 Td\n" + body + b"\nET")
    content = zlib.compress(b"\n".join(ops))

    # objects 1/2/3/5 live in the ObjStm; 4 (content), 6 (CMap),
    # 7 (ObjStm) and 8 (XRef stream) are top-level stream objects
    packed = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>"),
        (3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>"),
        (5, b"<< /Type /Font /Subtype /Type0 /BaseFont /Synth "
            b"/ToUnicode 6 0 R >>"),
    ]
    bodies = b"".join(body + b"\n" for _num, body in packed)
    offs, pos = [], 0
    for _num, body in packed:
        offs.append(pos)
        pos += len(body) + 1
    header = b" ".join(b"%d %d" % (num, off)
                       for (num, _b), off in zip(packed, offs)) + b"\n"
    objstm_payload = zlib.compress(header + bodies)
    first = len(header)

    cmap_z = zlib.compress(cmap)
    top = {
        4: (b"<< /Filter /FlateDecode /Length "
            + str(len(content)).encode("ascii") + b" >>\nstream\n"
            + content + b"\nendstream"),
        6: (b"<< /Filter /FlateDecode /Length "
            + str(len(cmap_z)).encode("ascii") + b" >>\nstream\n"
            + cmap_z + b"\nendstream"),
        7: (b"<< /Type /ObjStm /N " + str(len(packed)).encode("ascii")
            + b" /First " + str(first).encode("ascii")
            + b" /Filter /FlateDecode /Length "
            + str(len(objstm_payload)).encode("ascii") + b" >>\nstream\n"
            + objstm_payload + b"\nendstream"),
    }
    out = bytearray(b"%PDF-1.5\n")
    top_off = {}
    for num in (4, 6, 7):
        top_off[num] = len(out)
        out += str(num).encode("ascii") + b" 0 obj\n" + top[num] + b"\nendobj\n"
    xref_pos = len(out)
    # W [1 4 1] entries for objects 0..8: type 0 free, type 1 offset,
    # type 2 (objstm number, index).  4-byte offsets: a large paragraph
    # corpus pushes objects past 65535 bytes, which 2-byte fields
    # cannot hold (OverflowError at corpus-generation time).
    rows = bytearray()
    objstm_index = {num: i for i, (num, _b) in enumerate(packed)}
    for num in range(9):
        if num == 0:
            rows += bytes([0]) + (0).to_bytes(4, "big") + bytes([255])
        elif num in objstm_index:
            rows += bytes([2]) + (7).to_bytes(4, "big") \
                + bytes([objstm_index[num]])
        elif num in top_off:
            rows += bytes([1]) + top_off[num].to_bytes(4, "big") + bytes([0])
        else:  # the xref stream itself
            rows += bytes([1]) + xref_pos.to_bytes(4, "big") + bytes([0])
    out += (b"8 0 obj\n<< /Type /XRef /Size 9 /W [1 4 1] /Root 1 0 R "
            b"/Length " + str(len(rows)).encode("ascii") + b" >>\nstream\n"
            + bytes(rows) + b"\nendstream\nendobj\n")
    out += (b"startxref\n" + str(xref_pos).encode("ascii") + b"\n%%EOF\n")
    return bytes(out)


def _doc_paras(text: str) -> list[str]:
    words = (text or "").split()
    return [" ".join(words[i : i + 25]) for i in range(0, len(words), 25)]


def mixed_pages_from_documents(batch: pa.Table, pdf_every: int = 5,
                               image_every: int = 11) -> pa.Table:
    """``pages_from_documents`` variant with non-HTML payloads mixed in:
    every ``pdf_every``-th doc_id carries its text as a FlateDecode'd
    PDF, every ``image_every``-th (when not a pdf) a PNG-magic binary
    payload; the rest stay html.  Deterministic per row."""
    rows = []
    for doc_id, text, lang, source in zip(
        batch["doc_id"].to_pylist(),
        batch["text"].to_pylist(),
        batch["lang"].to_pylist(),
        batch["source"].to_pylist(),
    ):
        paras = _doc_paras(text)
        if doc_id % pdf_every == 0:
            payload = make_pdf(paras)
        elif doc_id % image_every == 0:
            # valid PNG signature + IHDR header (deterministic dims from
            # doc_id) so the detect stage's header-metadata route is
            # exercised; digest tail keeps the payload content-unique
            w = 16 + int(doc_id) % 1024
            h = 16 + (int(doc_id) * 7) % 1024
            payload = (
                b"\x89PNG\r\n\x1a\n"
                + b"\x00\x00\x00\x0dIHDR"
                + w.to_bytes(4, "big") + h.to_bytes(4, "big")
                + b"\x08\x02\x00\x00\x00" + b"\x00\x00\x00\x00"
                + hashlib.blake2b((text or "").encode("utf-8"), digest_size=64).digest()
            )
        else:
            body = "\n".join(f"<p>{p}.</p>" for p in paras if p)
            payload = (
                f"<html><head><title>doc {doc_id}</title></head>\n<body>\n"
                f'<nav><a href="/">home page</a> | <a href="/{source}">{source} index</a></nav>\n'
                f"{body}\n"
                f'<footer><a href="/terms">terms of use</a></footer>\n</body></html>'
            ).encode("utf-8")
        rows.append(
            {
                "url": f"https://docs.test/{source}/{doc_id:08d}",
                "warc_ts": _EPOCH_US + int(doc_id) * 1_000_000,
                "html": payload,
                "text": text or "",
                "lang": lang or "en",
            }
        )
    return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)


def write_corpus(out_dir: str, n: int, seed: int = 42, shards: int = 8) -> list[str]:
    """Write the corpus as ``shards`` parquet files (a resumable layout)."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    per = (n + shards - 1) // shards
    for s in range(shards):
        lo, hi = s * per, min((s + 1) * per, n)
        if lo >= hi:
            break
        tbl = pa.Table.from_pylist(
            [build_page(seed, i) for i in range(lo, hi)], schema=PAGES_SCHEMA
        )
        # keep dup rows only via generate_pages for small test corpora; the
        # sharded bench corpus stays duplicate-free for clean throughput math
        path = os.path.join(out_dir, f"pages-{s:05d}.parquet")
        pq.write_table(tbl, path)
        paths.append(path)
    return paths


# ---------------------------------------------------------------------------
# deterministic REAL image encoders (round 4): tiny gradient rasters whose
# pixel statistics have a closed form, so the pure-Python decoders
# (functions/png.py, functions/raster.py) can be verified through the
# DRIVER GATE against a SQL twin that computes the same stats from the
# formula — no image library on either side.
# ---------------------------------------------------------------------------

def encode_bmp24(px) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit BI_RGB bottom-up BMP bytes."""
    import struct

    import numpy as np

    px = np.asarray(px, dtype=np.uint8)
    h, w, _ = px.shape
    pad = (-(w * 3)) % 4
    body = b"".join(r[:, ::-1].tobytes() + b"\x00" * pad for r in px[::-1])
    return (b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
            + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                          2835, 2835, 0, 0) + body)


def encode_gif8(idx, palette) -> bytes:
    """(h, w) uint8 indices + (n, 3) palette -> single-frame GIF89a.

    Emits a spec-valid variable-width LZW stream via the
    clear-before-every-code form (the table never grows, so the code
    width stays fixed — explicitly allowed by the GIF89a spec)."""
    import struct

    import numpy as np

    idx = np.asarray(idx, dtype=np.uint8)
    palette = np.asarray(palette, dtype=np.uint8)
    h, w = idx.shape
    bits = 1
    while (1 << bits) < len(palette):
        bits += 1
    bits = max(bits, 2)
    pal = np.zeros((1 << bits, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    head = (b"GIF89a" + struct.pack("<HH", w, h)
            + bytes([0x80 | (bits - 1), 0, 0]) + pal.tobytes())
    img = b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    mcs = max(bits, 2)
    clear, end = 1 << mcs, (1 << mcs) + 1
    width = mcs + 1
    acc = nbits = 0
    packed = bytearray()

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            packed.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    for v in idx.ravel().tolist():
        emit(int(v))
        emit(clear)
    emit(end)
    if nbits:
        packed.append(acc & 0xFF)
    sub = b"".join(bytes([len(packed[i:i + 255])]) + bytes(packed[i:i + 255])
                   for i in range(0, len(packed), 255))
    return head + img + bytes([mcs]) + sub + b"\x00" + b"\x3b"


def encode_png_rgb(px, interlace: bool = False,
                   bitdepth: int = 8) -> bytes:
    """(h, w, 3) uint8 RGB -> PNG bytes (color type 2, filter 0 rows).

    ``interlace=True`` emits Adam7 (seven independently-filtered
    passes, forward order per ISO 15948 §8.2); ``bitdepth=16`` emits
    each sample left-bit-replicated (v*257, big-endian) so the
    decoder's pinned high-byte 16->8 reduction round-trips exactly.
    Either way the decoded pixels equal ``px`` bit-for-bit."""
    import struct
    import zlib

    import numpy as np

    px = np.asarray(px, dtype=np.uint8)
    h, w, _ = px.shape

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    def rows(sub) -> bytes:
        if bitdepth == 16:
            v16 = sub.astype(">u2") * 257
            return b"".join(b"\x00" + v16[y].tobytes()
                            for y in range(sub.shape[0]))
        return b"".join(b"\x00" + sub[y].tobytes()
                        for y in range(sub.shape[0]))

    if interlace:
        # Adam7 pass grids (x0, y0, dx, dy), ISO 15948 §8.2
        passes = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
                  (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
        raw = b"".join(rows(px[y0::dy, x0::dx])
                       for x0, y0, dx, dy in passes
                       if px[y0::dy, x0::dx].size)
    else:
        raw = rows(px)
    ihdr = struct.pack(">IIBBBBB", w, h, bitdepth, 2, 0, 0,
                       1 if interlace else 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def gradient_image(doc_id: int) -> tuple[str, bytes, int, int]:
    """Deterministic tiny raster for ``doc_id``: dims (8 + id%9,
    8 + id%7), every channel of pixel (x, y) = (x + y + id) % 256;
    format cycles bmp/gif/png/webp-lossless by id % 4.  Returns
    (fmt, payload, w, h).  The closed-form pixel mean makes the
    decode round-trip SQL-checkable (catalog q81); webp is VP8L so
    the round-trip stays lossless.  PNG docs split by id % 16 to put
    every decoder layout on the gate with the SAME pixels (all
    lossless, so the SQL twin is unchanged): 2 = plain 8-bit, 6 =
    Adam7 interlaced, 10 = 16-bit (v*257 samples, high-byte
    reduction), 14 = 16-bit Adam7 interlaced."""
    import numpy as np

    w = 8 + doc_id % 9
    h = 8 + doc_id % 7
    x = np.arange(w, dtype=np.int64)[None, :]
    y = np.arange(h, dtype=np.int64)[:, None]
    v = ((x + y + doc_id) % 256).astype(np.uint8)
    fmt = ("bmp", "gif", "png", "webp")[doc_id % 4]
    if fmt == "bmp":
        payload = encode_bmp24(np.repeat(v[:, :, None], 3, axis=2))
    elif fmt == "gif":
        grey = np.arange(256, dtype=np.uint8)
        payload = encode_gif8(v, np.repeat(grey[:, None], 3, axis=1))
    elif fmt == "webp":
        payload = encode_webp_lossless(np.repeat(v[:, :, None], 3, axis=2))
    else:
        payload = encode_png_rgb(np.repeat(v[:, :, None], 3, axis=2),
                                 interlace=doc_id % 16 in (6, 14),
                                 bitdepth=16 if doc_id % 16 in (10, 14)
                                 else 8)
    return fmt, payload, w, h


def _jpeg_dc_table() -> tuple[list[int], bytes, dict[int, tuple[int, int]]]:
    """The shared Annex-K-shaped DC Huffman table (categories 0..11)
    used by every synthetic JPEG encoder here: (bits, vals,
    {category: (code, length)}) built canonically."""
    dc_bits = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
    dc_vals = bytes(range(12))
    dc_codes = {}
    code = k = 0
    for length in range(1, 17):
        for _ in range(dc_bits[length - 1]):
            dc_codes[dc_vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return dc_bits, dc_vals, dc_codes


def encode_jpeg_gray_dc(blocks) -> bytes:
    """(by, bx) uint8 BLOCK values -> baseline grayscale JPEG whose 8x8
    blocks are constant (DC-only, quant table all ones, Annex-K DC
    Huffman table, 1-bit EOB AC table) — the T.81 subset a DC-only
    block decodes LOSSLESSLY, which puts the real Huffman+IDCT decoder
    (functions/jpeg.py) on the driver gate."""
    import numpy as np

    blocks = np.asarray(blocks, dtype=np.int64)
    by, bx = blocks.shape
    h, w = by * 8, bx * 8

    def seg(marker: int, body: bytes) -> bytes:
        return (bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big")
                + body)

    dqt = seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = seg(0xC0, bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
              + bytes([1, 1, 0x11, 0]))
    dc_bits, dc_vals, dc_codes = _jpeg_dc_table()
    dht_dc = seg(0xC4, bytes([0x00]) + bytes(dc_bits) + dc_vals)
    dht_ac = seg(0xC4, bytes([0x10]) + bytes([1] + [0] * 15) + bytes([0x00]))
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))

    out = bytearray()
    acc = nb = 0

    def emit(c: int, ln: int):
        nonlocal acc, nb
        acc = (acc << ln) | c
        nb += ln
        while nb >= 8:
            byte = (acc >> (nb - 8)) & 0xFF
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)
            nb -= 8
        acc &= (1 << nb) - 1

    pred = 0
    for v in blocks.ravel().tolist():
        dcv = 8 * (v - 128)
        diff = dcv - pred
        pred = dcv
        t = int(abs(diff)).bit_length() if diff else 0
        c, ln = dc_codes[t]
        emit(c, ln)
        if t:
            emit(diff if diff >= 0 else diff + (1 << t) - 1, t)
        emit(0, 1)  # EOB
    if nb:
        emit((1 << (8 - nb)) - 1, 8 - nb)  # pad with 1s per spec
    return (b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos + bytes(out)
            + b"\xff\xd9")


def encode_jpeg_color_dc(y_blocks, cb_blocks, cr_blocks,
                         hy: int = 2, vy: int = 2,
                         w: int | None = None,
                         h: int | None = None) -> bytes:
    """DC-only SUBSAMPLED-color baseline JPEG (the companion of
    :func:`encode_jpeg_gray_dc` for the 4:2:0 / 4:2:2 / 4:4:0 decode
    path, functions/jpeg.py): Y sampled at ``hy×vy`` (per-MCU
    ``vy×hy`` luma blocks, row-major per T.81 §A.2.3), Cb/Cr at 1×1.

    ``y_blocks`` is a ``(vy*my, hy*mx)`` uint8 grid of constant luma
    block values; ``cb_blocks``/``cr_blocks`` are ``(my, mx)`` chroma
    block values.  ``w``/``h`` (default: the full padded MCU grid)
    write SMALLER frame dims into SOF0 so the decoder's partial-MCU
    crop path is exercised; they must still need the same MCU count.
    Unit quant + Annex-K-shaped DC table + 1-bit EOB AC table, so
    every block decodes losslessly and — with the decoder's pinned
    replication upsampling — the full RGB round-trip is closed-form
    (catalog q82 odd-doc rows)."""
    import numpy as np

    yb = np.asarray(y_blocks, dtype=np.int64)
    cbb = np.asarray(cb_blocks, dtype=np.int64)
    crb = np.asarray(cr_blocks, dtype=np.int64)
    my, mx = cbb.shape
    if crb.shape != (my, mx) or yb.shape != (vy * my, hy * mx):
        raise ValueError("block grids inconsistent with sampling")
    if w is None:
        w = mx * hy * 8
    if h is None:
        h = my * vy * 8
    if -(-w // (8 * hy)) != mx or -(-h // (8 * vy)) != my:
        raise ValueError("frame dims inconsistent with the MCU grid")

    def seg(marker: int, body: bytes) -> bytes:
        return (bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big")
                + body)

    dqt = seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = seg(0xC0, bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
              + bytes([3,
                       1, (hy << 4) | vy, 0,
                       2, 0x11, 0,
                       3, 0x11, 0]))
    dc_bits, dc_vals, dc_codes = _jpeg_dc_table()
    dht_dc = seg(0xC4, bytes([0x00]) + bytes(dc_bits) + dc_vals)
    dht_ac = seg(0xC4, bytes([0x10]) + bytes([1] + [0] * 15) + bytes([0x00]))
    sos = seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))

    out = bytearray()
    acc = nb = 0

    def emit(c: int, ln: int):
        nonlocal acc, nb
        acc = (acc << ln) | c
        nb += ln
        while nb >= 8:
            byte = (acc >> (nb - 8)) & 0xFF
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)
            nb -= 8
        acc &= (1 << nb) - 1

    preds = [0, 0, 0]

    def emit_block(ci: int, v: int):
        dcv = 8 * (v - 128)
        diff = dcv - preds[ci]
        preds[ci] = dcv
        t = int(abs(diff)).bit_length() if diff else 0
        c, ln = dc_codes[t]
        emit(c, ln)
        if t:
            emit(diff if diff >= 0 else diff + (1 << t) - 1, t)
        emit(0, 1)  # EOB

    for m in range(mx * my):
        r, c = m // mx, m % mx
        for bv in range(vy):
            for bh in range(hy):
                emit_block(0, int(yb[r * vy + bv, c * hy + bh]))
        emit_block(1, int(cbb[r, c]))
        emit_block(2, int(crb[r, c]))
    if nb:
        emit((1 << (8 - nb)) - 1, 8 - nb)  # pad with 1s per spec
    return (b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos + bytes(out)
            + b"\xff\xd9")


def _lossless_preds(v, sel: int, pt: int):
    """Prediction matrix for a coded-value plane ``v`` (already >>pt)
    under T.81 §H.1.2.1 — the exact rules functions/jpeg.py's
    _decode_lossless_scan applies: default for the corner, Ra across
    the first line, Rb down the first column, the selected predictor
    elsewhere.  Vectorized (the decoder is bit-serial; the encoder
    need not be)."""
    import numpy as np

    h, w = v.shape
    p = np.zeros((h, w), dtype=np.int64)
    p[0, 0] = 1 << (7 - pt)
    p[0, 1:] = v[0, :-1]
    p[1:, 0] = v[:-1, 0]
    a, b, c = v[1:, :-1], v[:-1, 1:], v[:-1, :-1]
    if sel == 1:
        p[1:, 1:] = a
    elif sel == 2:
        p[1:, 1:] = b
    elif sel == 3:
        p[1:, 1:] = c
    elif sel == 4:
        p[1:, 1:] = a + b - c
    elif sel == 5:
        p[1:, 1:] = a + ((b - c) >> 1)
    elif sel == 6:
        p[1:, 1:] = b + ((a - c) >> 1)
    elif sel == 7:
        p[1:, 1:] = (a + b) >> 1
    else:
        raise ValueError(f"illegal predictor {sel}")
    return p


def encode_jpeg_lossless(px, predictor: int = 1, pt: int = 0,
                         interleaved: bool = True) -> bytes:
    """(h, w) or (h, w, 3) uint8 -> lossless JPEG (SOF3, T.81 Annex
    H): Huffman-coded prediction differences, predictor 1-7, point
    transform ``pt`` (samples code as ``px >> pt``; the decoder
    reconstructs ``(px >> pt) << pt`` — bit-exact when ``pt == 0``).
    Color emits one interleaved 3-component scan (1×1 sampling) or,
    with ``interleaved=False``, three single-component scans — both
    layouts functions/jpeg.py decodes.  The Annex-K DC table covers
    the diff categories (|diff| <= 510 -> SSSS <= 10 <= 11)."""
    import numpy as np

    arr = np.asarray(px, dtype=np.uint8)
    if arr.ndim == 2:
        planes = [arr]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        planes = [arr[:, :, i] for i in range(3)]
    else:
        raise ValueError("expected (h, w) or (h, w, 3) uint8")
    if not (0 <= pt <= 7):
        raise ValueError("point transform out of range")
    h, w = planes[0].shape
    nc = len(planes)

    def seg(marker: int, body: bytes) -> bytes:
        return (bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big")
                + body)

    dc_bits, dc_vals, dc_codes = _jpeg_dc_table()
    dht = seg(0xC4, bytes([0x00]) + bytes(dc_bits) + dc_vals)
    sof_body = bytearray([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof_body += bytes([nc])
    for ci in range(nc):
        sof_body += bytes([ci + 1, 0x11, 0])   # 1x1 sampling, Tq unused
    sof = seg(0xC3, bytes(sof_body))

    diffs = []
    for plane in planes:
        v = plane.astype(np.int64) >> pt
        diffs.append(v - _lossless_preds(v, predictor, pt))

    def emit_scan(b: _JpegBits, order):
        for d in order:
            di = int(d)
            t = abs(di).bit_length()
            code, ln = dc_codes[t]
            b.emit(code, ln)
            if t:
                b.emit(di if di >= 0 else di + (1 << t) - 1, t)

    out = b"\xff\xd8" + dht + sof
    if interleaved or nc == 1:
        sos_body = bytes([nc]) + b"".join(
            bytes([ci + 1, 0x00]) for ci in range(nc))
        sos_body += bytes([predictor, 0, pt])
        b = _JpegBits()
        # MCU order with all-1x1 sampling: one sample per component
        # per (y, x), raster order — matches the decoder's loop.
        stack = np.stack([d.ravel() for d in diffs], axis=1).ravel()
        emit_scan(b, stack)
        b.pad()
        out += seg(0xDA, sos_body) + bytes(b.out)
    else:
        for ci, d in enumerate(diffs):
            sos_body = bytes([1, ci + 1, 0x00, predictor, 0, pt])
            b = _JpegBits()
            emit_scan(b, d.ravel())
            b.pad()
            out += seg(0xDA, sos_body) + bytes(b.out)
    return out + b"\xff\xd9"


def encode_jpeg_arith_lossless(px, predictor: int = 1, pt: int = 0,
                               interleaved: bool = True) -> bytes:
    """(h, w) or (h, w, 3) uint8 -> ARITHMETIC lossless JPEG (SOF11,
    T.81 Annex H statistical model over the Annex D QM-coder): the
    SOF11 twin of :func:`encode_jpeg_lossless` — same predictors 1-7,
    point transform and scan layouts, entropy-coded through
    functions/jpeg_arith.encode_arith_lossless_scan with an explicit
    DAC marker pinning the default DC conditioning (L=0, U=1)."""
    import numpy as np

    from ..functions.jpeg_arith import encode_arith_lossless_scan

    arr = np.asarray(px, dtype=np.uint8)
    if arr.ndim == 2:
        planes = [arr]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        planes = [arr[:, :, i] for i in range(3)]
    else:
        raise ValueError("expected (h, w) or (h, w, 3) uint8")
    if not (0 <= pt <= 7):
        raise ValueError("point transform out of range")
    h, w = planes[0].shape
    nc = len(planes)

    def seg(marker: int, body: bytes) -> bytes:
        return (bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big")
                + body)

    sof_body = bytearray([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof_body += bytes([nc])
    for ci in range(nc):
        sof_body += bytes([ci + 1, 0x11, 0])   # 1x1 sampling, Tq unused
    sof = seg(0xCB, bytes(sof_body))
    dac = seg(0xCC, bytes([0x00, 0x10]))  # table 0: L=0, U=1

    shifted = [(p.astype(np.int64) >> pt) for p in planes]
    out = b"\xff\xd8" + sof + dac
    if interleaved or nc == 1:
        sos_body = bytes([nc]) + b"".join(
            bytes([ci + 1, 0x00]) for ci in range(nc))
        sos_body += bytes([predictor, 0, pt])
        ent = encode_arith_lossless_scan(shifted, [0] * nc, predictor, pt)
        out += seg(0xDA, sos_body) + ent
    else:
        for ci, p in enumerate(shifted):
            sos_body = bytes([1, ci + 1, 0x00, predictor, 0, pt])
            ent = encode_arith_lossless_scan([p], [0], predictor, pt)
            out += seg(0xDA, sos_body) + ent
    return out + b"\xff\xd9"


def encode_jpeg_hierarchical(px, arith: bool = False) -> bytes:
    """(h, w) uint8 gray or a [Y, Cb, Cr] list of same-shape (h, w)
    uint8 planes -> HIERARCHICAL JPEG (DHP, T.81 Annex J) that
    reconstructs the input EXACTLY through
    functions/jpeg_hier.decode_hierarchical — the classic
    lossy-pyramid-plus-lossless-refinement shape:

    1. a non-differential LOSSLESS first frame (SOF3 Huffman /
       SOF11 arithmetic, predictor 1) on the even-sampled half-
       resolution grid,
    2. EXP doubling both axes (§J.8 interpolation filter; odd target
       dims exercise the decoder's §J.8.1 reference clip),
    3. a DIFFERENTIAL DCT frame (SOF5 / SOF13): DC-only
       block-constant corrections — the per-8×8-block rounded mean
       error clamped to ±128, coded with ZERO DC prediction and no
       level shift, folded clamp-to-[0,255] per §F.1.1.5.1,
    4. a final DIFFERENTIAL LOSSLESS frame (SOF7 / SOF15, predictor
       selection 0) coding the exact remaining source-minus-reference
       differences (mod-2^16 reconstruction makes the output exact).

    ``arith`` selects the QM-coded frame types (SOF11/13/15) over the
    Huffman ones (SOF3/5/7).  Color planes are YCbCr at 1×1 sampling
    (the decoder composes RGB through the pinned BT.601 rules).  No
    independent Annex-J implementation exists to interop with
    (libjpeg never shipped it), so this mirror encoder IS the gate
    twin (catalog q82 id%16==8 rows) over scan machinery that is
    individually libjpeg-validated — see functions/jpeg_hier.py."""
    import numpy as np

    from ..functions.jpeg_hier import _exp_double

    if isinstance(px, (list, tuple)):
        planes = [np.asarray(p, dtype=np.uint8) for p in px]
        if len(planes) != 3 or any(p.shape != planes[0].shape
                                   for p in planes):
            raise ValueError("expected three same-shape YCbCr planes")
    else:
        arr = np.asarray(px, dtype=np.uint8)
        if arr.ndim != 2:
            raise ValueError("expected (h, w) uint8 or [Y, Cb, Cr]")
        planes = [arr]
    h, w = planes[0].shape
    if not h or not w:
        raise ValueError("empty image")
    nc = len(planes)

    def seg(marker: int, body: bytes) -> bytes:
        return (bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big")
                + body)

    def frame_hdr(marker: int, fh: int, fw: int) -> bytes:
        body = bytearray([8]) + fh.to_bytes(2, "big") + fw.to_bytes(2, "big")
        body += bytes([nc])
        for ci in range(nc):
            body += bytes([ci + 1, 0x11, 0])  # 1x1 sampling, Tq 0
        return seg(marker, bytes(body))

    dc_bits, dc_vals, dc_codes = _jpeg_dc_table()

    def huff_values(values, eob_after_each: bool = False) -> bytes:
        """Category+EXTEND emission shared by the Huffman lossless
        scans (raw diff stream) and the DC-only differential DCT scan
        (each value followed by the 1-bit EOB)."""
        b = _JpegBits()
        for d in values:
            di = int(d)
            t = abs(di).bit_length()
            code, ln = dc_codes[t]
            b.emit(code, ln)
            if t:
                b.emit(di if di >= 0 else di + (1 << t) - 1, t)
            if eob_after_each:
                b.emit(0, 1)
        b.pad()
        return bytes(b.out)

    if arith:
        from ..functions.jpeg_arith import (encode_arith_lossless_scan,
                                            encode_arith_scan)

    # -- frame 1: lossless first frame on the even-sampled grid ------
    half = [p[::2, ::2].astype(np.int64) for p in planes]
    hh, hw = half[0].shape
    sos1 = (bytes([nc])
            + b"".join(bytes([ci + 1, 0x00]) for ci in range(nc))
            + bytes([1, 0, 0]))  # predictor 1, Se=0, Ah=0/Al(Pt)=0
    if arith:
        ent1 = encode_arith_lossless_scan(half, [0] * nc, 1, 0)
        f1 = frame_hdr(0xCB, hh, hw)
    else:
        d1 = [v - _lossless_preds(v, 1, 0) for v in half]
        ent1 = huff_values(np.stack([d.ravel() for d in d1],
                                    axis=1).ravel())
        f1 = frame_hdr(0xC3, hh, hw)

    # mirror the decoder's reference chain: EXP + §J.8.1 clip
    refs = [_exp_double(v, 1, 1)[:h, :w] for v in half]

    # -- frame 2: differential DCT, DC-only block corrections --------
    byg, bxg = -(-h // 8), -(-w // 8)
    deltas, ref2s = [], []
    for p, r in zip(planes, refs):
        err = p.astype(np.int64) - r
        dl = np.zeros((byg, bxg), dtype=np.int64)
        for by in range(byg):
            for bx in range(bxg):
                blk = err[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                dl[by, bx] = max(-128, min(127, int(np.rint(blk.mean()))))
        deltas.append(dl)
        corr = np.repeat(np.repeat(dl, 8, axis=0), 8, axis=1)[:h, :w]
        ref2s.append(np.clip(r + corr, 0, 255))
    sos2 = (bytes([nc])
            + b"".join(bytes([ci + 1, 0x00]) for ci in range(nc))
            + bytes([0, 63, 0]))
    if arith:
        coefs = []
        for dl in deltas:
            cz = np.zeros((byg, bxg, 64), dtype=np.int64)
            cz[:, :, 0] = 8 * dl
            coefs.append(cz)
        ent2 = encode_arith_scan(coefs, [(0, 0, 1, 1)] * nc, bxg, byg,
                                 differential=True)
        f2 = frame_hdr(0xCD, h, w)
    else:
        # interleaved MCU walk at 1x1 sampling: one block per
        # component per MCU, raster order — DC value then EOB
        vals = np.stack([8 * dl.ravel() for dl in deltas],
                        axis=1).ravel()
        ent2 = huff_values(vals, eob_after_each=True)
        f2 = frame_hdr(0xC5, h, w)

    # -- frame 3: differential lossless, exact residue ---------------
    res = [p.astype(np.int64) - r2 for p, r2 in zip(planes, ref2s)]
    sos3 = (bytes([nc])
            + b"".join(bytes([ci + 1, 0x00]) for ci in range(nc))
            + bytes([0, 0, 0]))  # predictor selection SHALL be 0
    if arith:
        ent3 = encode_arith_lossless_scan(res, [0] * nc, 0, 0,
                                          differential=True)
        f3 = frame_hdr(0xCF, h, w)
    else:
        ent3 = huff_values(np.stack([d.ravel() for d in res],
                                    axis=1).ravel())
        f3 = frame_hdr(0xC7, h, w)

    out = b"\xff\xd8" + seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    if arith:
        # DC table 0: L=0, U=1; AC table 0: Kx=5 (the defaults, pinned)
        out += seg(0xCC, bytes([0x00, 0x10, 0x10, 0x05]))
    else:
        out += seg(0xC4, bytes([0x00]) + bytes(dc_bits) + dc_vals)
        out += seg(0xC4, bytes([0x10]) + bytes([1] + [0] * 15)
                   + bytes([0x00]))
    out += frame_hdr(0xDE, h, w)  # DHP: the full output dimensions
    out += f1 + seg(0xDA, sos1) + ent1
    out += seg(0xDF, bytes([0x11]))  # EXP: double both axes
    out += f2 + seg(0xDA, sos2) + ent2
    out += f3 + seg(0xDA, sos3) + ent3
    return out + b"\xff\xd9"


def encode_wav_pcm16(samples, rate: int = 8000,
                     layout: str = "pcm16") -> bytes:
    """(n,) or (n, ch) int16 samples -> RIFF/WAVE bytes (the audio
    analog of the image encoders above; decoded by functions/audio.py
    on the driver gate, catalog q83).

    ``layout`` picks the on-wire encoding of the SAME sample values
    (every layout decodes back to the identical int matrix, so the
    gate twin is layout-independent): ``pcm16`` | ``pcm24`` | ``pcm32``
    | ``float32`` (values / 32768 — exact in f32 for int16 range,
    reversed by the decoder's pinned trunc rule) | ``ext_pcm16``
    (WAVE_FORMAT_EXTENSIBLE wrapping PCM16) | ``ext_float32``."""
    import struct

    import numpy as np

    s = np.asarray(samples, dtype=np.int64)
    if s.ndim == 1:
        s = s[:, None]
    ch = s.shape[1]
    if layout == "pcm16" or layout == "ext_pcm16":
        body = s.astype("<i2").tobytes()
        code, bits = 1, 16
    elif layout == "pcm24":
        v = (s & 0xFFFFFF).astype("<u4")
        raw = v.astype("<u4").view(np.uint8).reshape(-1, 4)[:, :3]
        body = np.ascontiguousarray(raw).tobytes()
        code, bits = 1, 24
    elif layout == "pcm32":
        body = s.astype("<i4").tobytes()
        code, bits = 1, 32
    elif layout == "float32" or layout == "ext_float32":
        body = (s.astype(np.float64) / 32768.0).astype("<f4").tobytes()
        code, bits = 3, 32
    else:
        raise ValueError(f"unknown WAV layout {layout!r}")
    w = bits // 8
    if layout.startswith("ext_"):
        from ..functions.audio import _EXT_GUID_TAIL

        ext = (struct.pack("<HHI", 22, bits, (1 << ch) - 1)
               + struct.pack("<H", code) + _EXT_GUID_TAIL)
        fmt = struct.pack("<HHIIHH", 0xFFFE, ch, rate, rate * ch * w,
                          ch * w, bits) + ext
    else:
        fmt = struct.pack("<HHIIHH", code, ch, rate, rate * ch * w,
                          ch * w, bits)
    riff = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(body)) + body
            + (b"\x00" if len(body) & 1 else b""))
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def encode_avi_mjpeg(frames: list[bytes], rate: int = 25,
                     width: int = 8, height: int = 8) -> bytes:
    """JPEG frame payloads -> minimal spec-shaped RIFF-AVI (MJPEG):
    avih + one video stream header, then the LIST movi with one 00dc
    chunk per frame (word-aligned).  Parsed back by
    functions/avi.iter_avi_frames on the driver gate (catalog q84)."""
    import struct

    def chunk(fcc: bytes, body: bytes) -> bytes:
        return fcc + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b"")

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = chunk(b"avih", struct.pack(
        "<14I", 1_000_000 // rate, 0, 0, 0x10, len(frames), 0, 1, 0,
        width, height, 0, 0, 0, 0))
    strh = chunk(b"strh", b"vids" + b"MJPG" + struct.pack(
        "<IHHIIIIIIIII", 0, 0, 0, 0, 1, rate, 0, len(frames), 0, 0, 0, 0))
    strf = chunk(b"strf", struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0,
        width * height * 3, 0, 0, 0, 0))
    hdrl = lst(b"hdrl", avih + lst(b"strl", strh + strf))
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


class _JpegBits:
    """MSB-first bit emitter with 0xFF00 stuffing + RSTn support for
    the progressive encoder (the closure-based emitters above are
    per-function; scans need pad/restart as first-class ops)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nb = 0

    def emit(self, c: int, ln: int):
        if ln == 0:
            return
        self.acc = (self.acc << ln) | (c & ((1 << ln) - 1))
        self.nb += ln
        while self.nb >= 8:
            byte = (self.acc >> (self.nb - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self.nb -= 8
        self.acc &= (1 << self.nb) - 1

    def pad(self):
        if self.nb:
            self.emit((1 << (8 - self.nb)) - 1, 8 - self.nb)

    def restart(self, n: int):
        self.pad()
        self.out += bytes([0xFF, 0xD0 + (n & 7)])


def _jpeg_prog_tables():
    """(dc_codes, ac_codes, dht segments): the Annex-K-shaped DC table
    plus a flat all-length-8 AC table carrying every (r<<4)|s symbol
    r 0..15, s 0..10 (176 codes < 256, so the canonical table is legal
    and no code is all ones)."""
    def seg(marker: int, body: bytes) -> bytes:
        return (bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big")
                + body)

    dc_bits, dc_vals, dc_codes = _jpeg_dc_table()
    ac_syms = [(r << 4) | s for r in range(16) for s in range(11)]
    ac_codes = {sym: (i, 8) for i, sym in enumerate(ac_syms)}
    ac_bits = [0] * 16
    ac_bits[7] = len(ac_syms)
    dht = (seg(0xC4, bytes([0x00]) + bytes(dc_bits) + dc_vals)
           + seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_syms)))
    return dc_codes, ac_codes, dht


def encode_jpeg_progressive(comp_coefs, samplings=None,
                            w: int | None = None, h: int | None = None,
                            restart_interval: int = 0) -> bytes:
    """Quantized zigzag coefficient grids -> PROGRESSIVE JPEG (SOF2),
    the synthetic twin of functions/jpeg.py's Annex-G decode path.

    ``comp_coefs``: one ``(by_pad, bx_pad, 64)`` int array per
    component (1 = grayscale, 3 = YCbCr), zigzag order, grids padded
    to the full MCU coverage of ``samplings`` (``[(hi, vi), ...]``,
    default all 1×1).  Unit quant tables, so the decoder's
    reconstruction is the closed-form dequant+IDCT of exactly these
    integers.  ``w``/``h`` default to the padded grid; smaller values
    exercise the interleaved-vs-non-interleaved grid split (AC scans
    walk ceil(comp/8) blocks, DC interleaved scans walk the padded MCU
    grid).

    Scan script (exercises every Annex-G scan type): DC first
    (interleaved, Al=1), DC refine (Al=0), then per component AC first
    Ss=1..5 / 6..63 at Al=1 and AC refine of both bands at Al=0 — with
    EOB-run accumulation and ZRL/correction-bit buffering in libjpeg's
    shape.  ``restart_interval`` (MCUs for the DC scans, blocks for AC
    scans) emits DRI + RSTn with predictor/EOB-run resets."""
    import numpy as np

    coefs = [np.asarray(c, dtype=np.int64) for c in comp_coefs]
    ncomp = len(coefs)
    if ncomp not in (1, 3):
        raise ValueError("1 or 3 components")
    if samplings is None:
        samplings = [(1, 1)] * ncomp
    hmax = max(s[0] for s in samplings)
    vmax = max(s[1] for s in samplings)
    mcuy = coefs[0].shape[0] // samplings[0][1]
    mcux = coefs[0].shape[1] // samplings[0][0]
    for c, (hi, vi) in zip(coefs, samplings):
        if c.shape != (mcuy * vi, mcux * hi, 64):
            raise ValueError("coefficient grid inconsistent with sampling")
    if w is None:
        w = mcux * hmax * 8
    if h is None:
        h = mcuy * vmax * 8
    if -(-w // (8 * hmax)) != mcux or -(-h // (8 * vmax)) != mcuy:
        raise ValueError("frame dims inconsistent with the MCU grid")

    def seg(marker: int, body: bytes) -> bytes:
        return (bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big")
                + body)

    dc_codes, ac_codes, dht = _jpeg_prog_tables()
    head = bytearray(b"\xff\xd8")
    head += seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") \
        + bytes([ncomp])
    for ci, (hi, vi) in enumerate(samplings):
        sof += bytes([ci + 1, (hi << 4) | vi, 0])
    head += seg(0xC2, sof)
    head += dht
    if restart_interval:
        head += seg(0xDD, restart_interval.to_bytes(2, "big"))

    def sos(comp_ids: list[int], ss: int, se: int, ah: int, al: int) -> bytes:
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            body += bytes([cid, 0x00])  # DC table 0 / AC table 0
        return seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    ri = restart_interval
    out = bytearray(head)

    def emit_signed(b: _JpegBits, code_map, run: int, v: int):
        t = int(abs(v)).bit_length()
        c, ln = code_map[(run << 4) | t]
        b.emit(c, ln)
        b.emit(v if v >= 0 else v + (1 << t) - 1, t)

    # --- DC first + DC refine ------------------------------------------
    # A multi-component DC scan interleaves vi*hi blocks per MCU over
    # the PADDED MCU grid; a single-component frame's DC scan is
    # NON-interleaved per T.81 §A.2.2 — MCU = 1 block, the grid is
    # ceil(dim/8) with no sampling padding, and the restart interval
    # counts blocks.
    for ah, al in ((0, 1), (1, 0)):
        out += sos(list(range(1, ncomp + 1)), 0, 0, ah, al)
        b = _JpegBits()
        preds = [0] * ncomp

        def dc_block(ci: int, dc: int):
            if ah == 0:
                v = dc >> al  # arithmetic shift, like the C
                diff = v - preds[ci]
                preds[ci] = v
                t = int(abs(diff)).bit_length()
                c, ln = dc_codes[t]
                b.emit(c, ln)
                b.emit(diff if diff >= 0 else diff + (1 << t) - 1, t)
            else:
                b.emit((dc >> al) & 1, 1)

        if ncomp == 1:
            by = -(-h // 8)
            bx = -(-w // 8)
            u = 0
            for br_ in range(by):
                for bc in range(bx):
                    if ri and u and u % ri == 0:
                        b.restart((u // ri - 1) & 7)
                        preds = [0]
                    dc_block(0, int(coefs[0][br_, bc, 0]))
                    u += 1
        else:
            for m in range(mcux * mcuy):
                if ri and m and m % ri == 0:
                    b.restart((m // ri - 1) & 7)
                    preds = [0] * ncomp
                my, mx = m // mcux, m % mcux
                for ci, (hi, vi) in enumerate(samplings):
                    for bv in range(vi):
                        for bh in range(hi):
                            dc_block(ci, int(coefs[ci][my * vi + bv,
                                                       mx * hi + bh, 0]))
        b.pad()
        out += b.out

    bands = [(1, 5), (6, 63)]

    # --- AC first scans (per component, non-interleaved) --------------
    for ci, (hi, vi) in enumerate(samplings):
        by = -(-(-(-h * vi // vmax)) // 8)
        bx = -(-(-(-w * hi // hmax)) // 8)
        for ss, se in bands:
            al = 1
            out += sos([ci + 1], ss, se, 0, al)
            b = _JpegBits()
            eobrun = 0

            def flush_eob():
                nonlocal eobrun
                while eobrun > 0:
                    run = min(eobrun, 32767)
                    g = run.bit_length() - 1
                    c, ln = ac_codes[(g << 4) | 0]
                    b.emit(c, ln)
                    b.emit(run - (1 << g), g)
                    eobrun -= run

            u = 0
            for br_ in range(by):
                for bc in range(bx):
                    if ri and u and u % ri == 0:
                        flush_eob()
                        b.restart((u // ri - 1) & 7)
                    u += 1
                    blk = coefs[ci][br_, bc]
                    r = 0
                    any_nz = False
                    for k in range(ss, se + 1):
                        cv = int(blk[k])
                        v = (abs(cv) >> al) * (1 if cv >= 0 else -1)
                        if v == 0:
                            r += 1
                            continue
                        flush_eob()
                        while r > 15:
                            c, ln = ac_codes[0xF0]
                            b.emit(c, ln)
                            r -= 16
                        emit_signed(b, ac_codes, r, v)
                        r = 0
                        any_nz = True
                    if r > 0 or not any_nz:
                        eobrun += 1
                        if eobrun == 32767:
                            flush_eob()
            flush_eob()
            b.pad()
            out += b.out

    # --- AC refinement scans -------------------------------------------
    for ci, (hi, vi) in enumerate(samplings):
        by = -(-(-(-h * vi // vmax)) // 8)
        bx = -(-(-(-w * hi // hmax)) // 8)
        for ss, se in bands:
            al = 0
            out += sos([ci + 1], ss, se, 1, al)
            b = _JpegBits()
            eobrun = 0
            be: list[int] = []

            def flush_eob_r():
                nonlocal eobrun, be
                if eobrun:
                    g = eobrun.bit_length() - 1
                    c, ln = ac_codes[(g << 4) | 0]
                    b.emit(c, ln)
                    b.emit(eobrun - (1 << g), g)
                    eobrun = 0
                for bit in be:
                    b.emit(bit, 1)
                be = []

            u = 0
            for br_ in range(by):
                for bc in range(bx):
                    if ri and u and u % ri == 0:
                        flush_eob_r()
                        b.restart((u // ri - 1) & 7)
                    u += 1
                    blk = coefs[ci][br_, bc]
                    tvals = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
                    if 1 not in tvals:
                        # EOB-phase block: history correction bits only
                        eobrun += 1
                        be.extend(t & 1 for t in tvals if t > 1)
                        if eobrun == 32767:
                            flush_eob_r()
                        continue
                    flush_eob_r()
                    # libjpeg's emit shape: the ZRL check runs at EVERY
                    # nonzero encounter (history ones too, before their
                    # bit buffers) so buffered correction bits flush in
                    # exactly the order the decoder walk consumes them
                    # around each 16-zero boundary; past the last newly
                    # nonzero coefficient (> last_new) zeros fold into
                    # the EOB run instead.
                    last_new = max(off for off, t in enumerate(tvals)
                                   if t == 1)
                    r = 0
                    br_bits: list[int] = []
                    for off, t in enumerate(tvals):
                        if t == 0:
                            r += 1
                            continue
                        while r > 15 and off <= last_new:
                            c, ln = ac_codes[0xF0]
                            b.emit(c, ln)
                            for bit in br_bits:
                                b.emit(bit, 1)
                            br_bits = []
                            r -= 16
                        if t > 1:
                            br_bits.append(t & 1)
                            continue
                        c, ln = ac_codes[(r << 4) | 1]
                        b.emit(c, ln)
                        b.emit(1 if int(blk[ss + off]) > 0 else 0, 1)
                        for bit in br_bits:
                            b.emit(bit, 1)
                        br_bits = []
                        r = 0
                    if r > 0 or br_bits:
                        eobrun += 1
                        be.extend(br_bits)
            flush_eob_r()
            b.pad()
            out += b.out

    out += b"\xff\xd9"
    return bytes(out)


class _Vp8lBits:
    """LSB-first bit writer; prefix codes go on the wire MSB-first
    (the DEFLATE convention functions/vp8l.py reads)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nb = 0

    def emit(self, v: int, n: int):
        for i in range(n):
            if self.nb == 0:
                self.out.append(0)
            self.out[-1] |= ((v >> i) & 1) << self.nb
            self.nb = (self.nb + 1) & 7
            if self.nb == 0:
                pass

    def emit_code(self, code: int, n: int):
        for i in range(n - 1, -1, -1):
            self.emit((code >> i) & 1, 1)


def _vp8l_balanced_lengths(n: int) -> dict[int, int]:
    """Complete canonical code over n symbols using at most three
    adjacent lengths (never a single length, so the code-length code
    itself always has >= 2 used symbols)."""
    if n < 2:
        raise ValueError("need >= 2 symbols")
    L = max(2, (n - 1).bit_length())
    if n == (1 << L):  # perturb: 1 at L-1, n-3 at L, 2 at L+1
        lengths = {0: L - 1}
        for s in range(1, n - 2):
            lengths[s] = L
        lengths[n - 2] = L + 1
        lengths[n - 1] = L + 1
        return lengths
    k = (1 << L) - n  # k symbols at L-1, rest at L (Kraft == 1)
    return {s: (L - 1 if s < k else L) for s in range(n)}


def _vp8l_canon_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    codes = {}
    code = 0
    prev = 0
    for sym in sorted((s for s, l in lengths.items() if l),
                      key=lambda s: (lengths[s], s)):
        l = lengths[sym]
        code <<= (l - prev)
        codes[sym] = (code, l)
        code += 1
        prev = l
    return codes


def _vp8l_emit_code_table(b: _Vp8lBits, lengths: dict[int, int],
                          alphabet_size: int):
    """Emit one prefix code the length-coded way: 3-bit code-length-
    code lengths in CL_ORDER covering the used lengths, no max_symbol,
    every symbol's length emitted literally (no repeats)."""
    from ..functions.vp8l import CL_ORDER

    b.emit(0, 1)  # not simple
    used = sorted(set(lengths.values()) | {0})
    # code-length code: length 1/2 codes over the used CL symbols
    if len(used) == 2:
        cl_lengths = {used[0]: 1, used[1]: 1}
    elif len(used) == 3:
        cl_lengths = {used[0]: 2, used[1]: 1, used[2]: 2}
    elif len(used) == 4:
        cl_lengths = {used[0]: 2, used[1]: 2, used[2]: 2, used[3]: 2}
    else:
        raise ValueError("encoder supports <= 4 distinct code lengths")
    need = max(CL_ORDER.index(s) for s in cl_lengths) + 1
    b.emit(max(0, need - 4), 4)
    for i in range(max(4, need)):
        b.emit(cl_lengths.get(CL_ORDER[i], 0), 3)
    b.emit(0, 1)  # no max_symbol
    cl_codes = _vp8l_canon_codes(cl_lengths)
    for s in range(alphabet_size):
        c, ln = cl_codes[lengths.get(s, 0)]
        b.emit_code(c, ln)


def _vp8l_prefix_value(v: int) -> tuple[int, int, int]:
    """value >= 1 -> (prefix_code, extra_bits_value, extra_bits_n)."""
    if v <= 4:
        return v - 1, 0, 0
    for code in range(4, 40):
        extra = (code - 2) >> 1
        lo = ((2 + (code & 1)) << extra) + 1
        if lo <= v <= lo + (1 << extra) - 1:
            return code, v - lo, extra
    raise ValueError("value out of LZ77 prefix range")


def encode_webp_lossless(px, cache_bits: int = 0, rle: bool = False,
                         transform: str | None = None,
                         size_bits: int = 2, palette=None,
                         meta_bits: int | None = None,
                         simple: bool = False,
                         plane_ref: tuple[int, int] | None = None) -> bytes:
    """(h, w, 3|4) uint8 -> lossless WebP (RIFF + VP8L), the synthetic
    twin of functions/vp8l.decode_webp.  Balanced complete prefix
    codes emitted through the full code-length-code machinery; LZ77
    runs (``rle=True``) as plain-distance-1 backward references;
    ``cache_bits`` > 0 enables the color cache (hash-hit pixels emit
    cache symbols).  ``transform``: None | 'subtract_green' |
    'predictor' (mode-2/top residuals with a literal-coded mode
    subimage) | 'color' (fixed transform elements per block) |
    'palette' (color-indexing; pass ``palette`` as a list of (a,r,g,b)
    tuples; indices bundle sub-byte when <= 16 entries).
    ``meta_bits``: emit a two-group META PREFIX (checkerboard entropy
    image; literal-only).  ``simple=True``: channels with <= 2
    distinct values use the spec's short simple-code header.
    ``plane_ref=(prefix, dist_code)``: emit the first ``prefix``
    pixels as literals and the remainder as LZ77 backward references
    carrying EXACTLY that raw distance code (<= 120 = the 2D
    proximity map, > 120 = plain distance + 120) — the caller must
    supply pixels that actually satisfy the copy relation."""
    import numpy as np

    px = np.asarray(px, dtype=np.uint8)
    h, w = px.shape[0], px.shape[1]
    has_alpha = px.shape[2] == 4
    # to (a, r, g, b) tuples, row-major
    if has_alpha:
        pixels = [(int(p[3]), int(p[0]), int(p[1]), int(p[2]))
                  for row in px for p in row]
    else:
        pixels = [(255, int(p[0]), int(p[1]), int(p[2]))
                  for row in px for p in row]

    b = _Vp8lBits()
    b.emit(0x2F, 8)
    b.emit(w - 1, 14)
    b.emit(h - 1, 14)
    b.emit(1 if has_alpha else 0, 1)
    b.emit(0, 3)  # version

    from ..functions.vp8l import _cdelta, predict_pixel

    cur_w = w
    if transform == "subtract_green":
        b.emit(1, 1)
        b.emit(2, 2)
        pixels = [(a, (r - g) & 0xFF, g, (bl - g) & 0xFF)
                  for (a, r, g, bl) in pixels]
    elif transform == "predictor":
        b.emit(1, 1)
        b.emit(0, 2)
        b.emit(size_bits - 2, 3)
        sw = -(-w // (1 << size_bits))
        sh = -(-h // (1 << size_bits))
        # mode subimage: mode 2 (top) everywhere, green channel
        modes = [(255, 0, 2, 0)] * (sw * sh)
        _vp8l_emit_subimage(b, modes)
        res = list(pixels)
        for i in range(w * h - 1, -1, -1):
            x, y = i % w, i // w
            if x == 0 and y == 0:
                pred = (255, 0, 0, 0)
            elif y == 0:
                pred = pixels[i - 1]
            elif x == 0:
                pred = pixels[i - w]
            else:
                left, top, tl = pixels[i - 1], pixels[i - w], pixels[i - w - 1]
                tr = pixels[i - w + 1]  # x=w-1: current row's first px
                pred = predict_pixel(2, left, top, tr, tl)
            res[i] = tuple((p - q) & 0xFF for p, q in zip(pixels[i], pred))
        pixels = res
    elif transform == "color":
        b.emit(1, 1)
        b.emit(1, 2)
        b.emit(size_bits - 2, 3)
        sw = -(-w // (1 << size_bits))
        sh = -(-h // (1 << size_bits))
        # fixed elements: g2r=0x10, g2b=0x08, r2b=0xF0 (negative)
        g2r, g2b, r2b = 0x10, 0x08, 0xF0
        elems = [(255, r2b, g2b, g2r)] * (sw * sh)
        _vp8l_emit_subimage(b, elems)
        out = []
        for (a, r, g, bl) in pixels:
            nr = (r - _cdelta(g2r, g)) & 0xFF
            nb = (bl - _cdelta(g2b, g) - _cdelta(r2b, r)) & 0xFF
            out.append((a, nr, g, nb))
        pixels = out
    elif transform == "palette":
        if palette is None:
            raise ValueError("palette transform needs palette")
        b.emit(1, 1)
        b.emit(3, 2)
        b.emit(len(palette) - 1, 8)
        # delta-coded palette subimage (1 x size)
        deltas = []
        prev = (0, 0, 0, 0)
        for p in palette:
            deltas.append(tuple((a - q) & 0xFF for a, q in zip(p, prev)))
            prev = p
        _vp8l_emit_subimage(b, deltas)
        lut = {p: i for i, p in enumerate(palette)}
        idx = [lut[p] for p in pixels]
        n = len(palette)
        wbits = 3 if n <= 2 else 2 if n <= 4 else 1 if n <= 16 else 0
        ppb = 1 << wbits
        ibits = 8 >> wbits
        cur_w = -(-w // ppb)
        packed = []
        for y in range(h):
            row = idx[y * w:(y + 1) * w]
            for sx in range(cur_w):
                g = 0
                for j in range(ppb):
                    x = sx * ppb + j
                    if x < w:
                        g |= row[x] << (j * ibits)
                packed.append((255, 0, g, 0))
        pixels = packed
    elif transform is not None:
        raise ValueError(f"unknown transform {transform!r}")
    b.emit(0, 1)  # end of transforms

    _vp8l_emit_spatial(b, pixels, cache_bits=cache_bits, rle=rle,
                       w=cur_w, h=h, meta_bits=meta_bits, simple=simple,
                       plane_ref=plane_ref)

    payload = bytes(b.out)
    if len(payload) & 1:
        chunk = payload + b"\x00"
    else:
        chunk = payload
    riff = (b"VP8L" + len(payload).to_bytes(4, "little") + chunk)
    return (b"RIFF" + (4 + len(riff)).to_bytes(4, "little") + b"WEBP"
            + riff)


def _vp8l_emit_subimage(b: "_Vp8lBits", pixels):
    """Emit a (transform/palette) subimage: no cache, literal-coded
    balanced trees, no LZ77."""
    b.emit(0, 1)  # no color cache
    _vp8l_emit_groups_and_pixels(b, pixels, cache_bits=0, rle=False)


def _vp8l_emit_simple_code(b: "_Vp8lBits",
                           syms: list[int]) -> dict[int, tuple[int, int]]:
    """Emit a SIMPLE prefix code (1 or 2 symbols, the spec's short
    header) and return the symbol->(code, length) map: one symbol
    reads ZERO bits, two symbols one bit each (canonical: smaller
    symbol = code 0)."""
    syms = sorted(set(syms))
    b.emit(1, 1)  # simple
    b.emit(len(syms) - 1, 1)
    first_is_8bit = syms[0] > 1
    b.emit(1 if first_is_8bit else 0, 1)
    b.emit(syms[0], 8 if first_is_8bit else 1)
    if len(syms) == 1:
        return {syms[0]: (0, 0)}
    b.emit(syms[1], 8)
    return {syms[0]: (0, 1), syms[1]: (1, 1)}


def _vp8l_channel_code(b: "_Vp8lBits", used: set[int], alphabet_size: int,
                       allow_simple: bool) -> dict[int, tuple[int, int]]:
    """One channel's prefix code: a SIMPLE code when <= 2 symbols are
    used (and the first fits the 8-bit field), else the balanced
    complete table through the code-length-code machinery."""
    if allow_simple and 1 <= len(used) <= 2 and max(used) <= 255:
        return _vp8l_emit_simple_code(b, sorted(used))
    lengths = _vp8l_balanced_lengths(alphabet_size)
    _vp8l_emit_code_table(b, lengths, alphabet_size)
    return _vp8l_canon_codes(lengths)


def _vp8l_emit_spatial(b: "_Vp8lBits", pixels, cache_bits: int,
                       rle: bool, w: int | None = None,
                       h: int | None = None,
                       meta_bits: int | None = None,
                       simple: bool = False,
                       plane_ref: tuple[int, int] | None = None):
    """Emit the main spatially-coded image: optional color cache;
    ``meta_bits`` adds a META PREFIX — a checkerboard entropy image
    assigning each (1<<meta_bits)-sized block to one of TWO prefix
    code groups (literal-only; exercises the decoder's group
    selection); ``simple=True`` lets channels with <= 2 distinct
    values use the spec's short simple-code header."""
    if cache_bits:
        b.emit(1, 1)
        b.emit(cache_bits, 4)
    else:
        b.emit(0, 1)
    if meta_bits is None:
        b.emit(0, 1)  # no meta prefix
        _vp8l_emit_groups_and_pixels(b, pixels, cache_bits, rle,
                                     simple=simple, plane_ref=plane_ref)
        return
    if rle or cache_bits or w is None or h is None or plane_ref:
        raise ValueError("meta-prefix emission is literal-only")
    b.emit(1, 1)
    b.emit(meta_bits - 2, 3)
    mb = meta_bits
    mw = -(-w // (1 << mb))
    mh = -(-h // (1 << mb))
    meta_px = [(255, 0, (bx + by) % 2, 0)
               for by in range(mh) for bx in range(mw)]
    _vp8l_emit_subimage(b, meta_px)
    # the decoder reads max(group)+1 tables — a 1-block meta image
    # only ever names group 0, so emitting two would desync the stream
    n_groups = max(p[2] for p in meta_px) + 1
    tabs = []
    for gi in range(n_groups):
        gl = _vp8l_balanced_lengths(256 + 24)
        if gi % 2 == 1:
            # odd groups get a ROTATED green length assignment (same
            # multiset, so Kraft stays 1) — the groups' canonical codes
            # genuinely differ, so a decoder that picks the wrong group
            # (ignores the entropy image, swaps block x/y, always reads
            # group 0) desyncs instead of silently round-tripping
            n = 256 + 24
            gl = {s: gl[(s + n // 2) % n] for s in range(n)}
        cl = _vp8l_balanced_lengths(256)
        dl = _vp8l_balanced_lengths(40)
        _vp8l_emit_code_table(b, gl, 256 + 24)
        for _ in range(3):
            _vp8l_emit_code_table(b, cl, 256)
        _vp8l_emit_code_table(b, dl, 40)
        tabs.append((_vp8l_canon_codes(gl), _vp8l_canon_codes(cl)))
    for i, p in enumerate(pixels):
        x, y = i % w, i // w
        g_codes, c_codes = tabs[((x >> mb) + (y >> mb)) % 2 % n_groups]
        a, r, g, bl = p
        for sym, cm in ((g, g_codes), (r, c_codes), (bl, c_codes),
                        (a, c_codes)):
            c, ln = cm[sym]
            b.emit_code(c, ln)


def _vp8l_emit_groups_and_pixels(b: "_Vp8lBits", pixels,
                                 cache_bits: int, rle: bool,
                                 simple: bool = False,
                                 plane_ref: tuple[int, int] | None = None):
    cache_size = (1 << cache_bits) if cache_bits else 0
    green_n = 256 + 24 + cache_size
    if simple and not rle and not cache_bits:
        # each channel gets its own simple code over ITS used symbols
        # (stream tree order: green, red, blue, alpha, distance) — a
        # constant channel reads ZERO bits, a two-tone channel one bit
        g_codes = _vp8l_channel_code(b, {p[2] for p in pixels}, green_n,
                                     True)
        r_codes = _vp8l_channel_code(b, {p[1] for p in pixels}, 256, True)
        bl_codes = _vp8l_channel_code(b, {p[3] for p in pixels}, 256, True)
        a_codes = _vp8l_channel_code(b, {p[0] for p in pixels}, 256, True)
        d_codes = _vp8l_emit_simple_code(b, [0])  # unused distance tree
    else:
        gl = _vp8l_balanced_lengths(green_n)
        cl = _vp8l_balanced_lengths(256)
        dl = _vp8l_balanced_lengths(40)
        _vp8l_emit_code_table(b, gl, green_n)
        for _ in range(3):  # red, blue, alpha share the 256-symbol shape
            _vp8l_emit_code_table(b, cl, 256)
        _vp8l_emit_code_table(b, dl, 40)
        g_codes = _vp8l_canon_codes(gl)
        r_codes = bl_codes = a_codes = _vp8l_canon_codes(cl)
        d_codes = _vp8l_canon_codes(dl)
    cache = [(0, 0, 0, 0)] * cache_size

    def cache_key(p):
        argb = (p[0] << 24) | (p[1] << 16) | (p[2] << 8) | p[3]
        return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - cache_bits)

    i = 0
    n = len(pixels)
    while i < n:
        p = pixels[i]
        if plane_ref is not None and i >= plane_ref[0]:
            # backward reference with the EXACT raw distance code asked
            # for (<= 120 exercises the decoder's 2D proximity map)
            run = min(n - i, 4096)
            code, ev, en = _vp8l_prefix_value(run)
            if code > 23:
                raise ValueError("LZ77 length out of the 24-code range")
            c, ln = g_codes[256 + code]
            b.emit_code(c, ln)
            b.emit(ev, en)
            dcode, dev, den = _vp8l_prefix_value(plane_ref[1])
            c, ln = d_codes[dcode]
            b.emit_code(c, ln)
            b.emit(dev, den)
            if cache_size:  # decoder inserts every copied pixel
                for j in range(i, i + run):
                    cache[cache_key(pixels[j])] = pixels[j]
            i += run
            continue
        if rle and i > 0 and pixels[i - 1] == p:
            run = 1
            while i + run < n and pixels[i + run] == p and run < 4096:
                run += 1
            if run >= 3:
                code, ev, en = _vp8l_prefix_value(run)
                c, ln = g_codes[256 + code]
                b.emit_code(c, ln)
                b.emit(ev, en)
                dcode, dev, den = _vp8l_prefix_value(121)  # distance 1
                c, ln = d_codes[dcode]
                b.emit_code(c, ln)
                b.emit(dev, den)
                if cache_size:  # decoder inserts every copied pixel
                    cache[cache_key(p)] = p
                i += run
                continue
        if cache_size:
            k = cache_key(p)
            if cache[k] == p:
                c, ln = g_codes[256 + 24 + k]
                b.emit_code(c, ln)
                i += 1
                continue
            cache[k] = p
        a, r, g, bl = p
        c, ln = g_codes[g]
        b.emit_code(c, ln)
        c, ln = r_codes[r]
        b.emit_code(c, ln)
        c, ln = bl_codes[bl]
        b.emit_code(c, ln)
        c, ln = a_codes[a]
        b.emit_code(c, ln)
        i += 1


# --- lossy WebP (VP8 key frame) synthetic encoder --------------------
#
# The synthetic twin of functions/vp8.decode_vp8 for the DRIVER GATE:
# emits a spec-valid RFC 6386 key frame whose reconstruction is
# CLOSED-FORM — flat luma `value`, flat chroma 128 — so a SQL twin can
# derive the decoded pixel stats exactly.  Only macroblock (0,0)
# carries coefficients (one Y2 DC token whose WHT+IDCT residual lifts
# the 128 DC prediction to `value`); every other MB is skipped and
# inherits the value through DC_PRED.  The in-loop filter runs (both
# profiles reachable) but is a no-op on flat planes, which keeps the
# closed form while still driving the filter code path.  Validated
# two independent ways in tests/test_vp8.py: our decoder AND the
# system libwebp both reconstruct the exact flat planes.


class _Vp8BoolEnc:
    """RFC 6386 §7.3 boolean encoder (the spec's reference algorithm)
    — the arithmetic inverse of functions/vp8._Bool."""

    def __init__(self):
        self.range = 255
        self.bottom = 0
        self.bit_count = 24
        self.out = bytearray()

    def _carry(self):
        i = len(self.out) - 1
        while i >= 0 and self.out[i] == 255:
            self.out[i] = 0
            i -= 1
        if i < 0:
            raise AssertionError("carry out of stream start")
        self.out[i] += 1

    def put(self, prob: int, val: int) -> None:
        split = 1 + (((self.range - 1) * prob) >> 8)
        if val:
            self.bottom += split
            self.range -= split
            if self.bottom > 0xFFFFFFFF:  # carry past the 32-bit window
                self.bottom &= 0xFFFFFFFF
                self._carry()
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            if self.bottom & (1 << 31):
                self._carry()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= (1 << 24) - 1
                self.bit_count = 8

    def literal(self, v: int, nbits: int) -> None:
        for k in range(nbits - 1, -1, -1):
            self.put(128, (v >> k) & 1)

    def flush(self) -> bytes:
        for _ in range(32):
            if self.bottom & (1 << 31):
                self._carry()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= (1 << 24) - 1
                self.bit_count = 8
        return bytes(self.out)


def _vp8_put_token(e: _Vp8BoolEnc, p, value: int) -> None:
    """Encode one nonzero DCT coefficient token + sign through the
    RFC 6386 §13.2 tree with probabilities ``p`` (the exact inverse of
    the magnitude branches in functions/vp8._get_coeffs)."""
    from ..functions.vp8_tables import PCAT

    m = abs(value)
    assert 1 <= m <= 67 + 2047
    e.put(p[0], 1)          # not EOB
    e.put(p[1], 1)          # not zero
    if m == 1:
        e.put(p[2], 0)
    else:
        e.put(p[2], 1)
        if m <= 4:
            e.put(p[3], 0)
            if m == 2:
                e.put(p[4], 0)
            else:
                e.put(p[4], 1)
                e.put(p[5], m - 3)
        elif m <= 10:
            e.put(p[3], 1)
            e.put(p[6], 0)
            if m <= 6:
                e.put(p[7], 0)
                e.put(159, m - 5)
            else:
                e.put(p[7], 1)
                x = m - 7
                e.put(165, x >> 1)
                e.put(145, x & 1)
        else:
            e.put(p[3], 1)
            e.put(p[6], 1)
            if m <= 18:
                e.put(p[8], 0)
                e.put(p[9], 0)
                cat, base = PCAT[2], 11
            elif m <= 34:
                e.put(p[8], 0)
                e.put(p[9], 1)
                cat, base = PCAT[3], 19
            elif m <= 66:
                e.put(p[8], 1)
                e.put(p[10], 0)
                cat, base = PCAT[4], 35
            else:
                e.put(p[8], 1)
                e.put(p[10], 1)
                cat, base = PCAT[5], 67
            add = m - base
            for k in range(len(cat) - 1, -1, -1):
                e.put(cat[len(cat) - 1 - k], (add >> k) & 1)
    e.put(128, 1 if value < 0 else 0)  # sign


def encode_webp_lossy_flat(value: int, w: int, h: int,
                           filter_level: int = 20,
                           filter_type: int = 0,
                           nparts: int = 1,
                           lf_delta: int | None = None) -> bytes:
    """Flat-``value`` lossy WebP: RIFF container around a VP8 key
    frame that reconstructs luma == ``value`` and chroma == 128 at
    every pixel (see module comment above).  ``filter_type`` 0=normal
    1=simple per the frame-header bit; the filter is a no-op on the
    flat output either way.  Quantizer index 0 (y2_dc factor 8), so
    the single Y2 DC token is ``8 * (value - 128)`` — exact through
    the WHT ``(d+3)>>3`` and IDCT ``(e+4)>>3`` integer paths.

    Two decoder branches NO real encoder output reaches (measured:
    libwebp keyframes are always 1-partition / no lf deltas) are
    reachable here and stay closed-form:

    - ``nparts`` in {1,2,4,8}: token partitions with the 3-byte size
      table; the FIRST MB of every row is coded non-skip (rows > 0
      carry all-EOB token blocks), so each partition that owns a row
      is genuinely READ, not just parsed.
    - ``lf_delta``: enables loop-filter adjustments and writes
      ref_lf_delta[0] (the keyframe intra-frame delta) — shifts the
      per-MB filter level, still a no-op on flat planes.
    """
    from ..functions.vp8_tables import BANDS, COEFF_PROBS, COEFF_UPDATE_PROBS

    if not (0 <= value <= 255):
        raise ValueError("flat value must be a byte")
    if nparts not in (1, 2, 4, 8):
        raise ValueError("nparts must be 1, 2, 4 or 8")
    mb_w, mb_h = (w + 15) >> 4, (h + 15) >> 4
    r = value - 128
    coeff = 8 * r  # y2_dc = DC_QLOOKUP[0] * 2 = 8; see docstring

    # --- partition 1: compressed header + per-MB modes ---
    e = _Vp8BoolEnc()
    e.put(128, 0)                 # color_space
    e.put(128, 0)                 # clamping_type
    e.put(128, 0)                 # segmentation disabled
    e.put(128, filter_type)
    e.literal(filter_level, 6)
    e.literal(0, 3)               # sharpness
    if lf_delta is None:
        e.put(128, 0)             # no loop-filter adjustments
    else:
        e.put(128, 1)             # lf adjustments enabled
        e.put(128, 1)             # mode_ref_lf_delta_update
        e.put(128, 1)             # ref_lf_delta[0] (intra frame) present
        e.literal(abs(lf_delta), 6)
        e.put(128, 1 if lf_delta < 0 else 0)
        for _ in range(3):        # ref deltas 1-3 absent
            e.put(128, 0)
        for _ in range(4):        # mode deltas absent (no B_PRED MBs)
            e.put(128, 0)
    e.literal({1: 0, 2: 1, 4: 2, 8: 3}[nparts], 2)
    e.literal(0, 7)               # y_ac quantizer index
    for _ in range(5):
        e.put(128, 0)             # no quantizer deltas
    e.put(128, 0)                 # refresh_entropy_probs
    for t in range(4):            # no coefficient prob updates
        for b in range(8):
            for c in range(3):
                upd = COEFF_UPDATE_PROBS[t][b][c]
                for pi in range(11):
                    e.put(upd[pi], 0)
    e.put(128, 1)                 # mb_no_coeff_skip on
    e.literal(128, 8)             # skip probability
    for my in range(mb_h):
        for mx in range(mb_w):
            coded = mx == 0 and (my == 0 and coeff != 0 or
                                 my > 0 and nparts > 1)
            e.put(128, 0 if coded else 1)     # skip flag
            e.put(145, 1)                     # kf ymode tree -> DC_PRED
            e.put(156, 0)
            e.put(163, 0)
            e.put(142, 0)                     # uv mode tree -> DC_PRED
    part1 = e.flush()

    # --- token partitions (MB rows round-robin, RFC §9.5) ---
    def eob_blocks(enc, with_y2_coeff):
        if with_y2_coeff:
            _vp8_put_token(enc, COEFF_PROBS[1][0][0], coeff)  # Y2 DC
            nctx = 1 if abs(coeff) == 1 else 2
            enc.put(COEFF_PROBS[1][BANDS[1]][nctx][0], 0)     # Y2 EOB
        else:
            enc.put(COEFF_PROBS[1][0][0][0], 0)               # Y2 EOB only
        py = COEFF_PROBS[0][BANDS[1]][0]
        for _ in range(16):                                   # Y blocks
            enc.put(py[0], 0)
        pc = COEFF_PROBS[2][0][0]
        for _ in range(8):                                    # U+V blocks
            enc.put(pc[0], 0)

    encs = [_Vp8BoolEnc() for _ in range(nparts)]
    for my in range(mb_h):
        enc = encs[my % nparts]
        if my == 0:
            if coeff != 0:
                eob_blocks(enc, True)
        elif nparts > 1:
            eob_blocks(enc, False)
    parts = [enc.flush() for enc in encs]
    sizes = b"".join(len(p).to_bytes(3, "little") for p in parts[:-1])
    tokens = sizes + b"".join(parts)

    tag = (len(part1) << 5) | (1 << 4)  # key frame, version 0, shown
    frame = (bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
             + b"\x9d\x01\x2a"
             + bytes([w & 0xFF, (w >> 8) & 0x3F, h & 0xFF, (h >> 8) & 0x3F])
             + part1 + tokens)
    chunk = frame + (b"\x00" if len(frame) & 1 else b"")
    riff = b"VP8 " + len(frame).to_bytes(4, "little") + chunk
    return (b"RIFF" + (4 + len(riff)).to_bytes(4, "little") + b"WEBP"
            + riff)


def encode_jpeg_arith(comp_coefs, samplings=None,
                      w: int | None = None, h: int | None = None) -> bytes:
    """Quantized zigzag coefficient grids -> ARITHMETIC-coded
    sequential JPEG (SOF9), the synthetic twin of the T.81 Annex D
    QM-coder decode path (functions/jpeg_arith.py).

    Same grid conventions as :func:`encode_jpeg_progressive`:
    ``comp_coefs`` is one ``(by_pad, bx_pad, 64)`` int array per
    component (1 = grayscale, 3 = YCbCr), zigzag order, padded to the
    full MCU coverage of ``samplings``.  Unit quant tables; one
    interleaved scan, no restarts; an explicit DAC marker pins the
    default conditioning (DC L=0/U=1, AC Kx=5).  Streams from this
    encoder are decoded coefficient-identically by the system libjpeg
    in the differential tests — encoder and decoder are each proven
    against the independent implementation, not just each other."""
    import numpy as np

    from ..functions.jpeg_arith import encode_arith_scan

    coefs = [np.asarray(c, dtype=np.int64) for c in comp_coefs]
    ncomp = len(coefs)
    if ncomp not in (1, 3):
        raise ValueError("1 or 3 components")
    if samplings is None:
        samplings = [(1, 1)] * ncomp
    hmax = max(s[0] for s in samplings)
    vmax = max(s[1] for s in samplings)
    mcuy = coefs[0].shape[0] // samplings[0][1]
    mcux = coefs[0].shape[1] // samplings[0][0]
    for c, (hi, vi) in zip(coefs, samplings):
        if c.shape != (mcuy * vi, mcux * hi, 64):
            raise ValueError("coefficient grid inconsistent with sampling")
    if w is None:
        w = mcux * hmax * 8
    if h is None:
        h = mcuy * vmax * 8

    def seg(marker: int, body: bytes) -> bytes:
        return (bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big")
                + body)

    dqt = seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof_body = bytearray([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof_body += bytes([ncomp])
    for ci, (hi, vi) in enumerate(samplings):
        sof_body += bytes([ci + 1, (hi << 4) | vi, 0])
    sof = seg(0xC9, bytes(sof_body))
    # explicit default conditioning (decoders default to the same)
    dac = seg(0xCC, bytes([0x00, 0x10, 0x10, 0x05]))
    sos_body = bytearray([ncomp])
    for ci in range(ncomp):
        sos_body += bytes([ci + 1, 0x00])
    sos_body += bytes([0, 63, 0])
    sos = seg(0xDA, bytes(sos_body))
    plan = [(0, 0, hi, vi) for (hi, vi) in samplings]
    ent = encode_arith_scan(coefs, plan, mcux, mcuy)
    return b"\xff\xd8" + dqt + sof + dac + sos + ent + b"\xff\xd9"


def encode_jpeg_arith_progressive(comp_coefs, samplings=None,
                                  w: int | None = None,
                                  h: int | None = None,
                                  restart_interval: int = 0) -> bytes:
    """Quantized zigzag coefficient grids -> ARITHMETIC-coded
    PROGRESSIVE JPEG (SOF10), the synthetic twin of the T.81 Annex G
    × Annex D decode path (functions/jpeg_arith.decode_arith_prog_scan).

    Same grid conventions and the same scan script as
    :func:`encode_jpeg_progressive` (DC first interleaved at Al=1, DC
    refine to Al=0, per-component AC first over bands 1..5 / 6..63 at
    Al=1, AC refine of both bands to Al=0) — but every scan is
    QM-coded with per-scan statistics areas, a fresh coder per scan
    and per restart segment, and the explicit DAC default
    conditioning.  ``restart_interval`` counts MCUs in interleaved DC
    scans and blocks in single-component scans, like the Huffman
    twin.  Streams from this encoder are decoded
    coefficient-identically by the system libjpeg in the differential
    tests."""
    import numpy as np

    from ..functions.jpeg_arith import (DEFAULT_AC_KX, DEFAULT_DC_COND,
                                        QMEncoder, _encode_ac_block,
                                        _encode_ac_refine_block,
                                        _encode_dc_block, _Stats)

    coefs = [np.asarray(c, dtype=np.int64) for c in comp_coefs]
    ncomp = len(coefs)
    if ncomp not in (1, 3):
        raise ValueError("1 or 3 components")
    if samplings is None:
        samplings = [(1, 1)] * ncomp
    hmax = max(s[0] for s in samplings)
    vmax = max(s[1] for s in samplings)
    mcuy = coefs[0].shape[0] // samplings[0][1]
    mcux = coefs[0].shape[1] // samplings[0][0]
    for c, (hi, vi) in zip(coefs, samplings):
        if c.shape != (mcuy * vi, mcux * hi, 64):
            raise ValueError("coefficient grid inconsistent with sampling")
    if w is None:
        w = mcux * hmax * 8
    if h is None:
        h = mcuy * vmax * 8
    if -(-w // (8 * hmax)) != mcux or -(-h // (8 * vmax)) != mcuy:
        raise ValueError("frame dims inconsistent with the MCU grid")

    def seg(marker: int, body: bytes) -> bytes:
        return (bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big")
                + body)

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") \
        + bytes([ncomp])
    for ci, (hi, vi) in enumerate(samplings):
        sof += bytes([ci + 1, (hi << 4) | vi, 0])
    out += seg(0xCA, sof)
    # explicit default conditioning (decoders default to the same)
    out += seg(0xCC, bytes([0x00, 0x10, 0x10, 0x05]))
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))

    def sos(comp_ids: list[int], ss: int, se: int, ah: int,
            al: int) -> bytes:
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            body += bytes([cid, 0x00])  # DC / AC conditioning table 0
        return seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    ri = restart_interval
    dl, du = DEFAULT_DC_COND
    kx = DEFAULT_AC_KX

    class _Scan:
        """One scan's QM coder + stats, restarted per RSTn segment."""

        def __init__(self):
            self.enc = QMEncoder()
            self.stats = _Stats()
            self.ent = bytearray()

        def restart(self, idx: int):
            self.ent += self.enc.finish()
            self.ent += bytes([0xFF, 0xD0 + idx])
            self.enc = QMEncoder()
            self.stats = _Stats()

        def finish(self) -> bytes:
            return bytes(self.ent + self.enc.finish())

    # --- DC first (Al=1) + DC refine (Al=0) ----------------------------
    for ah, al in ((0, 1), (1, 0)):
        out += sos(list(range(1, ncomp + 1)), 0, 0, ah, al)
        sc = _Scan()
        preds = [0] * ncomp
        ctxs = [0] * ncomp

        def dc_block(ci: int, dc: int):
            if ah == 0:
                didx, dmps = sc.stats.dc(0)
                ctxs[ci], preds[ci] = _encode_dc_block(
                    sc.enc, didx, dmps, ctxs[ci], preds[ci], dl, du,
                    dc >> al)  # arithmetic shift, like the C
            else:
                sc.enc.encode(sc.stats.fix_idx, sc.stats.fix_mps, 0,
                              (dc >> al) & 1)

        if ncomp == 1:
            by, bx = -(-h // 8), -(-w // 8)
            u = 0
            for br_ in range(by):
                for bc in range(bx):
                    if ri and u and u % ri == 0:
                        sc.restart((u // ri - 1) & 7)
                        preds = [0]
                        ctxs = [0]
                    dc_block(0, int(coefs[0][br_, bc, 0]))
                    u += 1
        else:
            for m in range(mcux * mcuy):
                if ri and m and m % ri == 0:
                    sc.restart((m // ri - 1) & 7)
                    preds = [0] * ncomp
                    ctxs = [0] * ncomp
                my, mx = m // mcux, m % mcux
                for ci, (hi, vi) in enumerate(samplings):
                    for bv in range(vi):
                        for bh in range(hi):
                            dc_block(ci, int(coefs[ci][my * vi + bv,
                                                       mx * hi + bh, 0]))
        out += sc.finish()

    # --- AC scans (per component, non-interleaved) ---------------------
    bands = [(1, 5), (6, 63)]
    for ah, al in ((0, 1), (1, 0)):
        for ci, (hi, vi) in enumerate(samplings):
            by = -(-(-(-h * vi // vmax)) // 8)
            bx = -(-(-(-w * hi // hmax)) // 8)
            for ss, se in bands:
                out += sos([ci + 1], ss, se, ah, al)
                sc = _Scan()
                u = 0
                for br_ in range(by):
                    for bc in range(bx):
                        if ri and u and u % ri == 0:
                            sc.restart((u // ri - 1) & 7)
                        aidx, amps = sc.stats.ac(0)
                        blk = coefs[ci][br_, bc]
                        if ah == 0:
                            _encode_ac_block(
                                sc.enc, aidx, amps, sc.stats.fix_idx,
                                sc.stats.fix_mps, blk, ss, se, al, kx)
                        else:
                            _encode_ac_refine_block(
                                sc.enc, aidx, amps, sc.stats.fix_idx,
                                sc.stats.fix_mps, blk, ss, se, ah, al)
                        u += 1
                out += sc.finish()
    return bytes(out + b"\xff\xd9")


def encode_jpeg_arith_gray_dc(blocks) -> bytes:
    """(by, bx) uint8 constant BLOCK values -> arithmetic-coded
    grayscale JPEG whose 8x8 blocks are flat (DC-only, unit quant) —
    the SOF9 analog of :func:`encode_jpeg_gray_dc`: each block
    decodes LOSSLESSLY, so a round-trip through the real QM decoder
    has a closed-form twin (catalog q82 arithmetic rows)."""
    import numpy as np

    blocks = np.asarray(blocks, dtype=np.int64)
    by, bx = blocks.shape
    coefs = np.zeros((by, bx, 64), dtype=np.int64)
    coefs[:, :, 0] = 8 * (blocks - 128)
    return encode_jpeg_arith([coefs])
