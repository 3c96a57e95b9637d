"""Independent straight-line oracle for the extraction spec (no Ray).

Implements the same spec as rust_paddle_ocr_ray/functions/{html,decode,
geometry}.py but independently: segmentation uses the stdlib
``html.parser.HTMLParser`` (vs the engine's regex tokenizer) and the
CTC decode is a naive per-character loop translated from the
reference's control flow (/root/reference/src/rec.rs:341-400) (vs the
engine's vectorized numpy scan).  Goldens generated from this module
are committed and asserted byte-identical against the Ray pipeline
(FIXTURES.md §3).
"""

from __future__ import annotations

import html as _htmlmod
import re
import unicodedata
from html.parser import HTMLParser

PUNCT = set(
    ",.!?;:\"'()[]{}-_/\\|@#$%&*+=~"
    "，。！？；：、「」『』（）【】《》—…·～"
)

BLOCK_TAGS = set(
    "html head body p div h1 h2 h3 h4 h5 h6 li ul ol dl dt dd table thead tbody "
    "tr td th title nav footer header aside article section main blockquote pre "
    "form figure figcaption fieldset select option textarea button noscript "
    "template".split()
)
VOID_BOUNDARY = {"br", "hr"}
RAWTEXT = {"script", "style"}
DROP_CONTAINER = {"noscript", "template"}
BOILER = {"nav", "footer", "header", "aside"}


class _Seg(HTMLParser):
    """Collect raw text runs + block boundaries with absolute offsets.

    Runs are (start, end, in_link) with offsets into the page string.
    """

    def __init__(self, page: str):
        super().__init__(convert_charrefs=False)
        self.page = page
        self.line_starts = [0]
        for k, ch in enumerate(page):
            if ch == "\n":
                self.line_starts.append(k + 1)
        self.stack: list[str] = []
        self.link = 0
        self.boiler = 0
        self.drop = 0
        self.rawtext = False
        self.blocks: list[dict] = []
        self.cur_runs: list[tuple[int, int, bool]] = []

    def _abs(self) -> int:
        line, col = self.getpos()
        return self.line_starts[line - 1] + col

    # --- text events ---
    def _text(self, raw_len: int) -> None:
        if self.drop > 0 or self.rawtext:
            return
        a = self._abs()
        self.cur_runs.append((a, a + raw_len, self.link > 0))

    def handle_data(self, data: str) -> None:
        self._text(len(data))

    def handle_entityref(self, name: str) -> None:
        a = self._abs()
        ln = 1 + len(name)
        if a + ln < len(self.page) and self.page[a + ln] == ";":
            ln += 1
        self._text(ln)

    def handle_charref(self, name: str) -> None:
        a = self._abs()
        ln = 2 + len(name)
        if a + ln < len(self.page) and self.page[a + ln] == ";":
            ln += 1
        self._text(ln)

    # --- structure events ---
    def _flush(self) -> None:
        if self.cur_runs:
            vis = 0
            link = 0
            for a, b, in_link in self.cur_runs:
                decoded = _htmlmod.unescape(self.page[a:b])
                v = sum(1 for ch in decoded if not ch.isspace())
                vis += v
                if in_link:
                    link += v
            if vis > 0:
                self.blocks.append(
                    {
                        "runs": [(a, b) for a, b, _ in self.cur_runs],
                        "vis": vis,
                        "link": link,
                        "tag": self.stack[-1] if self.stack else "",
                        "depth": len(self.stack),
                        "boiler": self.boiler > 0,
                    }
                )
        self.cur_runs = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in RAWTEXT:
            self._flush()
            self.rawtext = True  # HTMLParser delivers CDATA content via
            return               # handle_data; _text suppresses it
        if tag == "a":
            self.link += 1
            return
        if tag in VOID_BOUNDARY:
            self._flush()
            return
        if tag in BLOCK_TAGS:
            self._flush()
            self.stack.append(tag)
            if tag in BOILER:
                self.boiler += 1
            if tag in DROP_CONTAINER:
                self.drop += 1

    def handle_endtag(self, tag: str) -> None:
        if tag in RAWTEXT:
            self.rawtext = False
            return
        if tag == "a":
            self.link = max(0, self.link - 1)
            return
        if tag in VOID_BOUNDARY:
            self._flush()
            return
        if tag in BLOCK_TAGS:
            self._flush()
            if tag in self.stack:
                while self.stack:
                    t = self.stack.pop()
                    if t in BOILER:
                        self.boiler = max(0, self.boiler - 1)
                    if t in DROP_CONTAINER:
                        self.drop = max(0, self.drop - 1)
                    if t == tag:
                        break

    def handle_startendtag(self, tag: str, attrs) -> None:
        if tag in VOID_BOUNDARY:
            self._flush()

    def finish(self) -> None:
        self.close()
        self._flush()


def segment(page: str, cfg) -> list[dict]:
    """Oracle block segmentation -> span dicts (same keys as the engine)."""
    if not page:
        return []
    parser = _Seg(page)
    parser.feed(page)
    parser.finish()
    blocks = parser.blocks

    kept = []
    for blk in blocks:
        vis, link = blk["vis"], blk["link"]
        if vis <= 0:
            continue
        link_density = link / vis
        floor = cfg.density_length_floor
        lf = min(1.0, vis / cfg.density_length_norm)
        p = (1.0 - link_density) * (floor + (1.0 - floor) * lf)
        if blk["boiler"]:
            p *= cfg.boiler_penalty
        score = min(int(p * 255.0), 255)
        if score > cfg.threshold and vis > cfg.min_box_size:
            kept.append((blk, score))
            if len(kept) >= cfg.max_spans_per_page:
                break

    n = len(page)
    boxes = []
    for blk, score in kept:
        first = last = -1
        for a, b in blk["runs"]:
            for k in range(a, b):
                if not page[k].isspace():
                    first = k
                    break
            if first != -1:
                break
        for a, b in reversed(blk["runs"]):
            for k in range(b - 1, a - 1, -1):
                if not page[k].isspace():
                    last = k
                    break
            if last != -1:
                break
        if first == -1:
            continue
        left = max(first - cfg.rect_border_size, 0)
        right = min(last + cfg.rect_border_size, n - 1)
        top = page.count("\n", 0, left)
        bottom = page.count("\n", 0, right)
        boxes.append(
            {
                "left": left, "right": right, "top": top, "bottom": bottom,
                "tfirst": first, "tlast": last,
                "tag": blk["tag"], "depth": blk["depth"], "score": score,
            }
        )

    if cfg.merge_boxes and boxes:
        boxes = _merge(boxes, cfg.merge_threshold)

    spans = []
    for order, b in enumerate(boxes):
        spans.append(
            {
                "block_id": order,
                "start": b["left"],
                "end": b["right"] + 1,
                "tstart": b["tfirst"],
                "tend": b["tlast"] + 1,
                "line_start": b["top"],
                "line_end": b["bottom"],
                "tag": b["tag"],
                "depth": b["depth"],
                "order": order,
                "score": float(b["score"]),
                "raw": page[b["left"] : b["right"] + 1],
            }
        )
    return spans


def _overlap(a, b, thr) -> bool:
    horizontal = not (a["right"] + thr < b["left"] - thr or b["right"] + thr < a["left"] - thr)
    ah = a["bottom"] - a["top"] + 1
    bh = b["bottom"] - b["top"] + 1
    vt = int(min(ah, bh) * 0.4)
    if a["top"] <= b["top"]:
        vertical = a["bottom"] + vt >= b["top"]
    else:
        vertical = b["bottom"] + vt >= a["top"]
    return horizontal and vertical


def _merge(boxes, thr):
    result = []
    queue = [dict(b) for b in boxes]
    originals = [dict(b) for b in boxes]
    claimed = [False] * len(originals)
    while queue:
        cur = queue.pop(0)
        merged_any = False
        i = 0
        while i < len(queue):
            if _overlap(cur, queue[i], thr):
                o = queue.pop(i)
                cur = {
                    "left": min(cur["left"], o["left"]),
                    "right": max(cur["right"], o["right"]),
                    "top": min(cur["top"], o["top"]),
                    "bottom": max(cur["bottom"], o["bottom"]),
                }
                merged_any = True
            else:
                i += 1
        if merged_any:
            queue.insert(0, cur)
        else:
            result.append(cur)
    out = []
    for mb in result:
        contained = [
            k
            for k, ob in enumerate(originals)
            if ob["left"] >= mb["left"] and ob["right"] <= mb["right"]
            and ob["top"] >= mb["top"] and ob["bottom"] <= mb["bottom"]
        ]
        pick = None
        tfirst, tlast = mb["left"], mb["right"]
        if contained:
            tfirst = min(originals[k]["tfirst"] for k in contained)
            tlast = max(originals[k]["tlast"] for k in contained)
            for k in contained:
                if not claimed[k]:
                    pick = k
                    break
        rec = {
            "left": mb["left"], "right": mb["right"],
            "top": mb["top"], "bottom": mb["bottom"],
            "tfirst": tfirst, "tlast": tlast,
            "tag": "", "depth": 0, "score": 0,
        }
        if pick is not None:
            claimed[pick] = True
            rec["tag"] = originals[pick]["tag"]
            rec["depth"] = originals[pick]["depth"]
            rec["score"] = originals[pick]["score"]
        out.append(rec)
    return out


# ---------------------------------------------------------------------------
# recognition oracle
# ---------------------------------------------------------------------------

def build_keys(route: str) -> tuple[list[str], dict[str, int]]:
    """Same sentinel layout as the engine's Charset (src/rec.rs:55-59)."""
    from rust_paddle_ocr_ray.charset import charset_body  # charset TABLE is shared spec data

    body = charset_body(route)
    keys = [" "] + list(body) + [" "]
    index = {}
    for k, ch in enumerate(body):
        index[ch] = k + 1
    index[" "] = len(body) + 1
    return keys, index


def canonicalize(raw: str, route: str) -> str:
    s = raw
    i_gt, i_lt = s.find(">"), s.find("<")
    if i_gt != -1 and (i_lt == -1 or i_gt < i_lt):
        s = s[i_gt + 1 :]
    j_lt, j_gt = s.rfind("<"), s.rfind(">")
    if j_lt != -1 and (j_gt == -1 or j_gt < j_lt):
        s = s[:j_lt]
    s = re.sub(r"<!--.*?-->", " ", s, flags=re.S)
    s = re.sub(r"<[^>]*>", " ", s)
    s = _htmlmod.unescape(s)
    if route in ("zh", "ja"):
        s = unicodedata.normalize("NFKC", s)
    return re.sub(r"\s+", " ", s).strip()


def score_of(ch: str, p: int) -> float:
    h = (ord(ch) * 2654435761 + (p + 1) * 97) & 0xFFFFFFFF
    u = (h >> 16) / 65536.0
    if ch in PUNCT:
        return 0.05 + 0.90 * u
    return 0.62 + 0.38 * u


def decode(text: str, route: str, min_score: float = 0.6, punct_min: float = 0.1):
    """Naive per-char decode: the control flow of src/rec.rs:341-400."""
    keys, index = build_keys(route)
    # encode: leading blank + blank between adjacent equal non-punct chars
    timesteps: list[tuple[int, str]] = [(0, "")]
    prev = None
    for ch in text:
        if prev is not None and ch == prev and ch not in PUNCT:
            timesteps.append((0, ""))
        timesteps.append((index.get(ch, 0), ch))
        prev = ch

    results: list[tuple[str, float]] = []
    last_char: str | None = None
    for p, (idx, ch) in enumerate(timesteps):
        if idx > 0 and idx < len(keys):
            score = score_of(ch, p)
            threshold = punct_min if ch in PUNCT else min_score
            if score > threshold:
                if last_char != ch or ch in PUNCT:
                    results.append((ch, score))
                last_char = ch
            else:
                if ch in PUNCT and score > punct_min * 0.8:
                    results.append((ch, score))
                else:
                    last_char = None
        else:
            last_char = None

    final: list[tuple[str, float]] = []
    i = 0
    while i < len(results):
        ch, score = results[i]
        final.append((ch, score))
        if ch in PUNCT:
            while i + 1 < len(results) and results[i + 1][0] == ch:
                i += 1
        i += 1

    if not final:
        return "", 0.0
    conf = sum(s for _, s in final) / len(final)
    return "".join(ch for ch, _ in final), conf


def route_of(lang: str) -> str:
    return lang if lang in ("en", "zh", "ja") else "latin"


def extract_page(url: str, warc_ts: int, html_bytes: bytes, lang: str, cfg) -> dict:
    """Full det->rec->merge for one page (the per-url golden)."""
    page = html_bytes[: cfg.max_html_bytes].decode("utf-8", errors="replace")
    spans = segment(page, cfg)
    route = route_of(lang)
    texts = []
    confs = []
    out_spans = []
    for s in spans:
        interior = s["raw"][s["tstart"] - s["start"] : s["tend"] - s["start"]]
        canon = canonicalize(interior, route)
        t, c = decode(canon, route, cfg.min_score, cfg.punct_min_score)
        out_spans.append({**s, "text": t, "confidence": c})
        if t:
            texts.append(t)
            confs.append(c)
    return {
        "url": url,
        "warc_ts": warc_ts,
        "lang": lang,
        "extracted_text": "\n".join(texts),
        "n_spans": len(spans),
        "confidence": (sum(confs) / len(confs)) if confs else 0.0,
        "spans": out_spans,
    }


def extract_corpus(rows: list[dict], cfg) -> list[dict]:
    """Dedup (keep max warc_ts per url; ties by larger html) + extract, sorted by url."""
    best: dict[str, dict] = {}
    for r in rows:
        cur = best.get(r["url"])
        if cur is None or (r["warc_ts"], r["html"]) > (cur["warc_ts"], cur["html"]):
            best[r["url"]] = r
    out = []
    for url in sorted(best):
        r = best[url]
        out.append(extract_page(r["url"], r["warc_ts"], r["html"], r["lang"], cfg))
    return out


# ---------------------------------------------------------------------------
# mixed-payload oracle (q30): independent readers for the PDF / image routes
# ---------------------------------------------------------------------------
#
# Written against the PUBLIC format specs (ISO 32000 §7.3.4 strings,
# §7.4.4 FlateDecode; PNG RFC 2083 IHDR), not against functions/pdf.py —
# scoped to the subset the synthetic mixed corpus emits (single Flate
# content stream, literal + UTF-16BE hex strings, Tj/T* operators).

import re as _re
import zlib as _zlib


def _oracle_pdf_strings(body: bytes) -> list[str]:
    """Decode the string operand of each Tj in order, T* starting new lines."""
    out = []
    i, n = 0, len(body)
    while i < n:
        c = body[i]
        if c == 0x28:  # literal string
            raw = bytearray()
            depth = 1
            i += 1
            while i < n and depth:
                b = body[i]
                if b == 0x5C and i + 1 < n:
                    d = body[i + 1]
                    table = {0x6E: 0x0A, 0x72: 0x0D, 0x74: 0x09, 0x62: 0x08, 0x66: 0x0C}
                    if d in table:
                        raw.append(table[d]); i += 2
                    elif d in (0x28, 0x29, 0x5C):
                        raw.append(d); i += 2
                    elif 0x30 <= d <= 0x37:
                        j = i + 1; val = 0
                        while j < n and j < i + 4 and 0x30 <= body[j] <= 0x37:
                            val = val * 8 + (body[j] - 0x30); j += 1
                        raw.append(val & 0xFF); i = j
                    else:
                        i += 2
                elif b == 0x28:
                    depth += 1; raw.append(b); i += 1
                elif b == 0x29:
                    depth -= 1
                    if depth:
                        raw.append(b)
                    i += 1
                else:
                    raw.append(b); i += 1
            out.append(("s", bytes(raw).decode("latin-1")))
        elif c == 0x3C and (i + 1 >= n or body[i + 1] != 0x3C):  # hex string
            j = body.index(b">", i)
            hx = bytes(ch for ch in body[i + 1 : j] if not chr(ch).isspace())
            if len(hx) % 2:
                hx += b"0"
            raw = bytes.fromhex(hx.decode("ascii"))
            if raw[:2] == b"\xfe\xff":
                out.append(("s", raw[2:].decode("utf-16-be")))
            else:
                out.append(("s", raw.decode("latin-1")))
            i = j + 1
        elif body[i : i + 2] == b"T*":
            out.append(("nl", "")); i += 2
        else:
            i += 1
    return out


def oracle_pdf_text_blocks(data: bytes) -> list[str]:
    """One text string per BT..ET object: Tj strings on a line, T* breaks."""
    blocks = []
    # exact stream slicing via the preceding dict's /Length (ISO 32000 §7.3.8)
    for m in _re.finditer(rb"<<([^>]*?)/Length\s+(\d+)([^>]*?)>>\s*stream\r?\n", data):
        ln = int(m.group(2))
        start = m.end()
        raw = data[start : start + ln]
        dict_txt = m.group(0)
        if b"/Filter" in dict_txt:
            if b"FlateDecode" not in dict_txt:
                continue  # outside the oracle subset
            try:
                content = _zlib.decompress(raw)
            except Exception:
                continue
        else:
            content = raw
        for bm in _re.finditer(rb"BT\b(.*?)\bET", content, _re.DOTALL):
            lines = [""]
            for kind, s in _oracle_pdf_strings(bm.group(1)):
                if kind == "nl":
                    lines.append("")
                else:
                    lines[-1] += s
            blocks.append("\n".join(lines))
    return blocks


def oracle_image_meta(data: bytes):
    """PNG IHDR per RFC 2083 (the only image container in the mixed corpus)."""
    if data[:8] == b"\x89PNG\r\n\x1a\n" and data[12:16] == b"IHDR" and len(data) >= 24:
        w = int.from_bytes(data[16:20], "big")
        h = int.from_bytes(data[20:24], "big")
        return ("png", w, h)
    return None


def _mixed_spans(payload: bytes, cfg) -> list[dict]:
    """Span dicts for a non-html payload (pdf / image routes)."""
    if payload[:4] == b"%PDF":
        spans = []
        offset = line = order = 0
        for text in oracle_pdf_text_blocks(payload):
            vis = sum(len(p) for p in text.split())
            floor = cfg.density_length_floor
            lf = min(1.0, vis / cfg.density_length_norm)
            p = floor + (1.0 - floor) * lf  # link density 0, no boiler penalty
            score = min(int(p * 255.0), 255)
            nl = text.count("\n")
            if score > cfg.threshold and vis > cfg.min_box_size:
                spans.append(
                    {
                        "block_id": order, "start": offset, "end": offset + len(text),
                        "tstart": offset, "tend": offset + len(text),
                        "line_start": line, "line_end": line + nl,
                        "tag": "pdf", "depth": 1, "order": order,
                        "score": float(score), "raw": text,
                    }
                )
                order += 1
                if order >= cfg.max_spans_per_page:
                    break
            offset += len(text) + 1
            line += nl + 1
        return spans
    meta = oracle_image_meta(payload)
    if meta is None:
        return []
    fmt, w, h = meta
    raw = f"image {fmt} {w}x{h}"
    return [
        {
            "block_id": 0, "start": 0, "end": len(raw), "tstart": 0,
            "tend": len(raw), "line_start": 0, "line_end": 0, "tag": "image",
            "depth": 0, "order": 0, "score": 255.0, "raw": raw,
        }
    ]


def extract_mixed_page(url: str, warc_ts, payload: bytes, lang: str, cfg) -> dict:
    """extract_page twin that routes non-html payloads like the engine's
    detect stage (magic-byte sniff -> pdf / image span extraction)."""
    payload = (payload or b"")[: cfg.max_html_bytes]
    if payload[:4] == b"%PDF" or oracle_image_meta(payload) is not None:
        spans = _mixed_spans(payload, cfg)
        route = route_of(lang)
        texts, confs, out_spans = [], [], []
        for s in spans:
            canon = canonicalize(s["raw"], route)
            t, c = decode(canon, route, cfg.min_score, cfg.punct_min_score)
            out_spans.append({**s, "text": t, "confidence": c})
            if t:
                texts.append(t)
                confs.append(c)
        return {
            "url": url, "warc_ts": warc_ts, "lang": lang,
            "extracted_text": "\n".join(texts),
            "n_spans": len(spans),
            "confidence": (sum(confs) / len(confs)) if confs else 0.0,
            "spans": out_spans,
        }
    return extract_page(url, warc_ts, payload, lang, cfg)


def extract_mixed_corpus(rows: list[dict], cfg) -> list[dict]:
    best: dict[str, dict] = {}
    for r in rows:
        cur = best.get(r["url"])
        if cur is None or (r["warc_ts"], r["html"]) > (cur["warc_ts"], cur["html"]):
            best[r["url"]] = r
    return [
        extract_mixed_page(best[u]["url"], best[u]["warc_ts"], best[u]["html"],
                           best[u]["lang"], cfg)
        for u in sorted(best)
    ]


# ---------------------------------------------------------------------------
# approximate-family oracles (q17 MinHash, q18 SimHash, q21 LSH, q35 IVF)
# ---------------------------------------------------------------------------
#
# Independent straight-line implementations of the same published
# algorithms (MinHash/LSH banding per Broder; SimHash per Charikar;
# hyperplane LSH; IVF coarse quantization): naive dict-bucket loops
# here vs the engine's distributed groupby exchanges.  All four
# pipelines are DETERMINISTIC — the seeded parameter derivations
# (permutation (a, b) pairs, hyperplanes, k-means init) are shared
# spec data like the charset table above, re-derived from the same
# seeds.  Outputs carry only integers (ids, ranks, hamming), so the
# committed goldens are float-robust: floats enter only through exact
# rational comparisons (Jaccard) or well-separated cosine rankings.

import hashlib as _hashlib

import numpy as _np

_M64 = (1 << 64) - 1


def _h64(token: str) -> int:
    return int.from_bytes(
        _hashlib.blake2b(token.encode("utf-8"), digest_size=8).digest(), "little")


def _shingle_set(text: str, k: int) -> set[int]:
    words = text.lower().split()
    if len(words) < k:
        return {_h64(" ".join(words))} if words else set()
    return {_h64(" ".join(words[i:i + k])) for i in range(len(words) - k + 1)}


def oracle_minhash_pairs(ids, texts, threshold=0.5, num_perm=128, bands=16,
                         k=3, seed=1, max_bucket=200) -> list[tuple[int, int]]:
    """MinHash+LSH near-dup pairs: signature -> banded buckets ->
    candidate pairs (oversized buckets dropped) -> exact-Jaccard verify.
    Per-perm loop + dict buckets (vs the engine's broadcast matrix +
    groupby exchange)."""
    rng = _np.random.RandomState(seed)  # shared spec data: the permutation params
    a = rng.randint(0, 1 << 62, size=num_perm).astype(_np.uint64) * _np.uint64(2) + _np.uint64(1)
    b = rng.randint(0, 1 << 62, size=num_perm).astype(_np.uint64)
    rows = num_perm // bands

    shingles = {int(i): _shingle_set(str(t), k) for i, t in zip(ids, texts)}
    buckets: dict[tuple[int, bytes], set[int]] = {}
    for doc_id, sh in shingles.items():
        if sh:
            xs = _np.fromiter(sh, dtype=_np.uint64, count=len(sh))
            sig = []
            with _np.errstate(over="ignore"):
                for ai, bi in zip(a, b):
                    sig.append(int(((xs ^ bi) * ai).min()))
        else:
            sig = [_M64] * num_perm
        for bi_ in range(bands):
            packed = b"".join(v.to_bytes(8, "little")
                              for v in sig[bi_ * rows:(bi_ + 1) * rows])
            key = _hashlib.md5(packed).digest()[:8]
            buckets.setdefault((bi_, key), set()).add(doc_id)

    cand: set[tuple[int, int]] = set()
    for members in buckets.values():
        if len(members) < 2 or len(members) > max_bucket:
            continue  # oversized buckets dropped (recall loss, as the engine logs)
        ms = sorted(members)
        for x in range(len(ms)):
            for y in range(x + 1, len(ms)):
                cand.add((ms[x], ms[y]))

    out = []
    for pa_, pb_ in sorted(cand):
        sa, sb = shingles[pa_], shingles[pb_]
        if not sa and not sb:
            j = 1.0
        elif not sa or not sb:
            j = 0.0
        else:
            inter = len(sa & sb)
            j = inter / (len(sa) + len(sb) - inter)
        if j >= threshold:
            out.append((pa_, pb_))
    return out


def oracle_simhash_pairs(ids, texts, max_hamming=3, max_bucket=500) -> list[tuple[int, int, int]]:
    """Banded 64-bit SimHash near-dup pairs (4 x 16-bit bands)."""
    sigs = {}
    for i, t in zip(ids, texts):
        words = str(t).lower().split()
        if not words:
            sigs[int(i)] = 0
            continue
        hs = _np.fromiter((_h64(w) for w in words), dtype=_np.uint64, count=len(words))
        sig = 0
        for bit in range(64):
            cnt = int(((hs >> _np.uint64(bit)) & _np.uint64(1)).sum())
            if 2 * cnt > len(words):  # strict majority == votes > 0
                sig |= 1 << bit
        sigs[int(i)] = sig

    buckets: dict[tuple[int, int], set[int]] = {}
    for doc_id, sig in sigs.items():
        for bi in range(4):
            buckets.setdefault((bi, (sig >> (16 * bi)) & 0xFFFF, ), set()).add(doc_id)

    pairs: dict[tuple[int, int], int] = {}
    for members in buckets.values():
        if len(members) < 2 or len(members) > max_bucket:
            continue
        ms = sorted(members)
        for x in range(len(ms)):
            for y in range(x + 1, len(ms)):
                h = bin(sigs[ms[x]] ^ sigs[ms[y]]).count("1")
                if h <= max_hamming:
                    pairs[(ms[x], ms[y])] = h
    return [(a_, b_, h) for (a_, b_), h in sorted(pairs.items())]


def _norm_rows_oracle(m: _np.ndarray) -> _np.ndarray:
    n = _np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _oracle_topk(ids, mat_norm, q_ids, q_norm, cand_rows_of, k):
    """Shared exact top-k over per-query candidate row sets: sims by
    plain per-query dot, sorted (sim desc, neighbor asc), rank 1-based."""
    out = []
    for qi, qid in enumerate(q_ids):
        rows = cand_rows_of(qi)
        scored = []
        for r in rows:
            if ids[r] == qid:
                continue
            scored.append((float(q_norm[qi] @ mat_norm[r]), int(ids[r])))
        scored.sort(key=lambda t: (-t[0], t[1]))
        for rank, (_s, nid) in enumerate(scored[:k], 1):
            out.append((int(qid), nid, rank))
    return out


def oracle_knn_lsh(ids, mat, q_ids, q_mat, k=5, dim=64, bits=8, seed=7,
                   probes=1) -> list[tuple[int, int, int]]:
    """Hyperplane-LSH ANN: queries probe their own bucket plus all
    single-bit-flip neighbours (probes=1)."""
    rng = _np.random.RandomState(seed)  # shared spec data: the hyperplanes
    planes = rng.standard_normal((bits, dim))

    def code_of(v: _np.ndarray) -> int:
        c = 0
        for bi in range(bits):
            if float(planes[bi] @ v) > 0:
                c |= 1 << bi
        return c

    mat = _np.asarray(mat, dtype=_np.float64)
    q_mat = _np.asarray(q_mat, dtype=_np.float64)
    row_codes = [code_of(v) for v in mat]
    by_code: dict[int, list[int]] = {}
    for r, c in enumerate(row_codes):
        by_code.setdefault(c, []).append(r)

    mat_n = _norm_rows_oracle(mat)
    q_n = _norm_rows_oracle(q_mat)

    def cand(qi):
        c = code_of(q_mat[qi])
        codes = [c]
        if probes >= 1:
            codes += [c ^ (1 << b_) for b_ in range(bits)]
        rows = []
        for cc in codes:
            rows.extend(by_code.get(cc, []))
        return rows

    return _oracle_topk(list(ids), mat_n, list(q_ids), q_n, cand, k)


def oracle_knn_ivf(ids, mat, q_ids, q_mat, k=5, nlist=16, nprobe=4,
                   train_rows=4096, iters=10, seed=5) -> list[tuple[int, int, int]]:
    """IVF ANN: spherical Lloyd k-means coarse quantizer (full-corpus
    training below train_rows, matching the engine at the gate scale),
    rows assigned to argmax-cosine cells, queries scan their nprobe
    closest cells."""
    mat = _np.asarray(mat, dtype=_np.float64)
    q_mat = _np.asarray(q_mat, dtype=_np.float64)
    assert len(mat) <= train_rows, "oracle pinned to the full-train regime (gate sf)"
    x = _norm_rows_oracle(mat)
    rng = _np.random.RandomState(seed)  # shared spec data: the k-means init
    kk = min(nlist, len(x))
    cent = x[rng.choice(len(x), size=kk, replace=False)].copy()
    for _ in range(iters):
        assign = (x @ cent.T).argmax(axis=1)
        for j in range(kk):
            members = x[assign == j]
            if len(members):
                cent[j] = members.mean(axis=0)
        cent = _norm_rows_oracle(cent)

    cells = (x @ cent.T).argmax(axis=1)
    by_cell: dict[int, list[int]] = {}
    for r, c in enumerate(cells):
        by_cell.setdefault(int(c), []).append(r)
    q_n = _norm_rows_oracle(q_mat)

    def cand(qi):
        order = _np.argsort(-(q_n[qi] @ cent.T))[: min(nprobe, kk)]
        rows = []
        for c in order:
            rows.extend(by_cell.get(int(c), []))
        return rows

    return _oracle_topk(list(ids), x, list(q_ids), q_n, cand, k)


def oracle_bpe_train(texts, merges: int = 10):
    """Independent plain-dict BPE trainer over the word histogram —
    the spec's reference for catalog q93 (stages/bpe.py implements the
    SAME pinned rules distributed):

    - words = text.lower().split(); train on the (word, count)
      HISTOGRAM (the standard scalability device — corpus size never
      enters the loop);
    - initial symbols = the word's characters; each round counts
      adjacent symbol pairs weighted by word count (overlapping
      occurrences each count: 'aaa' has ('a','a') twice);
    - best pair = max count, ties to the lexicographically SMALLEST
      (left, right); stop early when no pair remains;
    - apply = single left-greedy scan per word ('aaa' + ('a','a') →
      ['aa', 'a']).

    Returns [(merge_rank, left, right, pair_count), ...].
    """
    hist: dict[str, int] = {}
    for t in texts:
        for w in str(t).lower().split():
            hist[w] = hist.get(w, 0) + 1
    seg = {w: list(w) for w in hist}
    out = []
    for rank in range(1, merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in seg.items():
            c = hist[w]
            for i in range(len(syms) - 1):
                k = (syms[i], syms[i + 1])
                counts[k] = counts.get(k, 0) + c
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), n = best
        out.append((rank, left, right, n))
        merged = left + right
        for w, syms in seg.items():
            res, i = [], 0
            while i < len(syms):
                if (i < len(syms) - 1 and syms[i] == left
                        and syms[i + 1] == right):
                    res.append(merged)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            seg[w] = res
    return out


def oracle_bpe_encode(ids, texts, merges: int = 10):
    """Independent train→apply BPE encode (catalog q94's reference):
    train with the oracle_bpe_train rules, then per document count
    words and post-merge tokens (wordless documents emit zeros).

    Returns [(doc_id, n_words, n_bpe_tokens), ...] in input order.
    """
    hist: dict[str, int] = {}
    for t in texts:
        for w in str(t).lower().split():
            hist[w] = hist.get(w, 0) + 1
    seg = {w: list(w) for w in hist}
    for _rank in range(merges):
        counts: dict[tuple[str, str], int] = {}
        for w, syms in seg.items():
            c = hist[w]
            for i in range(len(syms) - 1):
                k = (syms[i], syms[i + 1])
                counts[k] = counts.get(k, 0) + c
        if not counts:
            break
        (left, right), _n = min(counts.items(),
                                key=lambda kv: (-kv[1], kv[0]))
        merged = left + right
        for w, syms in seg.items():
            res, i = [], 0
            while i < len(syms):
                if (i < len(syms) - 1 and syms[i] == left
                        and syms[i + 1] == right):
                    res.append(merged)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            seg[w] = res
    out = []
    for d, t in zip(ids, texts):
        ws = str(t).lower().split()
        out.append((d, len(ws), sum(len(seg[w]) for w in ws)))
    return out
