"""Span canonicalization + CTC-greedy decode (the recognition math).

This module is the batch/vectorized re-expression of the reference's
recognizer inner loop (/root/reference/src/rec.rs:341-400) and
preprocessing (src/rec.rs:226-251), specified for *text spans* instead
of glyph rasters.  The semantics below are THE spec; the independent
oracle in ``tests/oracle_impl.py`` implements the same spec with naive
per-character loops and the goldens assert byte-identical output.

Canonicalize (M8 analog, src/rec.rs:226-251):
  1. trim a leading partial tag:  if the first ``>`` occurs before the
     first ``<`` (border expansion sliced into a tag, the analog of
     border pixels around a crop), drop through it;
  2. trim a trailing partial tag symmetrically (last ``<`` after last ``>``);
  3. remove HTML comments, then replace every remaining tag with one space;
  4. decode HTML entities (``html.unescape``);
  5. NFKC-normalize for the zh/ja charset routes;
  6. collapse all whitespace runs to single spaces and strip the ends.

Encode (the "model forward" analog): each canonical character is one
CTC timestep; a blank (index 0) timestep is emitted at span start and
between adjacent *equal non-punctuation* characters (standard CTC
encoding of a string, so decode round-trips genuine repeats).  The
per-timestep confidence is a deterministic pseudo-score (our stand-in
for the SVTR/CRNN softmax; no learned model exists for web text):

    u(ch, p) = (((cp(ch) * 2654435761 + (p + 1) * 97) & 0xFFFFFFFF) >> 16) / 65536
    score    = 0.05 + 0.90 * u   if ch is punctuation    (exercises the
               punct threshold / rescue / drop paths deterministically)
             = 0.62 + 0.38 * u   otherwise               (always > min_score)

where ``p`` is the timestep index within the span (0 = leading blank).

Decode (M9, bit-faithful to src/rec.rs:341-400):
  - index 0 / out-of-charset  -> skip, last_char = None           (:359, :380-382)
  - score > threshold         -> push unless repeat of last_char
                                 and not punctuation; last_char = ch (:367-371)
    (threshold = punct_min_score for punctuation else min_score,   :361-365)
  - punctuation with score > 0.8 * punct_min_score -> push WITHOUT
    updating last_char (the rescue path)                           (:373-374)
  - otherwise                 -> drop, last_char = None            (:375-377)
  - final pass: collapse runs of identical punctuation, keep first  (:385-398)
  - confidence = mean of kept per-char scores, 0.0 for empty       (:175-186)

Everything is vectorized with numpy across a whole Arrow batch of
spans; the only per-row Python is the regex canonicalization.
"""

from __future__ import annotations

import html as _htmlmod
import re
import unicodedata

import numpy as np

from ..charset import Charset, get_charset

# The reference's 49-char punctuation set, verbatim values
# (/root/reference/src/rec.rs:27-31).
PUNCTUATIONS = frozenset(
    ",.!?;:\"'()[]{}-_/\\|@#$%&*+=~"
    "，。！？；：、「」『』（）【】《》—…·～"
)
assert len(PUNCTUATIONS) == 49

_PUNCT_LUT = np.zeros(0x10000, dtype=bool)
for _ch in PUNCTUATIONS:
    _PUNCT_LUT[ord(_ch)] = True

_WS_RE = re.compile(r"\s+")


def _strip_comments(s: str) -> str:
    """Exact semantics of ``re.sub(r"<!--.*?-->", " ", s, flags=re.S)``
    in guaranteed-linear time: the regex rescans to EOF at every
    failing ``<!--`` start, so adversarial spans like ``"<!--x " * 30k``
    (no closers) took ~28 s; str.find makes the same walk O(n).
    Unterminated comments stay in the text, exactly like the regex
    (and tests/oracle_impl.py:336, which keeps the regex form — the
    two must stay output-identical)."""
    a = s.find("<!--")
    if a < 0:
        return s
    parts = []
    i = 0
    while a >= 0:
        b = s.find("-->", a + 4)
        if b < 0:
            break  # unterminated: keep the rest verbatim
        parts.append(s[i:a])
        parts.append(" ")
        i = b + 3
        a = s.find("<!--", i)
    parts.append(s[i:])
    return "".join(parts)


def _strip_tags(s: str) -> str:
    """Exact semantics of ``re.sub(r"<[^>]*>", " ", s)`` in linear
    time (the regex is quadratic on many ``<`` with no ``>``): each
    match runs from a ``<`` to the FIRST following ``>``; once no
    ``>`` remains, no later ``<`` can match either."""
    a = s.find("<")
    if a < 0:
        return s
    parts = []
    i = 0
    while a >= 0:
        b = s.find(">", a + 1)
        if b < 0:
            break  # no closing '>' anywhere -> no further matches
        parts.append(s[i:a])
        parts.append(" ")
        i = b + 1
        a = s.find("<", i)
    parts.append(s[i:])
    return "".join(parts)

# decode timestep categories
_B, _R, _P, _S, _D = 0, 1, 2, 3, 4


def is_punctuation(ch: str) -> bool:
    return ch in PUNCTUATIONS


def canonicalize(raw: str, route: str) -> str:
    """M8 canonicalization of one raw html slice (see module docstring)."""
    s = raw
    i_gt, i_lt = s.find(">"), s.find("<")
    if i_gt != -1 and (i_lt == -1 or i_gt < i_lt):
        s = s[i_gt + 1 :]
    j_lt, j_gt = s.rfind("<"), s.rfind(">")
    if j_lt != -1 and (j_gt == -1 or j_gt < j_lt):
        s = s[:j_lt]
    if "<" in s:  # no "<" -> no comments and no tags (pure fast path)
        s = _strip_comments(s)
        s = _strip_tags(s)
    s = _htmlmod.unescape(s)  # stdlib fast-paths the no-"&" case itself
    if route in ("zh", "ja"):
        s = unicodedata.normalize("NFKC", s)
    # identical to _WS_RE.sub(" ", s).strip(): str.split's whitespace set
    # equals \s for every codepoint (verified exhaustively over U+0000..
    # U+10FFFF), and joining the maximal non-ws runs with single spaces
    # is exactly collapse-runs-then-strip — at C speed, no regex pass
    return " ".join(s.split())


def _codepoints(texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Concatenated codepoint array + per-text lengths.

    Codepoints are int32 (max 0x10FFFF) and every derived positional
    array below stays int32 too: the decode working set is the hot
    memory-bandwidth consumer of the whole pipeline (~15 derived arrays
    per chunk), so halving the element width halves the stage's DRAM
    traffic — the quantity that caps wide-node scaling on one socket."""
    joined = "".join(texts)
    cp = np.frombuffer(joined.encode("utf-32-le"), dtype="<u4").astype(np.int32)
    lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))
    return cp, lens


def timestep_scores(cp: np.ndarray, p: np.ndarray) -> np.ndarray:
    """Deterministic pseudo-confidence per (codepoint, timestep-index).

    Computed in uint32 wraparound arithmetic — bit-identical to the
    original int64-then-mask form (the hash IS mod-2^32 math: cp and
    (p+1)*97 both < 2^32, multiplication wraps to the same residue)."""
    with np.errstate(over="ignore"):
        h = (cp.astype(np.uint32) * np.uint32(2654435761)
             + (p.astype(np.uint32) + np.uint32(1)) * np.uint32(97))
    u = (h >> np.uint32(16)).astype(np.float64) / 65536.0
    punct = _PUNCT_LUT[np.where(cp < 0x10000, cp, 0)]
    return np.where(punct, 0.05 + 0.90 * u, 0.62 + 0.38 * u)


def decode_spans(
    texts: list[str],
    route: str,
    min_score: float = 0.6,
    punct_min_score: float = 0.1,
) -> tuple[list[str], np.ndarray]:
    """Decode a batch of canonical span texts through one charset route.

    Returns (decoded_texts, confidences) aligned with ``texts``.
    """
    n = len(texts)
    if n == 0:
        return [], np.zeros(0, dtype=np.float64)
    charset: Charset = get_charset(route)
    cp, lens = _codepoints(texts)
    confs = np.zeros(n, dtype=np.float64)
    if cp.size == 0:
        return [""] * n, confs

    starts = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    starts = starts.astype(np.int32)  # chunk size bounded << 2^31
    span_of = np.repeat(np.arange(n, dtype=np.int32), lens)
    span_start = np.repeat(starts, lens)
    pos_in_span = np.arange(cp.size, dtype=np.int32) - span_start

    bmp = np.where(cp < 0x10000, cp, 0)
    punct = _PUNCT_LUT[bmp]
    idx = charset.indices(cp)

    # --- encode: blanks at span start and between equal adjacent non-punct ---
    ib = np.zeros(cp.size, dtype=bool)  # inserted blank immediately before char i
    if cp.size > 1:
        ib[1:] = (cp[1:] == cp[:-1]) & ~punct[1:]
    ib &= pos_in_span > 0  # span-adjacency only
    # inserted blanks at-or-before i: a blank inserted before char i occupies
    # a timestep of its own, so it SHIFTS i's timestep index too (the oracle
    # enumerates [blank, c0, ..., blank, ci, ...] — src/rec.rs:341-357 indexes
    # scores by model timestep).  cumsum(ib)-ib (exclusive of i's own blank)
    # under-counted the repeat-second char's timestep by one: same text (the
    # synthetic non-punct score floor 0.62 always clears min_score), wrong
    # per-char score -> ~1e-8 confidence skew vs the oracle.
    ins_incl = np.cumsum(ib, dtype=np.int32)
    ins_at_start = ins_incl[span_start]
    # timestep index within span: leading blank is 0, so char timesteps start at 1
    p = pos_in_span + 1 + (ins_incl - ins_at_start)

    scores = timestep_scores(cp, p)
    return greedy_decode(
        cp, idx, punct, scores, span_of, span_start, pos_in_span, ib, n,
        min_score=min_score, punct_min_score=punct_min_score,
    )


def greedy_decode(
    cp: np.ndarray,
    idx: np.ndarray,
    punct: np.ndarray,
    scores: np.ndarray,
    span_of: np.ndarray,
    span_start: np.ndarray,
    pos_in_span: np.ndarray,
    ib: np.ndarray,
    n_spans: int,
    min_score: float = 0.6,
    punct_min_score: float = 0.1,
) -> tuple[list[str], np.ndarray]:
    """The vectorized M9 scan over explicit char-timestep arrays.

    ``ib`` marks positions preceded by an inserted blank; a leading blank is
    implicit at every span start.  Exposed separately so tests can feed
    crafted score matrices at the branch level (FIXTURES.md §4).
    """
    confs = np.zeros(n_spans, dtype=np.float64)

    # --- per-timestep category ---
    typ = np.full(cp.size, _D, dtype=np.int8)
    blank = idx == 0
    typ[blank] = _B
    keep_thresh = np.where(punct, punct_min_score, min_score)
    above = scores > keep_thresh
    typ[~blank & above & ~punct] = _R
    typ[~blank & above & punct] = _P
    rescue = ~blank & ~above & punct & (scores > punct_min_score * 0.8)
    typ[rescue] = _S

    # --- last_char propagation (see module docstring) ---
    # pointer to the most recent non-S char timestep at-or-before each position
    non_s = typ != _S
    anchor = np.maximum.accumulate(
        np.where(non_s, np.arange(cp.size, dtype=np.int32), np.int32(-1)))
    prev_val = np.full(cp.size, -1, dtype=cp.dtype)  # -1 == None
    if cp.size > 1:
        j = anchor[:-1]
        valid = (j >= 0) & (j >= span_start[1:])
        jj = np.where(valid, j, 0)
        from_rp = valid & ((typ[jj] == _R) | (typ[jj] == _P))
        prev_val[1:] = np.where(from_rp, cp[jj], -1)
    # a blank (leading or inserted) immediately before i resets last_char
    reset = ib | (pos_in_span == 0)
    prev_val[reset] = -1

    pushed = (typ == _P) | (typ == _S) | ((typ == _R) & (prev_val != cp))

    # --- final punctuation-run dedup over the pushed sequence ---
    p_cp = cp[pushed]
    p_sc = scores[pushed]
    p_punct = punct[pushed]
    p_span = span_of[pushed]
    drop = np.zeros(p_cp.size, dtype=bool)
    if p_cp.size > 1:
        drop[1:] = p_punct[1:] & (p_cp[1:] == p_cp[:-1]) & (p_span[1:] == p_span[:-1])
    f_cp = p_cp[~drop]
    f_sc = p_sc[~drop]
    f_span = p_span[~drop]

    # --- per-span assembly: one big utf-32 decode + slicing ---
    counts = np.bincount(f_span, minlength=n_spans)
    sums = np.bincount(f_span, weights=f_sc, minlength=n_spans)
    np.divide(sums, counts, out=confs, where=counts > 0)
    big = f_cp.astype("<u4").tobytes().decode("utf-32-le")
    bounds = np.zeros(n_spans + 1, dtype=np.int64)
    np.cumsum(counts, out=bounds[1:])
    out = [big[bounds[i] : bounds[i + 1]] for i in range(n_spans)]
    return out, confs
