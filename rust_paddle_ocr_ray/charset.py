"""Character-set dictionaries with CTC-blank sentinel semantics.

The reference loads an 18k-char keys file and wraps it in leading +
trailing ``" "`` sentinels so index 0 is the CTC blank and the *last*
index is the space token (/root/reference/src/rec.rs:55-59).  We build
our charsets programmatically (no model files exist for web text) but
keep the exact index layout:

    keys = [" "] + body + [" "]        # len = len(body) + 2
    index(blank) = 0
    index(body[i]) = i + 1
    index(" ")    = len(body) + 1      # the trailing sentinel

Charsets are routed per row by the ``lang`` column (SURVEY.md §1.2):
``en`` -> ASCII, ``zh`` -> +CJK ideographs + full-width punct,
``ja`` -> +kana as well, anything else -> Latin-1 letters (fr/es/de...).

Lookup is a dense ``numpy`` LUT over the BMP (all our charsets are
BMP-only) so encoding a span is a single vectorized gather — the
analog of the per-timestep vocab argmax (src/rec.rs:347-357) at Arrow
batch speed.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

# Full-width / CJK punctuation that the reference's dictionary covers and its
# punctuation rules special-case (src/rec.rs:27-31).
CJK_PUNCT = "，。！？；：、「」『』（）【】《》—…·～“”‘’"

_ASCII_BODY = "".join(chr(c) for c in range(0x21, 0x7F))  # printable ASCII minus space
_LATIN1_BODY = _ASCII_BODY + "".join(chr(c) for c in range(0xA1, 0x100))
_CJK_IDEOGRAPHS = (0x4E00, 0x9FFF)
_HIRAGANA = (0x3041, 0x3096)
_KATAKANA = (0x30A1, 0x30FA)
_KATAKANA_EXT = (0x30FC, 0x30FE)  # prolonged sound mark + iteration marks


def _span(lo: int, hi: int) -> str:
    return "".join(chr(c) for c in range(lo, hi + 1))


def charset_body(lang: str) -> str:
    """The charset body (without sentinels) for a language route."""
    if lang == "en":
        return _ASCII_BODY
    if lang == "zh":
        return _LATIN1_BODY + CJK_PUNCT + _span(*_CJK_IDEOGRAPHS)
    if lang == "ja":
        return (
            _LATIN1_BODY
            + CJK_PUNCT
            + _span(*_HIRAGANA)
            + _span(*_KATAKANA)
            + _span(*_KATAKANA_EXT)
            + _span(*_CJK_IDEOGRAPHS)
        )
    # default route: Latin-script languages (fr/es/de/...)
    return _LATIN1_BODY


ROUTES = ("en", "zh", "ja", "latin")


def route_for_lang(lang: str | None) -> str:
    if lang in ("en", "zh", "ja"):
        return lang
    return "latin"


class Charset:
    """keys list + dense BMP lookup table (char codepoint -> index, 0 = blank)."""

    __slots__ = ("route", "keys", "size", "lut")

    def __init__(self, route: str):
        body = charset_body(route)
        self.route = route
        # Sentinel layout exactly as src/rec.rs:55-59.
        self.keys = [" "] + list(body) + [" "]
        self.size = len(self.keys)
        lut = np.zeros(0x10000, dtype=np.int32)
        for i, ch in enumerate(body):
            lut[ord(ch)] = i + 1
        lut[ord(" ")] = len(body) + 1  # trailing sentinel = the space token
        self.lut = lut

    def indices(self, codepoints: np.ndarray) -> np.ndarray:
        """Vectorized charset lookup; codepoints outside the BMP map to blank."""
        cp = np.where(codepoints < 0x10000, codepoints, 0)
        return self.lut[cp]


@lru_cache(maxsize=None)
def get_charset(route: str) -> Charset:
    return Charset(route)
