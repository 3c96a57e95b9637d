"""Text-analysis kernels for the large-scale training-data pipeline:
language-ID (n-gram/stopword heuristic), quality scoring, token
counting, and document fingerprinting.  All vectorized over Arrow/
pandas batches; every function has an ANSI-SQL-expressible twin in
``pipelines/catalog.py`` so the DuckDB oracle can replay it exactly
(integer arithmetic only — no float divergence).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

# Unicode-range detectors (BMP); RE2- and Python-re compatible.
JA_RANGE = "[ぁ-ヿ]"        # hiragana + katakana
ZH_RANGE = "[一-鿿]"        # CJK unified ideographs

# \b-delimited stopword alternations — identical regex text on both the Ray
# and DuckDB sides; both engines do non-overlapping left-to-right matching.
STOPWORDS = {
    "en": r"\b(the|and|of|to|is|in|that|it)\b",
    "fr": r"\b(le|la|les|des|une|est|dans|que)\b",
    "es": r"\b(el|los|las|una|es|y|en|que)\b",
    "de": r"\b(der|die|das|und|ist|nicht|ein|mit)\b",
}

TOKEN_RE = r"\S+"


def langid_frame(text: pd.Series) -> pd.Series:
    """Heuristic language id: script ranges first, then stopword argmax
    with the fixed tie order en > fr > es > de."""
    lower = text.str.lower()
    c = {k: lower.str.count(v) for k, v in STOPWORDS.items()}
    pred = np.where(
        text.str.contains(JA_RANGE, regex=True),
        "ja",
        np.where(
            text.str.contains(ZH_RANGE, regex=True),
            "zh",
            np.where(
                (c["en"] >= c["fr"]) & (c["en"] >= c["es"]) & (c["en"] >= c["de"]),
                "en",
                np.where(
                    (c["fr"] >= c["es"]) & (c["fr"] >= c["de"]),
                    "fr",
                    np.where(c["es"] >= c["de"], "es", "de"),
                ),
            ),
        ),
    )
    return pd.Series(pred, index=text.index)


def quality_frame(text: pd.Series) -> pd.DataFrame:
    """Integer quality features + a boolean gate (SQL-replicable)."""
    n_chars = text.str.len().astype("int64")
    n_tokens = text.str.count(TOKEN_RE).astype("int64")
    n_punct = text.str.count(r"[,.!?;:]").astype("int64")
    n_upper = text.str.count(r"[A-Z]").astype("int64")
    # mean token length in tenths (integer) to avoid float hash divergence
    mean_tok_len_x10 = (10 * (n_chars - n_tokens + 1) // n_tokens.clip(lower=1)).astype("int64")
    is_quality = (n_tokens >= 10) & (n_tokens <= 100000) & (n_punct * 5 <= n_tokens * 2 + 10)
    return pd.DataFrame(
        {
            "n_chars": n_chars,
            "n_tokens": n_tokens,
            "n_punct": n_punct,
            "n_upper": n_upper,
            "mean_tok_len_x10": mean_tok_len_x10,
            "is_quality": is_quality,
        }
    )


def md5_hex(text: pd.Series) -> pd.Series:
    """Content fingerprint identical to DuckDB's md5()."""
    return text.map(lambda s: hashlib.md5(s.encode("utf-8")).hexdigest())


def rolling_fingerprint(text: pd.Series, window: int = 16, mod: int = 1 << 61) -> pd.Series:
    """Karp-Rabin-style rolling-hash document fingerprint: the minimum
    polynomial hash over all ``window``-char windows (a winnowing-style
    signature; not SQL-expressible — covered by unit tests instead)."""
    base = 257

    def fp(s: str) -> int:
        if len(s) < window:
            s = s + "\x00" * (window - len(s))
        h = 0
        pow_w = pow(base, window - 1, mod)
        best = None
        for i, ch in enumerate(s):
            h = (h * base + ord(ch)) % mod
            if i >= window:
                h = (h - ord(s[i - window]) * pow_w * base) % mod
            if i >= window - 1:
                best = h if best is None else min(best, h)
        return best if best is not None else 0

    return text.map(fp)


def md5_head32(hexes: pd.Series) -> np.ndarray:
    """First 8 hex chars of md5 digests as uint32 values (int64 array)
    — the stable per-row bucket number behind hash-split / stratified /
    weighted sampling.  Vectorized: one join + C-level ``fromhex`` +
    big-endian view, replacing a per-row ``int(s, 16)`` Python map."""
    joined = "".join(hexes.str.slice(0, 8).tolist())
    if not joined:
        return np.zeros(0, dtype="int64")
    return np.frombuffer(bytes.fromhex(joined), dtype=">u4").astype("int64")
