"""Branch-level unit tests of the CTC-greedy decode (FIXTURES.md §4),
exercising the reference semantics of /root/reference/src/rec.rs:341-400
with crafted score matrices."""

from __future__ import annotations

import numpy as np
import pytest

from rust_paddle_ocr_ray.charset import get_charset
from rust_paddle_ocr_ray.functions.decode import (
    PUNCTUATIONS,
    canonicalize,
    decode_spans,
    greedy_decode,
)


def run_single(steps, min_score=0.6, punct_min=0.1):
    """steps: list of (char_or_None, score, inserted_blank_before).
    char None => blank/OOV timestep (index 0)."""
    cs = get_charset("en")
    cp = np.array([0 if ch is None else ord(ch) for ch, _, _ in steps], dtype=np.int64)
    idx = np.array(
        [0 if ch is None else int(cs.lut[ord(ch)]) for ch, _, _ in steps], dtype=np.int64
    )
    punct = np.array([ch in PUNCTUATIONS if ch else False for ch, _, _ in steps])
    scores = np.array([s for _, s, _ in steps], dtype=np.float64)
    n = len(steps)
    span_of = np.zeros(n, dtype=np.int64)
    span_start = np.zeros(n, dtype=np.int64)
    pos = np.arange(n, dtype=np.int64)
    ib = np.array([b for _, _, b in steps], dtype=bool)
    texts, confs = greedy_decode(
        cp, idx, punct, scores, span_of, span_start, pos, ib, 1,
        min_score=min_score, punct_min_score=punct_min,
    )
    return texts[0], confs[0]


def test_blank_skipped():
    text, _ = run_single([("a", 0.9, False), (None, 0.9, False), ("b", 0.9, False)])
    assert text == "ab"


def test_adjacent_repeat_collapsed():
    # rec.rs:368 — same char, no blank between -> collapse
    text, _ = run_single([("a", 0.9, False), ("a", 0.9, False)])
    assert text == "a"


def test_repeat_with_blank_kept():
    # an inserted blank resets last_char -> genuine repeat survives
    text, _ = run_single([("a", 0.9, False), ("a", 0.9, True)])
    assert text == "aa"


def test_punct_exempt_from_collapse_but_run_deduped():
    # adjacent identical punctuation is pushed (rec.rs:368 punct exemption)
    # then collapsed by the final punct-run dedup (rec.rs:385-398)
    text, conf = run_single([(".", 0.9, False), (".", 0.8, False)])
    assert text == "."
    assert conf == pytest.approx(0.9)  # first of the run survives


def test_punct_rescue_keeps_last_char():
    # score in (0.8*punct_min, punct_min]: pushed WITHOUT updating last_char
    # (rec.rs:373) — so a repeat across the rescued punct still collapses
    text, _ = run_single([("a", 0.9, False), (".", 0.085, False), ("a", 0.9, False)])
    assert text == "a."


def test_punct_drop_resets_last_char():
    # score <= 0.8*punct_min: dropped, last_char = None -> repeat survives
    text, _ = run_single([("a", 0.9, False), (".", 0.05, False), ("a", 0.9, False)])
    assert text == "aa"


def test_low_score_regular_drop_resets():
    text, _ = run_single([("a", 0.9, False), ("b", 0.5, False), ("a", 0.9, False)])
    assert text == "aa"


def test_threshold_strictness():
    # rec.rs:367 uses strict >
    text, _ = run_single([("a", 0.6, False)])
    assert text == ""
    text, _ = run_single([("a", 0.6000001, False)])
    assert text == "a"


def test_empty_confidence_zero():
    text, conf = run_single([(None, 0.0, False)])
    assert text == "" and conf == 0.0


def test_confidence_is_mean_of_kept():
    text, conf = run_single([("a", 0.9, False), ("b", 0.7, False)])
    assert text == "ab"
    assert conf == pytest.approx(0.8)


def test_oov_char_maps_to_blank():
    # '中' is not in the en charset -> blank -> skipped, resets last_char
    text, _ = run_single([("a", 0.9, False), ("中", 0.9, False), ("a", 0.9, False)])
    assert text == "aa"


def test_punct_run_dedup_interrupted():
    text, _ = run_single(
        [(".", 0.9, False), (".", 0.9, False), ("x", 0.9, False), (".", 0.9, False)]
    )
    assert text == ".x."


# --- canonicalize (M8) ---

def test_canonicalize_trims_partial_tags():
    assert canonicalize('iv class="x">hello<p cl', "en") == "hello"


def test_canonicalize_strips_tags_and_entities():
    assert canonicalize("<b>a &amp; b</b> <!-- c --> d", "en") == "a & b d"


def test_canonicalize_nfkc_for_cjk_routes():
    assert canonicalize("ａｂｃ", "zh") == "abc"
    assert canonicalize("ａｂｃ", "en") == "ａｂｃ"


def test_canonicalize_whitespace_collapse():
    assert canonicalize("a\n\t  b\r\n c", "en") == "a b c"


# --- charset sentinels (src/rec.rs:55-59) ---

def test_charset_sentinel_layout():
    cs = get_charset("en")
    assert cs.keys[0] == " " and cs.keys[-1] == " "
    assert cs.lut[ord(" ")] == cs.size - 1  # space -> trailing sentinel index
    assert cs.lut[ord("a")] > 0
    assert cs.lut[ord("中")] == 0  # OOV -> blank
    zh = get_charset("zh")
    assert zh.lut[ord("中")] > 0


def test_decode_spans_space_token_survives():
    out, _ = decode_spans(["a b"], "en")
    assert out[0] == "a b"


def test_decode_spans_batch_independence():
    """Decoding spans together must equal decoding them alone."""
    texts = ["hello world.", "batch batch batch", "", "x... y!!"]
    together, conf_t = decode_spans(texts, "en")
    for i, t in enumerate(texts):
        alone, conf_a = decode_spans([t], "en")
        assert together[i] == alone[0]
        assert conf_t[i] == pytest.approx(conf_a[0])


def test_canonicalize_linear_on_adversarial_spans():
    """Bare-'<' floods and unterminated comment openers made the old
    regex subs quadratic (7-28 s per 200 KB span in the recognizer hot
    path); the find-loop rewrite must stay linear AND output-identical
    to the regex semantics the oracle keeps."""
    import re
    import time

    from rust_paddle_ocr_ray.functions.decode import (
        _strip_comments,
        _strip_tags,
        canonicalize,
    )

    for s in ("< x " * 50_000, "<!--x " * 30_000):
        t0 = time.time()
        canonicalize(s, "en")
        assert time.time() - t0 < 2.0

    cre = re.compile(r"<!--.*?-->", re.S)
    tre = re.compile(r"<[^>]*>")
    import random

    rng = random.Random(7)
    for _ in range(5000):
        s = "".join(rng.choice("<>!-a \n") for _ in range(rng.randrange(0, 24)))
        assert _strip_comments(s) == cre.sub(" ", s), repr(s)
        assert _strip_tags(s) == tre.sub(" ", s), repr(s)
