"""DSIR importance weighting (stages/dsir.py, catalog q96).

The closed-form check replays the whole operator — pinned word→bucket
hash, add-one-smoothed importance ratio, floor micro-bit quantization
— with a plain-Python dict loop.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest
import ray.data as rd

from rust_paddle_ocr_ray.stages.dsir import (
    HASH_CHARS,
    UNIT,
    _MOD,
    dsir_scores,
    word_bucket,
)

DOCS = pd.DataFrame({
    "doc_id": [0, 1, 2, 3, 4],
    "lang": ["en", "en", "de", "de", "en"],
    "text": [
        "the cat sat on the mat",
        "the cat ate",
        "die katze der hund",
        "der der der",
        "",                     # wordless: present with zeros
    ],
})


def _ref_bucket(word: str, n_buckets: int) -> int:
    h = 0
    for j, ch in enumerate(word[:HASH_CHARS]):
        h += ord(ch) * pow(257, HASH_CHARS - 1 - j, _MOD)
    return (h % _MOD) % n_buckets


def _reference(df: pd.DataFrame, n_buckets: int) -> pd.DataFrame:
    ct: dict[int, int] = {}
    cr: dict[int, int] = {}
    for r in df.itertuples():
        for w in str(r.text).lower().split():
            b = _ref_bucket(w, n_buckets)
            cr[b] = cr.get(b, 0) + 1
            if r.lang == "en":
                ct[b] = ct.get(b, 0) + 1
    tt, tr = sum(ct.values()), sum(cr.values())
    lut = {b: math.floor(math.log2(
        ((ct.get(b, 0) + 1) * (tr + n_buckets))
        / ((cr[b] + 1) * (tt + n_buckets))) * UNIT) for b in cr}
    rows = []
    for r in df.itertuples():
        ws = str(r.text).lower().split()
        rows.append({"doc_id": r.doc_id, "n_words": len(ws),
                     "dsir_ubits": sum(lut[_ref_bucket(w, n_buckets)]
                                       for w in ws)})
    return pd.DataFrame(rows).astype("int64")


def test_word_bucket_matches_reference():
    for w in ["the", "a", "xylophone-longer-than-8", "ü§", ""]:
        for nb in (64, 1024):
            assert word_bucket(w, nb) == _ref_bucket(w, nb), w


def test_hash_uses_only_first_8_chars():
    assert word_bucket("abcdefghIGNORED") == word_bucket("abcdefgh")


def test_scores_match_plain_python(ray_session):
    out = (dsir_scores(rd.from_pandas(DOCS), n_buckets=64)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    want = _reference(DOCS, 64).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out.astype("int64"), want)


def test_target_words_score_higher(ray_session):
    # many distinct buckets, en-only words positive, de-only negative
    df = pd.DataFrame({
        "doc_id": [0, 1],
        "lang": ["en", "de"],
        "text": ["english english english", "deutsch deutsch deutsch"],
    })
    out = (dsir_scores(rd.from_pandas(df), n_buckets=1024)
           .to_pandas().set_index("doc_id"))
    assert out.loc[0, "dsir_ubits"] > out.loc[1, "dsir_ubits"]


def test_overflow_guard_raises(ray_session, monkeypatch):
    # shrink the guard bound instead of synthesizing 2^53 tokens; the
    # fallback must be LOUD, never a silently-inexact log
    import rust_paddle_ocr_ray.stages.dsir as m

    monkeypatch.setattr(m, "_EXACT_F64", 10)
    with pytest.raises(ValueError, match="exact float64"):
        dsir_scores(rd.from_pandas(DOCS), n_buckets=64).to_pandas()


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet=st.characters(codec="utf-8"), max_size=20),
       st.sampled_from([64, 1024, 4096]))
def test_hypothesis_hash_matches_reference(word, nb):
    assert word_bucket(word, nb) == _ref_bucket(word, nb)


def test_overflow_guard_uses_python_ints(ray_session, monkeypatch):
    # the guard must fire even where the int64 product would WRAP past
    # 2^63 (review finding): with the bound pushed to 2^63+1, a wrapped
    # int64 check would see a negative product and stay silent
    import rust_paddle_ocr_ray.stages.dsir as m

    monkeypatch.setattr(m, "_EXACT_F64", 40)
    with pytest.raises(ValueError, match="exact float64"):
        dsir_scores(rd.from_pandas(DOCS), n_buckets=64).to_pandas()
