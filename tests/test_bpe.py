"""Distributed BPE training (stages/bpe.py, catalog q93) vs the
independent plain-dict oracle (tests/oracle_impl.oracle_bpe_train)."""

from __future__ import annotations

import pandas as pd
import pytest
import ray.data as rd

from rust_paddle_ocr_ray.stages.bpe import _apply_merge, bpe_train
from tests.oracle_impl import oracle_bpe_train


def _run(texts, merges=6):
    df = pd.DataFrame({"text": texts})
    got = bpe_train(rd.from_pandas(df), merges=merges)
    return [tuple(r) for r in got.to_records(index=False)]


def test_matches_oracle(ray_session):
    texts = ["the cat the cat", "aaa the", "banana bandana",
             "THE Cat", "ba na na"]
    assert _run(texts) == oracle_bpe_train(texts, merges=6)


def test_tie_breaks_lexicographic(ray_session):
    # 'xy' and 'xz' both appear twice: the smaller (x, y) must win
    out = _run(["xy xy xz xz"], merges=1)
    assert out[0][1:3] == ("x", "y")


def test_early_stop_when_no_pairs(ray_session):
    # single-character words only: zero adjacent pairs, zero merges
    assert _run(["a b c", "a a"], merges=5) == []


def test_left_greedy_apply():
    # 'aaa' + (a,a): the standard non-overlapping left scan
    assert _apply_merge(list("aaa"), "a", "a", "aa") == ["aa", "a"]
    assert _apply_merge(list("aaaa"), "a", "a", "aa") == ["aa", "aa"]
    assert _apply_merge(list("bab"), "a", "a", "aa") == ["b", "a", "b"]


def test_merged_symbols_chain(ray_session):
    """Later merges consume earlier merge outputs (the defining BPE
    property): 'abab' learns (a,b) then (ab,ab)."""
    out = _run(["abab abab abab"], merges=2)
    assert out[0][1:3] == ("a", "b")
    assert out[1][1:3] == ("ab", "ab")


def test_encode_matches_oracle(ray_session):
    from rust_paddle_ocr_ray.stages.bpe import bpe_encode_counts
    from tests.oracle_impl import oracle_bpe_encode

    texts = ["the cat the cat", "aaa the", "", "banana bandana", "THE Cat"]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    got = (bpe_encode_counts(rd.from_pandas(df), merges=6).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    want = pd.DataFrame(
        oracle_bpe_encode(list(range(len(texts))), texts, merges=6),
        columns=["doc_id", "n_words", "n_bpe_tokens"]).astype("int64")
    pd.testing.assert_frame_equal(got.astype("int64"), want)
    # the wordless doc is PRESENT with zeros, not dropped
    assert got.set_index("doc_id").loc[2, "n_words"] == 0
    # merges compress: token count strictly below character count
    chars = sum(len(w) for w in "the cat the cat".split())
    assert got.set_index("doc_id").loc[0, "n_bpe_tokens"] < chars
