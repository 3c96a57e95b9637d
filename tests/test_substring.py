"""Duplicate-substring spans (stages/substring.py, catalog q101).

window_hashes is locked against a plain-Python per-window polynomial
(the q32 contract); the interval merge against a brute union of
[p, p+W) intervals; the end-to-end stage against a dict-based oracle,
with the forced distributed (bucket-join) path bit-identical to the
broadcast path.
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from rust_paddle_ocr_ray.stages.substring import (
    WINDOW,
    _merge_stats,
    duplicate_span_stats,
    window_hashes,
)

_MOD = 1 << 61


def _brute_hashes(s: str, w: int = WINDOW) -> list[int]:
    out = []
    for i in range(len(s) - w + 1):
        h = 0
        for j, ch in enumerate(s[i:i + w]):
            h = (h + ord(ch) * pow(257, w - 1 - j, _MOD)) % _MOD
        out.append(h)
    return out


def test_window_hashes_match_brute():
    rng = random.Random(11)
    for _ in range(200):
        n = rng.randint(0, 60)
        s = "".join(chr(rng.choice([rng.randint(32, 126),
                                    rng.randint(0x4E00, 0x9FFF),
                                    rng.randint(0x10000, 0x10400)]))
                    for _ in range(n))
        assert window_hashes(s).tolist() == _brute_hashes(s), s


def test_merge_stats_match_interval_union():
    rng = random.Random(3)
    for _ in range(400):
        pos = np.sort(np.array(rng.sample(range(60), rng.randint(0, 12)),
                               dtype="int64"))
        ivs: list[tuple[int, int]] = []
        for p in pos:
            if ivs and p < ivs[-1][1]:
                ivs[-1] = (ivs[-1][0], max(ivs[-1][1], int(p) + WINDOW))
            else:
                ivs.append((int(p), int(p) + WINDOW))
        assert _merge_stats(pos, WINDOW) == (sum(e - s for s, e in ivs),
                                             len(ivs))


def _oracle(df: pd.DataFrame) -> pd.DataFrame:
    from collections import Counter

    cnt: Counter = Counter()
    per_doc = {}
    for r in df.itertuples():
        hs = _brute_hashes(str(r.text))
        per_doc[r.doc_id] = hs
        cnt.update(hs)
    rows = []
    for r in df.itertuples():
        pos = np.array([i for i, h in enumerate(per_doc[r.doc_id])
                        if cnt[h] > 1], dtype="int64")
        cut, n = _merge_stats(pos, WINDOW)
        L = len(str(r.text))
        rows.append({"doc_id": r.doc_id, "n_chars": L, "cut_chars": cut,
                     "kept_chars": L - cut, "n_cut_spans": n})
    return pd.DataFrame(rows).astype("int64")


DOCS = pd.DataFrame({
    "doc_id": range(6),
    "text": [
        "the quick brown fox jumps over the lazy dog once",
        "prefix THE SHARED DUPLICATED SEGMENT suffix one",
        "other THE SHARED DUPLICATED SEGMENT suffix two",
        "short",                                   # < 16 chars: no windows
        "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",        # self-repeating windows
        "the quick brown fox jumps over the lazy dog once",  # full dup of 0
    ],
})


def test_stage_matches_oracle_broadcast(ray_session):
    out = (duplicate_span_stats(rd.from_pandas(DOCS))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    want = _oracle(DOCS)
    pd.testing.assert_frame_equal(out.astype("int64"), want)
    # the planted full duplicate is fully cut; the short doc untouched
    assert out.loc[5, "cut_chars"] == out.loc[5, "n_chars"]
    assert out.loc[3, "cut_chars"] == 0 and out.loc[3, "kept_chars"] == 5
    # the self-repeating doc is flagged by WITHIN-doc repeats alone
    assert out.loc[4, "cut_chars"] == out.loc[4, "n_chars"]


def test_distributed_path_bit_identical(ray_session):
    broad = (duplicate_span_stats(rd.from_pandas(DOCS))
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
    dist = (duplicate_span_stats(rd.from_pandas(DOCS),
                                 broadcast_max_hashes=0)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(broad.astype("int64"),
                                  dist.astype("int64"))


def test_null_text_is_empty_doc(ray_session):
    df = pd.DataFrame({"doc_id": [0, 1],
                       "text": [None, "x" * 20]})
    out = (duplicate_span_stats(rd.from_pandas(df))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert out.loc[0].tolist() == [0, 0, 0, 0, 0]
