"""Dictionary tagging (stages/tagging.py, catalog q97).

The automaton's count semantics are pinned to per-pattern
non-overlapping leftmost-greedy == Python ``str.count`` == the DuckDB
twin's replace-length formula; the randomized sweep proves the
reduction from all-occurrence Aho-Corasick output to that semantics.
"""

from __future__ import annotations

import random

import pandas as pd
import pytest
import ray.data as rd

from rust_paddle_ocr_ray.stages.tagging import (
    AhoCorasick,
    KeywordTagger,
    keyword_tags,
)


def test_basic_counts():
    ac = AhoCorasick(["he", "she", "his", "hers"])
    got = ac.count_nonoverlapping("ushers")
    # "she" at 1, "he" at 2 (overlaps she — counted independently),
    # "hers" at 2
    idx = {p: i for i, p in enumerate(ac.patterns)}
    assert got.get(idx["she"], 0) == 1
    assert got.get(idx["he"], 0) == 1
    assert got.get(idx["hers"], 0) == 1
    assert got.get(idx["his"], 0) == 0


def test_self_overlap_is_nonoverlapping():
    ac = AhoCorasick(["aa"])
    # "aaaa".count("aa") == 2, not 3
    assert ac.count_nonoverlapping("aaaa") == {0: 2}


def test_randomized_equivalence_vs_str_count():
    rng = random.Random(20260820)
    for _ in range(1500):
        pats: set[str] = set()
        while len(pats) < rng.randint(1, 6):
            pats.add("".join(rng.choice("abc")
                             for _ in range(rng.randint(1, 4))))
        ordered = sorted(pats)
        ac = AhoCorasick(ordered)
        text = "".join(rng.choice("abc ") for _ in range(rng.randint(0, 80)))
        got = ac.count_nonoverlapping(text)
        for i, p in enumerate(ordered):
            assert got.get(i, 0) == text.count(p), (text, p)


def test_rejects_bad_dictionaries():
    with pytest.raises(ValueError):
        AhoCorasick(["a", "a"])
    with pytest.raises(ValueError):
        AhoCorasick(["a", ""])


def test_tagger_batch_rows():
    b = pd.DataFrame({"doc_id": [7, 8, 9],
                      "text": ["Big Table scan", "no hits here x", "table table"]})
    out = KeywordTagger(["table", "big table"], "doc_id", "text")(b)
    rows = {(r.doc_id, r.phrase): r.cnt for r in out.itertuples()}
    assert rows == {(7, "table"): 1, (7, "big table"): 1, (9, "table"): 2}
    assert out["doc_id"].dtype == "int64" and out["cnt"].dtype == "int64"


def test_stage_matches_sql_semantics(ray_session):
    df = pd.DataFrame({
        "doc_id": range(6),
        "text": ["alpha beta beta", "BETA alpha", "", "gamma",
                 "beta beta beta", "alphabeta"],
    })
    out = (keyword_tags(rd.from_pandas(df), ["beta", "alpha b"])
           .to_pandas().sort_values(["doc_id", "phrase"]).reset_index(drop=True))
    want = []
    for r in df.itertuples():
        t = r.text.lower()
        for p in ["alpha b", "beta"]:
            c = t.count(p)
            if c:
                want.append({"doc_id": r.doc_id, "phrase": p, "cnt": c})
    want_df = (pd.DataFrame(want).sort_values(["doc_id", "phrase"])
               .reset_index(drop=True))
    pd.testing.assert_frame_equal(
        out.astype({"doc_id": "int64", "cnt": "int64"}),
        want_df.astype({"doc_id": "int64", "cnt": "int64"}))


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=150, deadline=None)
@given(
    st.sets(st.text(alphabet="ab", min_size=1, max_size=5),
            min_size=1, max_size=8),
    st.text(alphabet="ab ", max_size=120),
)
def test_hypothesis_equivalence_vs_str_count(pats, text):
    ordered = sorted(pats)
    ac = AhoCorasick(ordered)
    got = ac.count_nonoverlapping(text)
    for i, p in enumerate(ordered):
        assert got.get(i, 0) == text.count(p)


def test_null_text_emits_no_rows():
    # the SQL twin's lower(NULL) yields NULL -> no row; str(NaN) would
    # have matched 'nan'-substring phrases (review finding)
    b = pd.DataFrame({"doc_id": [1, 2], "text": [None, "nan banana"]})
    out = KeywordTagger(["nan", "an"], "doc_id", "text")(b)
    assert set(out["doc_id"]) == {2}
    rows = {(r.doc_id, r.phrase): r.cnt for r in out.itertuples()}
    assert rows == {(2, "nan"): 2, (2, "an"): 3}
