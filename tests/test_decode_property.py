"""Property-based spec equivalence: the vectorized decode/canonicalize
(functions/decode.py) vs the naive per-character oracle
(tests/oracle_impl.py) on RANDOM inputs — catches vectorization edge
cases the fixed corpus misses (repeat runs, punctuation clusters,
charset boundaries, CJK, entities, partial tags)."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from rust_paddle_ocr_ray.functions.decode import canonicalize, decode_spans

from . import oracle_impl as oracle

# alphabet mixing every decode branch: letters, digits, punctuation (incl
# rescue-prone), CJK, kana, whitespace runs, entities, tag fragments
_ATOMS = st.sampled_from(
    list("abcXYZ09 ..,,!?;;::''\"()[]--__~~##&&**")
    + list("数据查询流引擎かきくエリム")
    + ["  ", "\t", "\n", "&amp;", "&lt;", "<b>", "</b>", "<", ">", "…", "。", "，", "——"]
)
_TEXT = st.lists(_ATOMS, min_size=0, max_size=60).map("".join)


@settings(max_examples=300, deadline=None)
@given(raws=st.lists(_TEXT, min_size=1, max_size=8),
       route=st.sampled_from(["en", "zh", "ja", "latin"]))
def test_decode_matches_oracle_on_random_inputs(raws, route):
    canon = [canonicalize(r, route) for r in raws]
    expected_canon = [oracle.canonicalize(r, route) for r in raws]
    assert canon == expected_canon

    out, confs = decode_spans(canon, route)
    for i, text in enumerate(canon):
        exp_text, exp_conf = oracle.decode(text, route)
        assert out[i] == exp_text, f"span {i}: {text!r}"
        assert confs[i] == pytest.approx(exp_conf, abs=1e-9)


@settings(max_examples=100, deadline=None)
@given(text=_TEXT,
       min_score=st.sampled_from([0.0, 0.3, 0.6, 0.95]),
       punct_min=st.sampled_from([0.05, 0.1, 0.5]))
def test_decode_threshold_space(text, min_score, punct_min):
    """Threshold knobs (with_min_score / with_punct_min_score analogs,
    /root/reference/src/rec.rs:131-142) agree with the oracle across
    the whole configuration space."""
    canon = canonicalize(text, "en")
    out, confs = decode_spans([canon], "en", min_score, punct_min)
    exp_text, exp_conf = oracle.decode(canon, "en", min_score, punct_min)
    assert out[0] == exp_text
    assert confs[0] == pytest.approx(exp_conf, abs=1e-9)
