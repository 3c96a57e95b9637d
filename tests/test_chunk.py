"""chunk_documents (stages/chunk.py): the ordinal-vectorized Arrow
kernel must agree with plain Python slicing on every boundary — doc
shorter than one window, exact multiples of the stride, empty docs
(no chunks), multi-byte codepoints (offsets are CODEPOINTS, the
DuckDB-substr / Python-slice semantics, not bytes) — regardless of
block layout."""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from rust_paddle_ocr_ray.stages.chunk import chunk_documents


def _reference(df: pd.DataFrame, size: int, overlap: int) -> pd.DataFrame:
    stride = size - overlap
    rows = []
    for i, t in zip(df.doc_id, df.text):
        j = 0
        while j * stride < len(t):
            s = j * stride
            rows.append((i, j, s, min(s + size, len(t)), t[s:s + size]))
            j += 1
    return (pd.DataFrame(rows, columns=["doc_id", "chunk_id", "begin_at",
                                        "end_at", "chunk"])
            .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True))


def _run(df: pd.DataFrame, size: int, overlap: int, blocks: int = 5) -> pd.DataFrame:
    out = chunk_documents(rd.from_pandas(df).repartition(blocks),
                          "text", "doc_id", size=size, overlap=overlap)
    return (out.to_pandas().sort_values(["doc_id", "chunk_id"])
            .reset_index(drop=True))


def test_boundaries_and_empty(ray_session):
    df = pd.DataFrame({
        "doc_id": np.arange(6, dtype="int64"),
        "text": [
            "",                  # no chunks
            "short",             # one chunk, shorter than size
            "x" * 8,             # exactly one window (size 8)
            "y" * 9,             # stride 6: chunks at 0 and 6
            "z" * 12,            # starts 0, 6 (12 > 6); NOT 12 (12 == len)
            "abcdefghijklmn",    # 14 chars: starts 0, 6, 12
        ],
    })
    got = _run(df, size=8, overlap=2)
    ref = _reference(df, 8, 2)
    pd.testing.assert_frame_equal(got, ref)
    assert got[got.doc_id == 0].empty
    assert list(got[got.doc_id == 5].chunk) == ["abcdefgh", "ghijklmn", "mn"]


def test_codepoint_not_byte_offsets(ray_session):
    # 3-byte CJK + 4-byte emoji: byte-based slicing would split glyphs
    df = pd.DataFrame({
        "doc_id": np.array([0, 1], dtype="int64"),
        "text": ["漢字テスト" * 4, "a\U0001F600b" * 7],
    })
    got = _run(df, size=6, overlap=2, blocks=2)
    ref = _reference(df, 6, 2)
    pd.testing.assert_frame_equal(got, ref)


def test_block_layout_invariance(ray_session):
    rng = np.random.RandomState(3)
    df = pd.DataFrame({
        "doc_id": np.arange(80, dtype="int64"),
        "text": ["".join(rng.choice(list("abc "), rng.randint(0, 40)))
                 for _ in range(80)],
    })
    a = _run(df, size=16, overlap=4, blocks=1)
    b = _run(df, size=16, overlap=4, blocks=11)
    pd.testing.assert_frame_equal(a, b)
