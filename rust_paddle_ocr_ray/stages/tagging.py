"""Dictionary tagging — multi-pattern keyword counting over every
document with ONE text pass, the blocklist / taxonomy-tagging /
topic-labelling primitive of large-scale curation (tag 100 TB of crawl
against a phrase dictionary, then filter or stratify the mix by tag).

Scale shape: the dictionary compiles ONCE PER ACTOR into an
Aho-Corasick automaton (goto/fail/output links — Aho & Corasick 1975),
so per-batch cost is ``O(text bytes + matches)`` REGARDLESS of
dictionary size; a per-phrase scan would pay ``O(phrases × bytes)``
and loses by the dictionary's size (10⁵-phrase blocklists are normal).
The stage is a callable CLASS for ``map_batches(..., concurrency=N)``
— build in ``__init__`` (once per actor), match in ``__call__`` (the
ST2 pattern of stages/recognize.py).

Count semantics are PINNED to per-pattern non-overlapping
leftmost-greedy — exactly Python ``str.count`` and exactly DuckDB's
``(length(t) - length(replace(t, p, ''))) // length(p)`` — so the SQL
twin is closed-form.  The automaton emits ALL occurrence positions
(including overlaps); a per-pattern greedy walk over the
end-position-ordered matches (keep a match iff it starts at or after
the previous kept match's end) reduces to that semantics — proven
equivalent to ``str.count`` by a randomized sweep in
tests/test_tagging.py.  Patterns are matched against ``lower(text)``;
distinct patterns count INDEPENDENTLY (overlaps across patterns do
not suppress each other — same as the SQL form).

No reference analog (rust-paddle-ocr has no dictionary machinery);
the operator exists for the training-data catalog (SURVEY §2.5+).
"""

from __future__ import annotations

from collections import deque

import numpy as np
import pandas as pd


class AhoCorasick:
    """Classic goto/fail/output automaton over unicode code points.

    ``find_all(text)`` yields ``(pattern_index, end_position)`` in
    increasing end order — every occurrence, overlapping included.
    """

    def __init__(self, patterns: list[str]):
        if len(set(patterns)) != len(patterns):
            raise ValueError("duplicate patterns")
        if any(not p for p in patterns):
            raise ValueError("empty pattern")
        self.patterns = list(patterns)
        self._goto: list[dict[str, int]] = [{}]
        self._out: list[list[int]] = [[]]
        for pi, pat in enumerate(patterns):
            s = 0
            for ch in pat:
                nxt = self._goto[s].get(ch)
                if nxt is None:
                    self._goto.append({})
                    self._out.append([])
                    nxt = len(self._goto) - 1
                    self._goto[s][ch] = nxt
                s = nxt
            self._out[s].append(pi)
        # BFS failure links; outputs accumulate along the fail chain so
        # find_all never walks it at match time
        self._fail = [0] * len(self._goto)
        q = deque(self._goto[0].values())
        while q:
            s = q.popleft()
            for ch, t in self._goto[s].items():
                q.append(t)
                f = self._fail[s]
                while f and ch not in self._goto[f]:
                    f = self._fail[f]
                nxt = self._goto[f].get(ch, 0)
                self._fail[t] = nxt if nxt != t else 0
                self._out[t] = self._out[t] + self._out[self._fail[t]]

    def find_all(self, text: str):
        s = 0
        goto, fail, out = self._goto, self._fail, self._out
        for i, ch in enumerate(text):
            while s and ch not in goto[s]:
                s = fail[s]
            s = goto[s].get(ch, 0)
            if out[s]:
                for pi in out[s]:
                    yield pi, i + 1

    def count_nonoverlapping(self, text: str) -> dict[int, int]:
        """Per-pattern non-overlapping leftmost-greedy counts — the
        ``str.count`` semantics (module docstring)."""
        plen = [len(p) for p in self.patterns]
        last_end = {}
        counts: dict[int, int] = {}
        for pi, end in self.find_all(text):
            start = end - plen[pi]
            if start >= last_end.get(pi, 0):
                counts[pi] = counts.get(pi, 0) + 1
                last_end[pi] = end
        return counts


class KeywordTagger:
    """Actor-pool stage: ``(id_col, phrase, cnt)`` rows with ``cnt >
    0`` for every (document, dictionary phrase) hit.  Automaton built
    once per actor."""

    def __init__(self, patterns: list[str], id_col: str = "doc_id",
                 text_col: str = "text"):
        self._ac = AhoCorasick([p.lower() for p in patterns])
        self._orig = list(patterns)
        self._id = id_col
        self._text = text_col

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        ids: list[int] = []
        pis: list[int] = []
        cnts: list[int] = []
        for did, text in zip(b[self._id].to_numpy(),
                             b[self._text].to_numpy()):
            if pd.isna(text):
                # NULL text emits no rows — lower(NULL) is NULL in the
                # SQL twin; str(NaN) would match 'nan'-substring phrases
                continue
            for pi, c in self._ac.count_nonoverlapping(str(text).lower()).items():
                ids.append(did)
                pis.append(pi)
                cnts.append(c)
        pats = np.array(self._orig, dtype=object)
        return pd.DataFrame({
            self._id: pd.Series(ids, dtype="int64"),
            "phrase": pd.Series(pats[pis] if pis else [], dtype=object),
            "cnt": pd.Series(cnts, dtype="int64"),
        })


def keyword_tags(docs, patterns: list[str], id_col: str = "doc_id",
                 text_col: str = "text",
                 concurrency: int | tuple[int, int] | None = None):
    """Tag ``docs`` against ``patterns`` (module docstring).  A
    zero-exchange streaming pass; ``concurrency`` sizes the actor pool
    (None = stateless tasks re-building the automaton per task — fine
    for small dictionaries, wrong for 10⁵-phrase ones).  Prefer a
    ``(1, cap)`` tuple: a FIXED-size pool (plain int) whose size
    approaches the cluster width can deadlock behind a predecessor
    pool's asynchronous teardown (sizing.proportional_pool notes)."""
    if concurrency is None:
        tagger = KeywordTagger(patterns, id_col, text_col)
        return docs.map_batches(tagger, batch_format="pandas")
    return docs.map_batches(
        KeywordTagger, fn_constructor_args=(patterns, id_col, text_col),
        batch_format="pandas", concurrency=concurrency)
