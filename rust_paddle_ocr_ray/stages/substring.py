"""Duplicate-substring span detection — the window-hash approximation
of Lee et al. 2022's ExactSubstr deduplication ("Deduplicating
Training Data Makes Language Models Better"): find every W-char text
window whose content repeats ANYWHERE in the corpus (including inside
the same document), merge the flagged windows into maximal character
intervals per document, and report what a cut pass would remove.
q50 measures duplicate n-gram COVERAGE on word shingles; this is the
character-window SPAN form — the one whose intervals you excise.

Windows are identified by the q32 Karp-Rabin polynomial (base 257,
mod 2^61, W = 16 code points) so BOTH engines compute identical
hashes — the operator's semantics are "hash-duplicate windows":
deterministic and engine-exact even in the astronomically-unlikely
collision (P ≈ windows²/2^62), which would flag the same span on
both sides.  Short documents (< W chars) have no windows and pass
through uncut; unlike q32 there is NO padding.

Scale shape — this operator is INHERENTLY corpus-character-scale
(Lee et al. run it as a dedicated suffix-array job):

1. **Count pass**: per-batch ``(h, cnt)`` window-hash partials
   (value_counts per batch — within-batch repeats pre-aggregate)
   through ONE grouped_sum whose key space is ~distinct windows;
   the exchange carries slim int pairs, never text.  ``HAVING
   cnt > 1`` leaves the duplicate-hash set.
2. **Flag pass**, measured choice (the dedup.py posture):
   - ``≤ broadcast_max_hashes`` duplicate hashes: the SORTED int64
     array ships once via ``ray.put`` and flagging is a ZERO-exchange
     ``np.searchsorted`` probe per batch — a doc's windows live in
     its own row, so interval merging is per-batch-final.
   - above the cap: slim ``(doc, i, h)`` rows bucket-join the dup
     set (hash_join semi), then ONE doc-keyed exchange co-locates
     each document's flagged positions for the interval merge.
3. **Interval merge** (vectorized): equal-length windows sorted by
   position merge iff the gap < W, so islands fall out of one
   ``np.diff >= W`` and the cut total is ``Σ(last_i - first_i) +
   W·n_islands`` per document.

The per-window hash itself is vectorized EXACTLY in uint64: mod 2^61
is a bitmask, and each ``ord·power`` multiply splits the power into
40+21 bits so every intermediate stays under 2^62 (ord ≤ 0x10FFFF <
2^21) — no object-dtype bigints in the hot loop.

No reference analog; training-data catalog (SURVEY §2.5+).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

#: window width in code points (the q32 contract)
WINDOW = 16

_MOD_BITS = 61
_MASK = (1 << _MOD_BITS) - 1
_BASE = 257

#: split point for the exact uint64 modmul (module docstring)
_LO_BITS = 40
_LO_MASK = (1 << _LO_BITS) - 1

#: above this many duplicate hashes the flag pass stops broadcasting
#: and goes through the bucket join (measured-choice posture)
BROADCAST_MAX_HASHES = 2_000_000

#: powers 257^(W-1-j) mod 2^61 for j = 0..W-1 (matches SQL_Q32's
#: VALUES table with j_sql = j+1: 257^(16-j_sql))
_POWS = np.array([pow(_BASE, WINDOW - 1 - j, 1 << _MOD_BITS)
                  for j in range(WINDOW)], dtype="uint64")
_POW_HI = _POWS >> _LO_BITS
_POW_LO = _POWS & np.uint64(_LO_MASK)


def _ords(text: str) -> np.ndarray:
    """Code points of ``text`` as uint64 (1 per character, any plane)."""
    if not text:
        return np.zeros(0, dtype="uint64")
    return np.frombuffer(text.encode("utf-32-le"), dtype="<u4").astype("uint64")


def window_hashes(text: str, window: int = WINDOW) -> np.ndarray:
    """All ``window``-char Karp-Rabin hashes of ``text`` (int64, one
    per start position; empty when len < window) — bit-identical to
    SQL_Q32's closed-form sum and to rolling_fingerprint's iterative
    form, computed exactly in uint64 (module docstring)."""
    o = _ords(text)
    n = len(o) - window + 1
    if n <= 0:
        return np.zeros(0, dtype="int64")
    acc = np.zeros(n, dtype="uint64")
    hi21 = np.uint64((1 << (_MOD_BITS - _LO_BITS)) - 1)
    for j in range(window):
        oj = o[j:j + n]
        term = oj * _POW_LO[j] + ((oj * _POW_HI[j]) & hi21) * np.uint64(1 << _LO_BITS)
        acc = (acc + (term & np.uint64(_MASK))) & np.uint64(_MASK)
    return acc.astype("int64")


def _merge_stats(pos: np.ndarray, window: int) -> tuple[int, int]:
    """(cut_chars, n_spans) for sorted flagged window starts: equal-
    length intervals merge iff the start gap < window."""
    if len(pos) == 0:
        return 0, 0
    brk = np.flatnonzero(np.diff(pos) >= window)
    starts = np.concatenate([[0], brk + 1])
    ends = np.concatenate([brk, [len(pos) - 1]])
    cut = int((pos[ends] - pos[starts]).sum()) + window * len(starts)
    return cut, len(starts)


def duplicate_span_stats(docs, id_col: str = "doc_id",
                         text_col: str = "text", window: int = WINDOW,
                         broadcast_max_hashes: int = BROADCAST_MAX_HASHES,
                         num_buckets: int | None = None):
    """Per-document duplicate-span statistics (module docstring):
    one row per input document —
    ``(id_col, n_chars, cut_chars, kept_chars, n_cut_spans)``."""
    import ray

    from ..sizing import data_aware_buckets, estimate_rows
    from .distinct import grouped_sum
    from .merge import _get_broadcast

    def count_partial(b: pd.DataFrame) -> pd.DataFrame:
        hs = [window_hashes(t, window) for t in b[text_col].to_numpy()
              if not pd.isna(t)]
        if not hs:
            return pd.DataFrame({"h": pd.Series([], dtype="int64"),
                                 "cnt": pd.Series([], dtype="int64")})
        u, c = np.unique(np.concatenate(hs), return_counts=True)
        return pd.DataFrame({"h": u, "cnt": c.astype("int64")})

    nb = num_buckets or data_aware_buckets(estimate_rows(docs))
    hist = grouped_sum(docs.map_batches(count_partial, batch_format="pandas"),
                       "h", ["cnt"], num_buckets=nb).filter(expr="cnt > 1")
    n_dup = hist.count()

    if n_dup <= broadcast_max_hashes:
        # ---- broadcast path: sorted dup array ships once, the flag +
        # interval merge is ONE zero-exchange pass (per-doc windows
        # live in the doc's own row)
        dup = np.sort(hist.to_pandas()["h"].to_numpy())
        ref = ray.put(dup)

        def flag(b: pd.DataFrame) -> pd.DataFrame:
            d = _get_broadcast(ref)
            rows = []
            for did, t in zip(b[id_col].to_numpy(), b[text_col].to_numpy()):
                t = "" if pd.isna(t) else str(t)
                h = window_hashes(t, window)
                if len(h):
                    idx = np.searchsorted(d, h)
                    idx[idx == len(d)] = 0
                    pos = np.flatnonzero(d[idx] == h)
                else:
                    pos = np.zeros(0, dtype="int64")
                cut, n_spans = _merge_stats(pos, window)
                rows.append((did, len(t), cut, len(t) - cut, n_spans))
            out = pd.DataFrame(rows, columns=[id_col, "n_chars", "cut_chars",
                                              "kept_chars", "n_cut_spans"])
            return out.astype({c: "int64" for c in out.columns})

        return docs.map_batches(flag, batch_format="pandas")

    # ---- distributed path: slim (doc, i, h) rows semi-join the dup
    # set, then ONE doc-keyed exchange merges each doc's intervals
    from .join import hash_join

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        dids, poss, hs = [], [], []
        for did, t in zip(b[id_col].to_numpy(), b[text_col].to_numpy()):
            t = "" if pd.isna(t) else str(t)
            h = window_hashes(t, window)
            dids.append(np.full(len(h), did, dtype="int64"))
            poss.append(np.arange(len(h), dtype="int64"))
            hs.append(h)
        return pd.DataFrame({
            id_col: np.concatenate(dids) if dids else np.zeros(0, "int64"),
            "i": np.concatenate(poss) if poss else np.zeros(0, "int64"),
            "h": np.concatenate(hs) if hs else np.zeros(0, "int64"),
        })

    flagged = hash_join(docs.map_batches(explode, batch_format="pandas"),
                        hist.map_batches(lambda b: b[["h"]],
                                         batch_format="pandas"),
                        on="h", how="semi")

    lens = docs.map_batches(
        lambda b: pd.DataFrame({
            id_col: b[id_col].astype("int64"),
            "n_chars": b[text_col].fillna("").str.len().astype("int64")}),
        batch_format="pandas")

    def bucketize(b: pd.DataFrame) -> pd.DataFrame:
        out = b[[id_col, "i"]].copy()
        out["_db"] = (out[id_col].to_numpy() % 64).astype("int32")
        return out

    import pyarrow as pa

    def per_bucket(g: pd.DataFrame) -> pa.Table:
        res = []
        for did, grp in g.groupby(id_col, sort=False):
            pos = np.sort(grp["i"].to_numpy())
            cut, n_spans = _merge_stats(pos, window)
            res.append((did, cut, n_spans))
        return pa.Table.from_pydict({
            id_col: pd.Series([r[0] for r in res], dtype="int64"),
            "cut_chars": pd.Series([r[1] for r in res], dtype="int64"),
            "n_cut_spans": pd.Series([r[2] for r in res], dtype="int64"),
        })

    cuts = (flagged.map_batches(bucketize, batch_format="pandas")
            .groupby("_db").map_groups(per_bucket, batch_format="pandas"))
    out = hash_join(lens, cuts, on=id_col, how="left")

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        cut = b["cut_chars"].fillna(0).astype("int64")
        return pd.DataFrame({
            id_col: b[id_col].astype("int64"),
            "n_chars": b["n_chars"].astype("int64"),
            "cut_chars": cut,
            "kept_chars": b["n_chars"].astype("int64") - cut,
            "n_cut_spans": b["n_cut_spans"].fillna(0).astype("int64"),
        })

    return out.map_batches(finish, batch_format="pandas")
