"""Recognition stage: span rows -> text + confidence (actor pool).

The analog of ``Rec`` (/root/reference/src/rec.rs): a stateful stage
whose per-worker state — the four charset LUTs (the 18k-char keys-file
analog, src/rec.rs:51-70) and compiled canonicalization regexes — is
built ONCE per actor in ``__init__`` and reused per batch
(``map_batches(Recognizer, concurrency=N, batch_size=B)``, SURVEY.md
§2.3 ST2).

Per batch: slice each span's tight interior out of its raw crop,
canonicalize (M8), then group rows by charset route (``lang`` routing,
zh/en/ja/latin) and run the vectorized CTC-greedy decode (M9/M10) per
group.  The bulky ``raw`` column is dropped from the output — after
recognition only the text travels to the merge shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..charset import get_charset, route_for_lang
from ..config import DEFAULT_CONFIG, ExtractConfig
from ..functions.decode import canonicalize, decode_spans


#: max total codepoints per decode_spans call — bounds the numpy
#: temporary footprint to a fixed, reused allocation (first-touch page
#: faults on this VM class cost ~50 µs/page: one unbounded 500 MB
#: temporary set was measured at 13 s for its first call, 0.8 s warm)
DECODE_CHUNK_CODEPOINTS = 400_000


def _page_aligned_slices(tbl: pa.Table, max_bytes: int):
    """Yield zero-copy page-aligned slices of a recognized-span table,
    each ~``max_bytes`` (cut at the first page boundary past the cap).

    Why: Ray's BlockOutputBuffer slices a built block mid-row-run only
    when a SINGLE added item pushes it >= 1.5x target_max_block_size.
    Yielding bounded page-aligned chunks keeps every add far below that
    limit, so downstream blocks always cut BETWEEN pages — the
    contiguity guarantee the merge combiner's streaming fast path
    relies on (stages/merge.py)."""
    n = tbl.num_rows
    if n == 0:
        yield tbl
        return
    urls = tbl["url"].to_numpy(zero_copy_only=False)
    ts = tbl["warc_ts"].to_numpy(zero_copy_only=False)
    change = np.flatnonzero((urls[1:] != urls[:-1]) | (ts[1:] != ts[:-1])) + 1
    per_row = max(1, tbl.nbytes // n)
    rows_cap = max(1, max_bytes // per_row)
    start = 0
    for b in change.tolist():
        if b - start >= rows_cap:
            yield tbl.slice(start, b - start)
            start = b
    if start < n:
        yield tbl.slice(start, n - start)


def _yield_cap_bytes() -> int:
    from ray.data import DataContext

    target = DataContext.get_current().target_max_block_size
    if not target:
        return 32 * 1024 * 1024
    return max(1, min(target // 4, 32 * 1024 * 1024))


class Recognizer:
    def __init__(self, cfg: ExtractConfig = DEFAULT_CONFIG):
        self.cfg = cfg
        # materialize all charset LUTs once per actor (ST2) and pre-fault
        # the decode working set so the first real batch runs warm
        for route in ("en", "zh", "ja", "latin"):
            get_charset(route)
        warm = ["stream batch. " * 512] * 8
        decode_spans(warm, "en", cfg.min_score, cfg.punct_min_score)

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        n = batch.num_rows
        raws = batch["raw"].to_pylist()
        starts = batch["start"].to_numpy(zero_copy_only=False)
        tstarts = batch["tstart"].to_numpy(zero_copy_only=False)
        tends = batch["tend"].to_numpy(zero_copy_only=False)
        langs = batch["lang"].to_pylist()

        routes = [route_for_lang(lang) for lang in langs]
        canon: list[str] = [""] * n
        for i in range(n):
            raw = raws[i]
            if not raw:
                continue  # M11 zero-dim guard (src/main.rs:169-172)
            lo = int(tstarts[i] - starts[i])
            hi = int(tends[i] - starts[i])
            canon[i] = canonicalize(raw[lo:hi], routes[i])

        texts: list[str] = [""] * n
        confs = np.zeros(n, dtype=np.float64)
        route_arr = np.array(routes)
        for route in np.unique(route_arr):
            sel = np.flatnonzero(route_arr == route)
            # chunk by codepoint budget: fixed-size numpy working set
            lo = 0
            while lo < sel.size:
                hi, budget = lo, 0
                while hi < sel.size and (budget < DECODE_CHUNK_CODEPOINTS or hi == lo):
                    budget += len(canon[sel[hi]])
                    hi += 1
                part = sel[lo:hi]
                group = [canon[i] for i in part]
                out, c = decode_spans(group, str(route), cfg.min_score, cfg.punct_min_score)
                for k, i in enumerate(part):
                    texts[i] = out[k]
                confs[part] = c
                lo = hi

        out_tbl = batch.drop_columns(["raw"])
        out_tbl = out_tbl.append_column("text", pa.array(texts, type=pa.string()))
        out_tbl = out_tbl.append_column("confidence", pa.array(confs, type=pa.float64()))
        # page-aligned bounded yields: keeps downstream block cuts on
        # page boundaries (see _page_aligned_slices)
        yield from _page_aligned_slices(out_tbl, _yield_cap_bytes())
