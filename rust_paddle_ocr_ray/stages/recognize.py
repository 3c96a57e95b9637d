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


#: conservative bound on one page's recognized-span bytes relative to its
#: (truncated) html payload: tight span interiors are disjoint html slices
#: and decode never expands text past its raw slice, so span text sums to
#: <= ~1x the payload; 3x covers per-row fixed columns, url repetition and
#: utf-8 width slack.  Shared by the yield cap and the merge-mode check.
PAGE_SPAN_BYTES_FACTOR = 3


def page_aligned_yield_cap(target: int | None, max_html_bytes: int) -> int:
    """Yield-size cap (bytes) that makes mid-page block slices impossible.

    Ray's BlockOutputBuffer holds < target bytes between adds and slices a
    built block mid-row-run only when it reaches 1.5x target — so as long
    as every yielded chunk is <= target/2, buffer + chunk < 1.5x target
    and blocks always cut BETWEEN yields.  ``_page_aligned_slices`` cuts
    at the first page boundary past the cap, overshooting by at most one
    page (<= PAGE_SPAN_BYTES_FACTOR * max_html_bytes), so the cap must
    leave room for that overshoot:

        cap = target/2 - PAGE_SPAN_BYTES_FACTOR * max_html_bytes

    (32 MB ceiling for pipelining; floor of 1 byte = one page per yield.
    ``ExtractPipeline._splits_possible`` checks the SAME bound — when
    cap + page_overshoot no longer fits in target/2, a single oversized
    page can trip the slicer and the merge switches to boundary routing.)
    """
    if not target:
        return 32 * 1024 * 1024
    cap = target // 2 - PAGE_SPAN_BYTES_FACTOR * max_html_bytes
    return max(1, min(cap, 32 * 1024 * 1024))


def _page_aligned_slices(tbl: pa.Table, max_bytes: int):
    """Yield zero-copy page-aligned slices of a recognized-span table,
    each cut at the first page boundary past ``max_bytes`` of ACTUAL
    row bytes (variable-width columns measured via Arrow offsets, not a
    table-average estimate — a batch mixing one huge page with many tiny
    ones would blow past an average-based cap).  See
    :func:`page_aligned_yield_cap` for why the bound matters."""
    import pyarrow.compute as pc

    n = tbl.num_rows
    if n == 0:
        yield tbl
        return
    urls = tbl["url"].to_numpy(zero_copy_only=False)
    ts = tbl["warc_ts"].to_numpy(zero_copy_only=False)
    change = np.flatnonzero((urls[1:] != urls[:-1]) | (ts[1:] != ts[:-1])) + 1
    # exact-ish per-row bytes: the two dominant variable-width columns
    # plus a fixed overhead for the remaining primitive columns
    row_bytes = (
        pc.binary_length(tbl["text"]).to_numpy(zero_copy_only=False).astype("int64")
        + pc.binary_length(tbl["url"]).to_numpy(zero_copy_only=False).astype("int64")
        + 64
    )
    cum = np.concatenate(([0], np.cumsum(row_bytes)))
    start = 0
    for b in change.tolist():
        if cum[b] - cum[start] >= max_bytes:
            yield tbl.slice(start, b - start)
            start = b
    if start < n:
        yield tbl.slice(start, n - start)


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
        # page boundaries (see page_aligned_yield_cap)
        from ray.data import DataContext

        target = DataContext.get_current().target_max_block_size
        yield from _page_aligned_slices(
            out_tbl, page_aligned_yield_cap(target, cfg.max_html_bytes)
        )
