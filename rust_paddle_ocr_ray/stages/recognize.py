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


#: bound on one page's recognized-span TEXT bytes relative to its
#: (truncated) html payload: tight span interiors are disjoint html
#: slices and decode never expands text past its raw slice, so per-page
#: text sums to <= 1x the payload in characters; re-encoding to utf-8
#: widens at most 3x (one replacement char U+FFFD, 3 bytes, per invalid
#: input byte — everything else never gains width over its input bytes)
PAGE_SPAN_BYTES_FACTOR = 3

#: per-span fixed-column + small-string allowance for the worst-case
#: single-page model: the measured Arrow fixed width is ~88 B/row
#: (FIXED_ROW_BYTES below) and the url/lang/tag repetition is allowed
#: ~400 B — pages whose ACTUAL per-span bytes exceed the allowance are
#: caught by the runtime check in ``_page_aligned_slices`` (strict
#: mode), never silently split
SPAN_OVERHEAD_BYTES = 512

#: exact Arrow fixed-width bytes per recognized-span row (warc_ts 8 +
#: 4x offset int64 32 + block_id/line_start/line_end/depth/order/score
#: 24 + confidence 8 = 72) + 4 string-offset ints (16) + validity
#: bitmaps, rounded up — a strict OVERestimate so measured chunk bytes
#: upper-bound Ray's accounting
FIXED_ROW_BYTES = 96


#: preferred (soft) yield size for pipelining granularity — chunks cut
#: at this size when pages allow; a single page may exceed it up to the
#: HARD cap without endangering block alignment
SOFT_YIELD_BYTES = 32 * 1024 * 1024


def page_aligned_yield_cap(target: int | None) -> int:
    """HARD yield-size cap (bytes) that makes mid-page block slices
    impossible.

    Ray's BlockOutputBuffer holds < target bytes between adds and slices
    a built block mid-row-run only when it reaches 1.5x target — so as
    long as every yielded chunk is <= target/2, buffer + chunk < 1.5x
    target and blocks always cut BETWEEN yields.  ``_page_aligned_slices``
    cuts BEFORE the page that would exceed the cap (no overshoot), so
    the cap needs no page-size subtraction; 0.45x target (not 0.5x)
    leaves margin for block-accounting drift between the measured row
    bytes and Ray's ``size_bytes``.  Pipelining granularity is the
    separate SOFT_YIELD_BYTES — the hard cap is pure safety and carries
    no ceiling (without a target Ray never slices, so it is unbounded)."""
    if not target:
        return 1 << 62
    return max(1, int(target * 0.45))


def worst_page_span_bytes(cfg: ExtractConfig) -> int:
    """Model worst case for ONE page's recognized-span bytes: the text
    bound (PAGE_SPAN_BYTES_FACTOR x truncated payload) plus the
    enforced span-count cap times the per-span allowance.  Unlike the
    r3 form this counts the per-span overhead the 3x factor silently
    assumed away (a span-dense page's n_spans x url bytes alone could
    exceed it — ADVICE r4); the allowance itself is enforced at runtime
    by the strict check in ``_page_aligned_slices``."""
    return (PAGE_SPAN_BYTES_FACTOR * cfg.max_html_bytes
            + cfg.max_spans_per_page * SPAN_OVERHEAD_BYTES)


def streaming_merge_safe(cfg: ExtractConfig, target: int | None) -> bool:
    """True when no page version can straddle a block boundary, so the
    merge may use the zero-exchange streaming finalize: yields never
    exceed the cap (greedy page-aligned cuts) and the worst-case single
    page fits the cap too.  With ``skew_split_rows`` (the explicit page
    splitter) or a target too small for the worst-case page, boundary
    routing is required instead."""
    if cfg.skew_split_rows:
        return False
    if not target:
        return True  # Ray never slices blocks without a size target
    return worst_page_span_bytes(cfg) <= page_aligned_yield_cap(target)


def _page_aligned_slices(tbl: pa.Table, max_bytes: int, strict: bool = False,
                         soft_bytes: int | None = None):
    """Yield zero-copy page-aligned slices of a recognized-span table,
    cut greedily at page boundaries so every yield stays <= the soft cut
    size of ACTUAL row bytes (every variable-width column measured via
    Arrow offsets + the exact fixed width — not a table-average
    estimate, and not the r3 two-column undercount).  A single page in
    (soft, hard] yields alone — oversized for pipelining but still
    slice-safe.  A yield can exceed the HARD cap ``max_bytes`` ONLY when
    a single page alone does — impossible under the
    ``worst_page_span_bytes`` model; ``strict=True`` (streaming merge
    selected) makes that model violation a loud error instead of a
    silent mid-page block slice that would emit one url as two output
    rows."""
    import pyarrow.compute as pc

    soft = min(soft_bytes, max_bytes) if soft_bytes else max_bytes
    n = tbl.num_rows
    if n == 0:
        yield tbl
        return
    urls = tbl["url"].to_numpy(zero_copy_only=False)
    ts = tbl["warc_ts"].to_numpy(zero_copy_only=False)
    change = np.flatnonzero((urls[1:] != urls[:-1]) | (ts[1:] != ts[:-1])) + 1
    row_bytes = np.full(n, FIXED_ROW_BYTES, dtype="int64")
    for col in ("url", "lang", "tag", "text"):
        row_bytes += pc.binary_length(tbl[col]).to_numpy(zero_copy_only=False).astype("int64")
    cum = np.concatenate(([0], np.cumsum(row_bytes)))
    bounds = [0, *change.tolist(), n]
    start = 0
    for i in range(len(bounds) - 1):
        a, b = bounds[i], bounds[i + 1]
        if cum[b] - cum[start] > soft and start < a:
            yield tbl.slice(start, a - start)  # cut BEFORE this page
            start = a
        if cum[b] - cum[start] > soft:  # this page alone exceeds soft
            if strict and cum[b] - cum[a] > max_bytes:
                # past the HARD cap too: the worst-case model was
                # violated (per-span bytes beyond SPAN_OVERHEAD_BYTES)
                raise RuntimeError(
                    f"page '{urls[a]}' carries {int(cum[b] - cum[a])} span bytes "
                    f"> the page-aligned yield cap {max_bytes}; the streaming "
                    "merge cannot guarantee block-aligned pages for it.  Set "
                    "skew_split_rows (boundary-routed merge) or raise "
                    "DataContext.target_max_block_size."
                )
            yield tbl.slice(a, b - a)
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
        # page boundaries (see page_aligned_yield_cap); strict when the
        # merge will have selected the streaming finalize (the SAME
        # static predicate the pipeline evaluates)
        from ray.data import DataContext

        target = DataContext.get_current().target_max_block_size
        yield from _page_aligned_slices(
            out_tbl, page_aligned_yield_cap(target),
            strict=streaming_merge_safe(cfg, target),
            soft_bytes=SOFT_YIELD_BYTES,
        )
