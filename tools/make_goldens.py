"""Generate the committed golden layer (FIXTURES.md §3) — run manually:

    python tools/make_goldens.py

Goldens are computed ONCE by the independent oracle (tests/oracle_impl.py)
over the deterministic synthetic corpus (seed=42) and committed; the test
suite never regenerates them.
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rust_paddle_ocr_ray.config import CLI_CONFIG
from rust_paddle_ocr_ray.sources.synth import generate_pages
from tests.oracle_impl import extract_corpus

N_PAGES = 240
SEED = 42
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests", "golden")

#: the driver's correctness-gate scale factor — q23/q24 golden twins are
#: generated at exactly this sf and surfaced through oracle_sql() as
#: ``read_parquet`` golden twins (VERDICT r2 item 7)
GATE_SF_DIR = "/root/testdata/sf0.01"


def make_driver_gate_goldens() -> None:
    """Oracle goldens for the driver-gate extraction queries (q23, q24)
    over the sf0.01 ``documents`` table — computed by the independent
    oracle (tests/oracle_impl.py), never by the engine under test.  The
    page wrapping (sources/synth.pages_from_documents) is shared input
    synthesis, not system-under-test code."""
    import numpy as np

    from rust_paddle_ocr_ray.sources.synth import pages_from_documents

    docs = pq.read_table(os.path.join(GATE_SF_DIR, "documents.parquet"))
    pages = pages_from_documents(docs)
    rows = pages.to_pylist()
    results = extract_corpus(rows, CLI_CONFIG)

    q23 = pa.Table.from_pylist(
        [
            {
                "url": r["url"],
                "warc_ts": r["warc_ts"],
                "lang": r["lang"],
                "extracted_text": r["extracted_text"],
                "n_spans": r["n_spans"],
                "confidence": r["confidence"],
            }
            for r in results
        ],
        schema=pa.schema(
            [
                ("url", pa.string()),
                ("warc_ts", pa.timestamp("us")),
                ("lang", pa.string()),
                ("extracted_text", pa.string()),
                ("n_spans", pa.int64()),
                ("confidence", pa.float64()),
            ]
        ),
    )
    # q24 = detect-stage span rows (SPANS_SCHEMA minus raw); the oracle's
    # integer density score is stored float32, matching the engine schema
    # exactly (integers <= 255 are exact in both widths)
    q24 = pa.Table.from_pylist(
        [
            {
                "url": r["url"],
                "warc_ts": r["warc_ts"],
                "lang": r["lang"],
                "block_id": s["block_id"],
                "start": s["start"],
                "end": s["end"],
                "tstart": s["tstart"],
                "tend": s["tend"],
                "line_start": s["line_start"],
                "line_end": s["line_end"],
                "tag": s["tag"],
                "depth": s["depth"],
                "order": s["order"],
                "score": np.float32(s["score"]),
            }
            for r in results
            for s in r["spans"]
        ],
        schema=pa.schema(
            [
                ("url", pa.string()),
                ("warc_ts", pa.timestamp("us")),
                ("lang", pa.string()),
                ("block_id", pa.int32()),
                ("start", pa.int64()),
                ("end", pa.int64()),
                ("tstart", pa.int64()),
                ("tend", pa.int64()),
                ("line_start", pa.int32()),
                ("line_end", pa.int32()),
                ("tag", pa.string()),
                ("depth", pa.int32()),
                ("order", pa.int32()),
                ("score", pa.float32()),
            ]
        ),
    )
    os.makedirs(OUT, exist_ok=True)
    pq.write_table(q23, os.path.join(OUT, "q23_sf0.01.parquet"))
    pq.write_table(q24, os.path.join(OUT, "q24_sf0.01.parquet"))

    # q30: mixed html/pdf/image corpus through the independent mixed oracle
    from rust_paddle_ocr_ray.sources.synth import mixed_pages_from_documents
    from tests.oracle_impl import extract_mixed_corpus

    mixed_rows = mixed_pages_from_documents(docs).to_pylist()
    mixed = extract_mixed_corpus(mixed_rows, CLI_CONFIG)
    q30 = pa.Table.from_pylist(
        [
            {k: r[k] for k in
             ("url", "warc_ts", "lang", "extracted_text", "n_spans", "confidence")}
            for r in mixed
        ],
        schema=q23.schema,
    )
    pq.write_table(q30, os.path.join(OUT, "q30_sf0.01.parquet"))
    print(f"wrote gate goldens: q23 {q23.num_rows}, q24 {q24.num_rows}, "
          f"q30 {q30.num_rows} rows")


def make_approx_goldens(sf_dir: str = GATE_SF_DIR) -> None:
    """Oracle goldens for the deterministic approximate family (q17
    MinHash, q18 SimHash, q21 LSH ANN, q35 IVF ANN) — computed by the
    independent straight-line oracles (tests/oracle_impl.py), never by
    the engine under test, and surfaced through oracle_sql() as DuckDB
    ``read_parquet`` twins (VERDICT r3 item 1; the same mechanism as
    q23/q24/q30).  Default = the driver gate's sf0.01; pass another
    sf_dir (``python tools/make_goldens.py --approx-sf <dir>``) to
    emit goldens suffixed with that directory's basename so
    tools/check_queries.py can verify the family at other scales."""
    from tests.oracle_impl import (
        oracle_knn_ivf,
        oracle_knn_lsh,
        oracle_minhash_pairs,
        oracle_simhash_pairs,
    )

    import numpy as np

    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"])
    ids = docs["doc_id"].to_pylist()
    texts = docs["text"].to_pylist()

    mh = oracle_minhash_pairs(ids, texts, threshold=0.5)
    q17 = pa.Table.from_pydict(
        {"a": pa.array([p[0] for p in mh], pa.int64()),
         "b": pa.array([p[1] for p in mh], pa.int64())})
    pq.write_table(q17, os.path.join(OUT, f"q17_{sf_tag}.parquet"))

    sh = oracle_simhash_pairs(ids, texts, max_hamming=3)
    q18 = pa.Table.from_pydict(
        {"a": pa.array([p[0] for p in sh], pa.int64()),
         "b": pa.array([p[1] for p in sh], pa.int64()),
         "hamming": pa.array([p[2] for p in sh], pa.int64())})
    pq.write_table(q18, os.path.join(OUT, f"q18_{sf_tag}.parquet"))

    emb = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                        columns=["vec_id", "embedding"])
    vec_ids = emb["vec_id"].to_pylist()
    mat = np.stack(emb["embedding"].to_pandas().to_numpy())
    q_rows = sorted(i for i, v in enumerate(vec_ids) if v < 3)
    q_ids = [vec_ids[i] for i in q_rows]
    q_mat = mat[q_rows]

    def topk_table(rows):
        return pa.Table.from_pydict(
            {"query_id": pa.array([r[0] for r in rows], pa.int64()),
             "neighbor_id": pa.array([r[1] for r in rows], pa.int64()),
             "rank": pa.array([r[2] for r in rows], pa.int64())})

    lsh = oracle_knn_lsh(vec_ids, mat, q_ids, q_mat, k=5, dim=64, bits=8)
    pq.write_table(topk_table(lsh), os.path.join(OUT, f"q21_{sf_tag}.parquet"))
    ivf = oracle_knn_ivf(vec_ids, mat, q_ids, q_mat, k=5, nlist=16, nprobe=4)
    pq.write_table(topk_table(ivf), os.path.join(OUT, f"q35_{sf_tag}.parquet"))

    from tests.oracle_impl import oracle_bpe_encode, oracle_bpe_train

    bpe = oracle_bpe_train(texts, merges=10)
    q93 = pa.Table.from_pydict(
        {"merge_rank": pa.array([r[0] for r in bpe], pa.int64()),
         "lhs": pa.array([r[1] for r in bpe], pa.string()),
         "rhs": pa.array([r[2] for r in bpe], pa.string()),
         "pair_count": pa.array([r[3] for r in bpe], pa.int64())})
    pq.write_table(q93, os.path.join(OUT, f"q93_{sf_tag}.parquet"))

    enc = oracle_bpe_encode(ids, texts, merges=10)
    q94 = pa.Table.from_pydict(
        {"doc_id": pa.array([r[0] for r in enc], pa.int64()),
         "n_words": pa.array([r[1] for r in enc], pa.int64()),
         "n_bpe_tokens": pa.array([r[2] for r in enc], pa.int64())})
    pq.write_table(q94, os.path.join(OUT, f"q94_{sf_tag}.parquet"))
    print(f"wrote approx goldens: q17 {q17.num_rows} pairs, q18 {q18.num_rows} "
          f"pairs, q21 {len(lsh)} rows, q35 {len(ivf)} rows, "
          f"q93 {q93.num_rows} merges, q94 {q94.num_rows} docs")


def make_vp8_goldens() -> None:
    """Golden lossy-WebP (VP8) payloads + the INDEPENDENT ORACLE's own
    reconstruction (system libwebp via tools/webp_oracle.py — the
    decoder the bitstreams were encoded for, not our code).  Committed
    once so tests/test_vp8.py can differential-check functions/vp8.py
    bit-exactly WITHOUT libwebp at test time; the broader oracle-gated
    sweep in that file re-proves the same property live when libwebp
    is present.  Deterministic images (seeded), varied encoder
    settings: quality sweep, segmentation on/off, simple+normal loop
    filter, filter disabled, multiple token partitions, odd /
    non-multiple-of-16 dims."""
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import webp_oracle as wo

    if not wo.available():
        raise SystemExit("libwebp oracle unavailable; cannot regenerate "
                         "VP8 goldens on this host")

    def smooth(seed, h, w):
        r = np.random.default_rng(seed)
        base = r.integers(0, 256, size=((h + 7) // 8, (w + 7) // 8, 3),
                          dtype=np.uint8)
        img = np.kron(base, np.ones((8, 8, 1), dtype=np.uint8))[:h, :w, :]
        return np.clip(img.astype(np.int16)
                       + r.integers(-12, 13, size=(h, w, 3)),
                       0, 255).astype(np.uint8)

    def noise(seed, h, w):
        return np.random.default_rng(seed).integers(
            0, 256, size=(h, w, 3), dtype=np.uint8)

    cases = [
        ("q75_default_48x37", smooth(1, 37, 48), dict(quality=75)),
        ("q30_segments_noise_32x32", noise(2, 32, 32),
         dict(quality=30, segments=4, sns_strength=80)),
        ("q90_parts8_nofilter_65x33", smooth(3, 33, 65),
         dict(quality=90, partitions=3, filter_strength=0)),
        ("q50_simplefilter_17x13", smooth(4, 13, 17),
         dict(quality=50, filter_type=0, filter_strength=40)),
        ("q10_autofilter_40x56", smooth(5, 56, 40),
         dict(quality=10, autofilter=1)),
        ("q95_sharp_noise_16x16", noise(6, 16, 16),
         dict(quality=95, filter_sharpness=5)),
    ]
    names, payloads, ys, us, vs, ws, hs = [], [], [], [], [], [], []
    for name, img, cfg in cases:
        data = wo.encode_rgb(img, **cfg)
        y, u, v = wo.decode_yuv(data)
        names.append(name)
        payloads.append(data)
        ys.append(y.tobytes())
        us.append(u.tobytes())
        vs.append(v.tobytes())
        hs.append(y.shape[0])
        ws.append(y.shape[1])
    tbl = pa.Table.from_pydict({
        "name": pa.array(names, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.array(ws, pa.int32()),
        "height": pa.array(hs, pa.int32()),
        "y": pa.array(ys, pa.binary()),
        "u": pa.array(us, pa.binary()),
        "v": pa.array(vs, pa.binary()),
    })
    pq.write_table(tbl, os.path.join(OUT, "vp8_goldens.parquet"))
    print(f"wrote {tbl.num_rows} VP8 goldens (libwebp oracle)")


def make_vp8l_goldens() -> None:
    """Golden LOSSLESS WebP (VP8L) payloads encoded by the INDEPENDENT
    system libwebp encoder (WebPEncodeLosslessRGB) plus the exact
    source pixels.  Committed once so tests/test_webp.py can prove
    functions/vp8l.py decodes REAL libwebp-encoded files bit-exactly
    WITHOUT libwebp at test time — the image classes are chosen to
    make libwebp emit every decoder feature: LZ77 with 2D proximity
    distance codes (tiled/row-copy images), color cache, predictor +
    subtract-green/color transforms (smooth gradients, photo-like),
    color-indexing incl. sub-byte bundling (few-color images), and
    plain literals (noise)."""
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import webp_oracle as wo

    if not wo.available():
        raise SystemExit("libwebp oracle unavailable; cannot regenerate "
                         "VP8L goldens on this host")

    rng = np.random.default_rng(20260819)
    g = np.add.outer(np.arange(40), np.arange(48)).astype(np.uint8)
    tile = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    pal4 = rng.integers(0, 256, (4, 3), dtype=np.uint8)
    pal13 = rng.integers(0, 256, (13, 3), dtype=np.uint8)
    pal40 = rng.integers(0, 256, (40, 3), dtype=np.uint8)
    y = (np.add.outer(np.sin(np.arange(33) / 5),
                      np.cos(np.arange(47) / 7)) * 60 + 128)
    photo = np.clip(np.stack([y, y * 0.9, y * 1.1], axis=2)
                    + rng.normal(0, 6, (33, 47, 3)), 0, 255).astype(np.uint8)
    row = rng.integers(0, 256, (1, 64, 3), dtype=np.uint8)
    cases = [
        ("noise_16x16", rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)),
        ("noise_31x29", rng.integers(0, 256, (31, 29, 3), dtype=np.uint8)),
        ("gradient_40x48",
         np.stack([g, g + 40, g * 2], axis=2).astype(np.uint8)),
        ("tiled_48x48", np.tile(tile, (6, 6, 1))),
        ("pal4_32x32", pal4[rng.integers(0, 4, (32, 32))]),
        ("pal13_21x35", pal13[rng.integers(0, 13, (21, 35))]),
        ("pal40_24x56", pal40[rng.integers(0, 40, (24, 56))]),
        ("flat_20x20", np.full((20, 20, 3), 77, dtype=np.uint8)),
        ("photo_33x47", photo),
        ("rows_40x64", np.repeat(row, 40, axis=0)),
    ]
    names, payloads, rgbs, ws, hs = [], [], [], [], []
    for name, img in cases:
        img = np.ascontiguousarray(img, dtype=np.uint8)
        data = wo.encode_lossless_rgb(img)
        assert np.array_equal(wo.decode_rgb(data), img)  # truly lossless
        names.append(name)
        payloads.append(data)
        rgbs.append(img.tobytes())
        hs.append(img.shape[0])
        ws.append(img.shape[1])
    tbl = pa.Table.from_pydict({
        "name": pa.array(names, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.array(ws, pa.int32()),
        "height": pa.array(hs, pa.int32()),
        "rgb": pa.array(rgbs, pa.binary()),
    })
    pq.write_table(tbl, os.path.join(OUT, "vp8l_goldens.parquet"))
    print(f"wrote {tbl.num_rows} VP8L goldens (libwebp lossless encoder)")


def make_jpeg_arith_goldens() -> None:
    """Golden arithmetic-coded (SOF9) JPEG payloads, each paired with
    its HUFFMAN twin of the same image/settings — generated by the
    system libjpeg (tools/jpeg_arith_oracle.py) with a generation-time
    assertion that both streams carry IDENTICAL quantized coefficients
    (jpeg_read_coefficients).  tests/test_jpeg_arith.py can then
    differential-check the QM decode path WITHOUT libjpeg at test
    time: decoding the arithmetic stream must reproduce, bit-exactly,
    the pixels of the independently-validated baseline-Huffman path on
    the twin.  Deterministic seeded images across the model's hard
    branches: gradients (large DC categories, FF-leading entropy
    bytes), noise (deep AC chains), edges, gray + color, 4:2:0,
    restart intervals, low/high quality."""
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import jpeg_arith_oracle as jo

    if not jo.available():
        raise SystemExit("libjpeg oracle unavailable; cannot regenerate "
                         "JPEG arithmetic goldens on this host")

    def gradient(seed, h, w, ch):
        r = np.random.default_rng(seed)
        a, b = int(r.integers(1, 5)), int(r.integers(1, 5))
        base = ((np.arange(h)[:, None] * a + np.arange(w)[None, :] * b)
                % 256).astype(np.uint8)
        return np.stack([base, base[::-1], 255 - base], -1) if ch == 3 else base

    def noise(seed, h, w, ch):
        shape = (h, w, 3) if ch == 3 else (h, w)
        return np.random.default_rng(seed).integers(
            0, 256, shape, dtype=np.uint8)

    def edges(seed, h, w, ch):
        px = noise(seed, h, w, ch) // 4
        px[:, : w // 2] += 180
        return px

    cases = [
        ("gray_noise_q80", noise(1, 24, 40, 1), 80, 0, 1),
        ("gray_grad_q34", gradient(2, 33, 5, 1), 34, 0, 1),
        ("gray_edges_q95", edges(3, 17, 61, 1), 95, 0, 1),
        ("gray_grad_q5", gradient(4, 64, 64, 1), 5, 0, 1),
        ("gray_noise_rst1", noise(5, 40, 40, 1), 75, 1, 1),
        ("color_444_q85", noise(6, 21, 35, 3), 85, 0, 1),
        ("color_420_q60", gradient(7, 37, 43, 3), 60, 0, 2),
        ("color_420_rst2", edges(8, 48, 32, 3), 70, 2, 2),
        ("gray_1x1", noise(9, 1, 1, 1), 50, 0, 1),
        ("color_tiny_q98", noise(10, 7, 9, 3), 98, 0, 2),
    ]
    names, ajpgs, hjpgs, ws, hs = [], [], [], [], []
    for name, px, q, rst, sub in cases:
        a = jo.encode(px, quality=q, arith=True, restart_rows=rst,
                      subsamp=sub)
        hjp = jo.encode(px, quality=q, arith=False, restart_rows=rst,
                        subsamp=sub)
        ca, ch = jo.coefficients(a), jo.coefficients(hjp)
        assert len(ca) == len(ch) and all(
            (x == y).all() for x, y in zip(ca, ch)), name
        names.append(name)
        ajpgs.append(a)
        hjpgs.append(hjp)
        hh, ww = px.shape[:2]
        ws.append(ww)
        hs.append(hh)
    tbl = pa.table({
        "name": pa.array(names, pa.string()),
        "arith_jpg": pa.array(ajpgs, pa.binary()),
        "huffman_jpg": pa.array(hjpgs, pa.binary()),
        "width": pa.array(ws, pa.int32()),
        "height": pa.array(hs, pa.int32()),
    })
    pq.write_table(tbl, os.path.join(OUT, "jpeg_arith_goldens.parquet"))
    print(f"wrote {tbl.num_rows} JPEG arithmetic goldens (libjpeg oracle)")


def make_jpeg_arith_prog_goldens() -> None:
    """Golden arithmetic-coded PROGRESSIVE (SOF10) JPEG payloads, each
    paired with its progressive-HUFFMAN (SOF2) twin of the same
    image/settings — generated by the system libjpeg with a
    generation-time assertion of identical quantized coefficients, so
    tests/test_jpeg_arith_prog.py can differential-check the Annex-G
    QM decode path without libjpeg at test time (the SOF2 twin's
    decode is itself independently validated).  Images cover the
    model's hard branches: gradients (deep DC categories), noise
    (long AC chains + multi-level refinements at quality extremes),
    edges, gray + color, 4:2:0, restart intervals."""
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import jpeg_arith_oracle as jo

    if not jo.available():
        raise SystemExit("libjpeg oracle unavailable; cannot regenerate "
                         "JPEG arithmetic-progressive goldens on this host")

    def gradient(seed, h, w, ch):
        r = np.random.default_rng(seed)
        a, b = int(r.integers(1, 5)), int(r.integers(1, 5))
        base = ((np.arange(h)[:, None] * a + np.arange(w)[None, :] * b)
                % 256).astype(np.uint8)
        return np.stack([base, base[::-1], 255 - base], -1) if ch == 3 else base

    def noise(seed, h, w, ch):
        shape = (h, w, 3) if ch == 3 else (h, w)
        return np.random.default_rng(seed).integers(
            0, 256, shape, dtype=np.uint8)

    def edges(seed, h, w, ch):
        px = noise(seed, h, w, ch) // 4
        px[:, : w // 2] += 180
        return px

    cases = [
        ("p_gray_noise_q80", noise(21, 24, 40, 1), 80, 0, 1),
        ("p_gray_grad_q34", gradient(22, 33, 5, 1), 34, 0, 1),
        ("p_gray_edges_q95", edges(23, 17, 61, 1), 95, 0, 1),
        ("p_gray_grad_q5", gradient(24, 64, 64, 1), 5, 0, 1),
        ("p_gray_noise_rst1", noise(25, 40, 40, 1), 75, 1, 1),
        ("p_color_444_q85", noise(26, 21, 35, 3), 85, 0, 1),
        ("p_color_420_q60", gradient(27, 37, 43, 3), 60, 0, 2),
        ("p_color_420_rst2", edges(28, 48, 32, 3), 70, 2, 2),
        ("p_gray_1x1", noise(29, 1, 1, 1), 50, 0, 1),
        ("p_color_tiny_q98", noise(30, 7, 9, 3), 98, 0, 2),
    ]
    names, ajpgs, hjpgs, ws, hs = [], [], [], [], []
    for name, px, q, rst, sub in cases:
        a = jo.encode(px, quality=q, arith=True, restart_rows=rst,
                      subsamp=sub, progressive=True)
        hjp = jo.encode(px, quality=q, arith=False, restart_rows=rst,
                        subsamp=sub, progressive=True)
        ca, ch = jo.coefficients(a), jo.coefficients(hjp)
        assert len(ca) == len(ch) and all(
            (x == y).all() for x, y in zip(ca, ch)), name
        names.append(name)
        ajpgs.append(a)
        hjpgs.append(hjp)
        hh, ww = px.shape[:2]
        ws.append(ww)
        hs.append(hh)
    tbl = pa.table({
        "name": pa.array(names, pa.string()),
        "arith_jpg": pa.array(ajpgs, pa.binary()),
        "huffman_jpg": pa.array(hjpgs, pa.binary()),
        "width": pa.array(ws, pa.int32()),
        "height": pa.array(hs, pa.int32()),
    })
    pq.write_table(tbl,
                   os.path.join(OUT, "jpeg_arith_prog_goldens.parquet"))
    print(f"wrote {tbl.num_rows} JPEG arithmetic-progressive goldens "
          "(libjpeg oracle)")


def main() -> None:
    pages = generate_pages(N_PAGES, seed=SEED)
    rows = pages.to_pylist()
    results = extract_corpus(rows, CLI_CONFIG)

    extracted = pa.Table.from_pylist(
        [
            {
                "url": r["url"],
                "warc_ts": r["warc_ts"],
                "lang": r["lang"],
                "extracted_text": r["extracted_text"],
                "n_spans": r["n_spans"],
                "confidence": r["confidence"],
            }
            for r in results
        ]
    )
    spans = pa.Table.from_pylist(
        [
            {
                "url": r["url"],
                "block_id": s["block_id"],
                "start": s["start"],
                "end": s["end"],
                "tstart": s["tstart"],
                "tend": s["tend"],
                "order": s["order"],
                "score": float(s["score"]),
                "tag": s["tag"],
                "text": s["text"],
                "confidence": s["confidence"],
            }
            for r in results
            for s in r["spans"]
        ]
    )
    os.makedirs(OUT, exist_ok=True)
    pq.write_table(extracted, os.path.join(OUT, "extracted.parquet"))
    pq.write_table(spans, os.path.join(OUT, "spans.parquet"))
    print(f"wrote {extracted.num_rows} extracted rows, {spans.num_rows} span rows to {OUT}")


if __name__ == "__main__":
    if sys.argv[1:2] == ["--approx-sf"]:
        # extra-scale approximate-family goldens only (e.g. sf0.1 for
        # tools/check_queries.py parity runs beyond the driver gate)
        if len(sys.argv) < 3:
            # a missing sf dir must NOT fall through to the full
            # regeneration below — goldens are independent-oracle
            # output, regenerated only on a deliberate spec change
            sys.exit("usage: make_goldens.py --approx-sf <sf_dir>")
        make_approx_goldens(sys.argv[2])
    elif sys.argv[1:2] == ["--vp8"]:
        # VP8 goldens only (needs libwebp on the regeneration host)
        make_vp8_goldens()
    elif sys.argv[1:2] == ["--vp8l"]:
        # lossless-WebP goldens only (needs libwebp on the host)
        make_vp8l_goldens()
    elif sys.argv[1:2] == ["--jpeg-arith"]:
        # arithmetic-JPEG goldens only (needs gcc + libjpeg headers)
        make_jpeg_arith_goldens()
        make_jpeg_arith_prog_goldens()
    else:
        main()
        make_driver_gate_goldens()
        make_approx_goldens()
        make_vp8_goldens()
        make_vp8l_goldens()
        make_jpeg_arith_goldens()
        make_jpeg_arith_prog_goldens()
