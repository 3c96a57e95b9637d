"""Document chunking — the embedding-prep flat-map.

Splits every document into fixed-size character windows with overlap,
carrying (doc_id, chunk_id, begin, end, chunk) so downstream embedding /
similarity stages can join results back to source offsets.  The analog
of the reference's region crop feeding recognition (a page is sliced
into bounded pieces that flow independently; /root/reference/src/det.rs
crop path) applied corpus-wide.

Scale shape: a pure per-batch ``map_batches`` flat-map — no exchange,
no state, output rows ≈ input chars / stride.  The kernel is
vectorized per CHUNK ORDINAL, not per row: ordinal ``j`` slices every
still-long-enough document in the batch at once with
``pyarrow.compute.utf8_slice_codeunits`` (codepoint-based, matching
Python slicing and DuckDB ``substr``), so the Python loop runs
O(max_chunks_per_doc) times per batch, never O(rows).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def chunk_documents(ds, text_col: str, id_col: str,
                    size: int = 512, overlap: int = 128):
    """Overlapping character windows: starts 0, stride, 2*stride, ...
    while start < len(text); ``chunk_id`` is the 0-based ordinal,
    ``begin_at``/``end_at`` are codepoint offsets (end exclusive,
    clamped).  Empty documents emit no chunks."""
    if not 0 <= overlap < size:
        raise ValueError("need 0 <= overlap < size")
    stride = size - overlap

    empty = pa.table({
        id_col: pa.array([], type=pa.int64()),
        "chunk_id": pa.array([], type=pa.int64()),
        "begin_at": pa.array([], type=pa.int64()),
        "end_at": pa.array([], type=pa.int64()),
        "chunk": pa.array([], type=pa.string()),
    })

    def chunks(b: pa.Table) -> pa.Table:
        n_np = pc.utf8_length(b[text_col]).to_numpy(zero_copy_only=False).astype("int64")
        parts = []
        j = 0
        while True:
            start = j * stride
            mask = n_np > start
            if not mask.any():
                break
            sub = b.filter(pa.array(mask))
            sn = n_np[mask]
            parts.append(pa.table({
                id_col: pc.cast(sub[id_col], pa.int64()),
                "chunk_id": pa.array(np.full(len(sn), j, dtype="int64")),
                "begin_at": pa.array(np.full(len(sn), start, dtype="int64")),
                "end_at": pa.array(np.minimum(start + size, sn)),
                "chunk": pc.cast(pc.utf8_slice_codeunits(
                    sub[text_col], start, start + size), pa.string()),
            }))
            j += 1
        if not parts:
            return empty
        return pa.concat_tables(parts).combine_chunks()

    return ds.map_batches(chunks, batch_format="pyarrow")
