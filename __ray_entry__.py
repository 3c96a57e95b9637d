"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash ->
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: neither
this module nor the library calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship extraction pipeline (detect -> recognize -> merge) over
    pages synthesized from /root/testdata/sf0.001 documents."""
    from rust_paddle_ocr_ray.pipelines.catalog import q23_extract

    return q23_extract("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """The curated 50-entry correctness gate: every operator family from
    the 101-query catalog earns a driver row — 35 queries under their
    catalog names plus 15 melted suite composites (g01-g15) folding the
    relational/statistics warm-ups (pipelines/gate.py documents the
    membership and the engine-identical melt).  The full catalog stays
    individually checkable via ``tools/check_queries.py --full`` and is
    what ``bench.py`` measures."""
    from rust_paddle_ocr_ray.pipelines.gate import GATE_QUERIES

    return {name: fn for name, (fn, _sql) in GATE_QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins with identical column names for every gate entry;
    composite twins are the UNION ALL of their members' melted twins,
    generated from the same declarative spec as the Ray-side melt."""
    from rust_paddle_ocr_ray.pipelines.gate import GATE_QUERIES

    return {name: sql for name, (_fn, sql) in GATE_QUERIES.items() if sql is not None}
