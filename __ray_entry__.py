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
    """One entry per implemented operator/pipeline from SURVEY.md §2 plus
    the training-data operator family (dedup / similarity / text
    analysis / multimodal plumbing)."""
    from rust_paddle_ocr_ray.pipelines.catalog import QUERIES

    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins with identical column names; non-SQL-expressible ops
    (extraction pipeline, MinHash/SimHash/LSH) are omitted -> rows-only
    check (their rigor lives in tests/golden + unit tests)."""
    from rust_paddle_ocr_ray.pipelines.catalog import QUERIES

    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
