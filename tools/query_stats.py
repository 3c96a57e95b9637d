"""Per-query Ray Data stats dump — the profiling feedback loop the
brief's "read ds.stats() and iterate" instruction asks for:

    python tools/query_stats.py q23_extract [sf_dir] [num_cpus]

Runs one catalog query to completion (materialize) and prints the
executor's per-operator wall/cpu/rows/memory breakdown, so a slow stage
is attributable before optimizing it.  Owns its Ray session (tools are
scripts, not library code).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    num_cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    out = e.queries()[name](sf_dir)
    try:
        from ray.data import Dataset

        if isinstance(out, Dataset):
            out = out.materialize()
            print(out.stats())
        else:
            # driver-local result (pandas/pyarrow): nothing to profile
            print(f"{name} returned {type(out).__name__} with {len(out)} rows "
                  "(driver-local, no Dataset stats)")
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
