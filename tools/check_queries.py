"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry and its ``oracle_sql()`` twin at a given sf and
compare row-count + column names + sorted values.

    python tools/check_queries.py [sf_dir] [name ...]

``--full`` checks the complete 101-query catalog (catalog.QUERIES)
instead of the driver-facing curated 50-entry gate.
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    try:
        from ray.data import Dataset

        if isinstance(obj, Dataset):
            return obj.to_pandas()
    except ImportError:
        pass
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).astype("datetime64[us]")
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype(bool)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64").round(9)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> str:
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        return f"SCHEMA MISMATCH ray={sorted(ray_df.columns)} sql={sorted(sql_df.columns)}"
    if len(ray_df) != len(sql_df):
        return f"ROWCOUNT MISMATCH ray={len(ray_df)} sql={len(sql_df)}"
    a, b = normalize(ray_df), normalize(sql_df)
    if not a.equals(b):
        diff_cols = [c for c in a.columns if not a[c].equals(b[c])]
        for c in diff_cols:
            neq = a[c] != b[c]
            if pd.api.types.is_float_dtype(a[c]):
                neq = ~np.isclose(a[c], b[c], atol=1e-9, equal_nan=True)
            if neq.any():
                k = int(np.flatnonzero(neq.to_numpy())[0])
                return (f"VALUE MISMATCH col={c} row={k}: "
                        f"ray={a[c].iloc[k]!r} sql={b[c].iloc[k]!r}")
        return "OK (float-tolerance)"
    return "OK"


def _retarget_golden(sql: str, sf_dir: str) -> str | None:
    """Golden read_parquet twins are committed at the driver gate's
    sf0.01.  When checking another sf, point the twin at that sf's
    golden file (suffix = the sf_dir basename) if it exists; return
    None (skip, loudly) when it doesn't — a sf0.01 golden compared
    against sf0.1 output is a guaranteed false mismatch, not a check."""
    if "_sf0.01.parquet" not in sql:
        return sql
    tag = os.path.basename(os.path.normpath(sf_dir))
    if tag == "sf0.01":
        return sql
    out = sql.replace("_sf0.01.parquet", f"_{tag}.parquet")
    import re

    for path in re.findall(r"read_parquet\('([^']+)'\)", out):
        if not os.path.exists(path):
            return None
    return out


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--full"]
    full = "--full" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    if full:
        from rust_paddle_ocr_ray.pipelines.catalog import QUERIES

        qs = {n: f for n, (f, _s) in QUERIES.items()}
        oracles = {n: s for n, (_f, s) in QUERIES.items() if s is not None}
    else:
        import __ray_entry__ as e

        qs, oracles = e.queries(), e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as ex:  # noqa: BLE001
            print(f"{name:24s} RAY ERROR: {type(ex).__name__}: {ex}")
            failures += 1
            continue
        dt = time.time() - t0
        if name in oracles:
            sql = _retarget_golden(oracles[name], sf_dir)
            if sql is None:
                hint = ("check via tools/check_extraction_parity.py "
                        f"{sf_dir}"
                        if name.split("_")[0] in ("q23", "q24", "q30")
                        else "regenerate via tools/make_goldens.py "
                             f"--approx-sf {sf_dir}")
                print(f"{name:24s} {dt:6.1f}s  golden-pinned to sf0.01 "
                      f"(no golden at this sf; {hint})")
                continue
            try:
                sql_df = con.execute(sql).fetchdf()
            except Exception as ex:  # noqa: BLE001
                print(f"{name:24s} SQL ERROR: {ex}")
                failures += 1
                continue
            verdict = compare(name, ray_df, sql_df)
        else:
            verdict = f"rows-only ({len(ray_df)} rows)"
        status = "ok" if verdict.startswith(("OK", "rows-only")) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(f"{name:24s} {dt:6.1f}s  {verdict}")
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
