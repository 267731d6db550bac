"""Local stand-in for the driver's correctness gate: run every
queries() entry at a given sf and compare to oracle_sql() via DuckDB
(row count + column names/dtypes + order-insensitive value comparison).

Usage: python scripts/check_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    # mirror the driver's gate faithfully: it runs every query in ONE
    # session where the flagship queries flip the context to
    # HASH_SHUFFLE first, so all later queries run under that strategy.
    # A selective run here would otherwise skip the flip and miss
    # strategy-sensitive bugs (a shipping_priority index-alignment bug
    # passed the default-strategy gate and failed under hash shuffle).
    from ocr_corrector_ray.pipelines.correct import enable_hash_shuffle

    enable_hash_shuffle()

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    queries = e.queries()
    oracles = e.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"[ERR ] {name}: {type(ex).__name__}: {ex}")
            failures.append(name)
            continue
        wall = time.perf_counter() - t0
        if name not in oracles:
            print(f"[rows] {name}: {len(got)} rows, cols={list(got.columns)} ({wall:.1f}s)")
            continue
        exp = con.execute(oracles[name]).df()
        g, x = normalize(got), normalize(exp)
        status = "OK  "
        detail = ""
        if list(g.columns) != list(x.columns):
            status, detail = "FAIL", f"cols {list(g.columns)} vs {list(x.columns)}"
        elif len(g) != len(x):
            status, detail = "FAIL", f"rows {len(g)} vs {len(x)}"
        else:
            try:
                pd.testing.assert_frame_equal(g, x, check_dtype=False, check_exact=True)
            except AssertionError as ex:
                status, detail = "FAIL", str(ex).split("\n")[0]
                # show first differing rows
                neq = (g != x).any(axis=1)
                detail += f" | first diff:\n{g[neq].head(3)}\nvs\n{x[neq].head(3)}"
        if status == "FAIL":
            failures.append(name)
        print(f"[{status}] {name}: {len(g)} rows ({wall:.1f}s) {detail}")

    print("FAILURES:", failures or "none")
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
