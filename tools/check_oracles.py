"""Local stand-in for the driver's correctness gate: run every
queries() entry and its oracle_sql() twin over one sf dir, compare
row count, schema and order-insensitive values. Usage:

    python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        res = res.to_pandas()
    elif isinstance(res, pa.Table):
        res = res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main():
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as e:
            failures.append(name)
            print(f"[{name}] RAY ERROR: {type(e).__name__}: {str(e)[:200]}")
            continue
        dt = time.perf_counter() - t0
        sql = oracles.get(name)
        if sql is None:
            print(f"[{name}] rows-only: {len(got)} rows in {dt:.1f}s")
            continue
        try:
            exp = canon(con.sql(sql).df())
        except Exception as e:
            failures.append(name)
            print(f"[{name}] ORACLE SQL ERROR: {str(e)[:200]}")
            continue
        ok_rows = len(got) == len(exp)
        ok_cols = list(got.columns) == list(exp.columns)
        ok_vals = False
        if ok_rows and ok_cols:
            try:
                pd.testing.assert_frame_equal(got, exp, check_dtype=True, check_exact=True)
                ok_vals = True
            except AssertionError as e:
                msg = str(e).split("\n")[0]
        ok_types = list(map(str, got.dtypes)) == list(map(str, exp.dtypes))
        status = "OK" if (ok_rows and ok_cols and ok_vals and ok_types) else "MISMATCH"
        if not ok_types:
            print(f"    dtype mismatch: got {list(map(str, got.dtypes))} exp {list(map(str, exp.dtypes))}")
        if status != "OK":
            failures.append(name)
        print(
            f"[{name}] {status}: rows {len(got)}/{len(exp)} cols {list(got.columns)}"
            f" vs {list(exp.columns)} in {dt:.1f}s"
        )
        if status != "OK" and ok_rows and ok_cols:
            diff = (got != exp)
            bad_cols = [c for c in got.columns if diff[c].any()]
            print(f"    value mismatch in {bad_cols}; first rows:")
            for c in bad_cols[:2]:
                i = diff[c].idxmax()
                print(f"    {c}[{i}]: got={got[c][i]!r} exp={exp[c][i]!r}")
    ray.shutdown()
    print("FAILURES:", failures if failures else "none")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
