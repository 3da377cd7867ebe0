"""Self-check harness mirroring the driver's correctness gate: run every
queries() entry and its oracle_sql() side-by-side at a given sf and compare
row count + schema + order-insensitive values.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def to_pandas(res):
    import pandas as pd
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def canon(df):
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)
    return df


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    # point transcript-table oracles (er_clusters) at THIS sf, not the
    # driver's fixed 0.01
    import os
    import re

    m = re.search(r"sf([0-9.]+)", sf_dir)
    if m:
        os.environ["GRAFT_ORACLE_SF"] = m.group(1)

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import duckdb

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        ray_df = canon(to_pandas(fn(sf_dir)))
        t_ray = time.time() - t0
        if name not in oracles:
            print(f"{name:24s} rows={len(ray_df):7d}  (rows-only, no oracle)  {t_ray:.1f}s")
            continue
        t0 = time.time()
        ora_df = canon(con.sql(oracles[name]).df())
        t_ora = time.time() - t0
        ok_rows = len(ray_df) == len(ora_df)
        if len(ray_df) == 0 and len(ora_df) == 0 and not len(ray_df.columns):
            # Ray drops empty blocks in map_batches, so a 0-row result can
            # arrive schema-less — both sides empty IS a value match
            ray_df = ora_df.head(0).copy()
        ok_cols = list(ray_df.columns) == list(ora_df.columns)
        ok_vals = False
        ok_dtypes = True
        if ok_rows and ok_cols:
            a = ray_df.reset_index(drop=True)
            b = ora_df.reset_index(drop=True)
            # STRICT dtypes: the driver hashes values post-sort, and a
            # float64-vs-int64 divergence (e.g. DuckDB SUM(BIGINT)->HUGEINT
            # ->float64) breaks its hash even when values are equal. Never
            # coerce here, or this gate passes what the driver fails.
            bad = [c for c in a.columns if a[c].dtype != b[c].dtype]
            if bad:
                ok_dtypes = False
                print(f"  dtype mismatch (ray|oracle): "
                      f"{[(c, str(a[c].dtype), str(b[c].dtype)) for c in bad]}")
            else:
                try:
                    ok_vals = a.equals(b)
                except Exception:  # noqa: BLE001
                    ok_vals = False
        status = "PASS" if (ok_rows and ok_cols and ok_dtypes and ok_vals) else "FAIL"
        print(f"{name:24s} {status} rows={len(ray_df)}/{len(ora_df)} "
              f"cols={'ok' if ok_cols else (list(ray_df.columns), list(ora_df.columns))} "
              f"vals={'ok' if ok_vals else 'MISMATCH'}  ray={t_ray:.1f}s sql={t_ora:.1f}s")
        if status == "FAIL":
            failures.append(name)
            if ok_rows and ok_cols and ok_dtypes:
                a = ray_df.reset_index(drop=True)
                b = ora_df.reset_index(drop=True)
                neq = (a != b).any(axis=1)
                print("  first diffs (ray | oracle):")
                print(a[neq].head(3).to_string())
                print(b[neq].head(3).to_string())
    ray.shutdown()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("ALL OK")


if __name__ == "__main__":
    main()
