#!/usr/bin/env python
"""Driver-gate replica: run every queries() entry and compare against its
oracle_sql() through DuckDB, exactly like the external correctness driver.

    python scripts/oracle_check.py                      # sf0.001 (~2 min)
    SF=/root/testdata/sf0.01 python scripts/oracle_check.py   # gate scale

Prints one OK/FAIL line per oracled query and DONE at the end. Owns its own
Ray session (4 CPUs) — run ONE at a time on this host.
"""

import importlib
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

import ray

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _to_pandas(r):
    import ray.data as rd

    if isinstance(r, rd.Dataset):
        return r.to_pandas()
    if isinstance(r, pa.Table):
        return r.to_pandas()
    return r


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    sf = os.environ.get("SF", "/root/testdata/sf0.001")
    ray.init(address="local", num_cpus=int(os.environ.get("CPUS", "4")),
             include_dashboard=False, logging_level="ERROR")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    mod = importlib.import_module("__ray_entry__")
    qs, oracles = mod.queries(), mod.oracle_sql()
    only = os.environ.get("ONLY")
    if only:
        keep = set(only.split(","))
        qs = {k: v for k, v in qs.items() if k in keep}
    failures = 0
    for name, fn in qs.items():
        t0 = time.time()
        got = _canon(_to_pandas(fn(sf)))
        t1 = time.time()
        if name not in oracles:
            print(f"{name}: rows-only ({len(got)} rows, ray {t1-t0:.1f}s)", flush=True)
            continue
        exp = _canon(con.sql(oracles[name]).df())
        status = "OK"
        if list(got.columns) != list(exp.columns):
            status = f"FAIL COLS {list(got.columns)} vs {list(exp.columns)}"
        elif len(got) != len(exp):
            status = f"FAIL ROWS {len(got)} vs {len(exp)}"
        else:
            try:
                pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                              check_exact=False, atol=1e-6)
            except AssertionError as e:
                status = "FAIL VALUES " + str(e).split("\n")[0]
        if status != "OK":
            failures += 1
        print(f"{name}: {status}  (ray {t1-t0:.1f}s, sql {time.time()-t1:.1f}s)", flush=True)
    ray.shutdown()
    print("DONE", "failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
