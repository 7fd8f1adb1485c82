"""Driver-style correctness gate run locally at sf0.001: every query with an
oracle must match DuckDB on row count, column names and values (order- and
column-order-insensitive); oracle-less queries must at least run and return a
stable schema."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF_DIR = os.environ.get("GRAFT_TEST_SF", "/root/testdata/sf0.001")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _to_pandas(result) -> pd.DataFrame:
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


@pytest.fixture(scope="module")
def contract(ray_session):
    import importlib
    import sys

    sys.path.insert(0, "/root/repo")
    mod = importlib.import_module("__ray_entry__")
    return mod


def test_entry_smoke(ray_session, contract):
    result = contract.entry()
    df = _to_pandas(result)
    assert len(df) > 0
    assert {"conv_id", "turn_idx", "extracted_text"} <= set(df.columns)


def test_all_queries_run_and_oracles_match(ray_session, contract, con):
    qs = contract.queries()
    oracles = contract.oracle_sql()
    assert set(oracles) <= set(qs)
    failures = []
    for name, fn in qs.items():
        got = _to_pandas(fn(SF_DIR))
        assert isinstance(got, pd.DataFrame), name
        if name not in oracles:
            continue  # rows-only queries: ran without raising
        exp = con.sql(oracles[name]).df()
        g, e = _canon(got), _canon(exp)
        if list(g.columns) != list(e.columns):
            failures.append((name, f"columns {list(g.columns)} != {list(e.columns)}"))
            continue
        if len(g) != len(e):
            failures.append((name, f"rows {len(g)} != {len(e)}"))
            continue
        try:
            pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=False, atol=1e-6)
        except AssertionError as err:
            failures.append((name, str(err).split("\n")[0]))
    assert not failures, failures
