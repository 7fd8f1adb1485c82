"""Empty-input robustness: EVERY catalog query must run on zero-row tables.

At 100 TB, empty partitions are routine and a zero-row shard (a filtered
slice, a new tenant, a dry run) must not crash a pipeline. Ray 2.49 makes
this genuinely hard: ``groupby().aggregate()`` on a fully-empty input
returns a dataset with NO schema at all, and ``Dataset.join`` raises
``ArrowInvalid`` when a side is fully empty — even for two bare
``read_parquet`` reads of zero-row files with intact footer schemas. The
engine handles both via the seam scrubs (``drop_empty_blocks`` with
``anchor=``), lazy ``anchor_blocks`` unions, and O(1) parquet-metadata
guards at the query tops — this test pins the whole catalog against the
degenerate corpus.
"""

import os

import pyarrow.parquet as pq
import pytest

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    src = "/root/testdata/sf0.001"
    if not os.path.isdir(src):
        pytest.skip("no testdata")
    dst = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        tab = pq.read_table(os.path.join(src, f"{t}.parquet"))
        pq.write_table(tab.slice(0, 0), os.path.join(str(dst), f"{t}.parquet"))
    return str(dst)


def test_every_query_survives_empty_tables(ray_session, empty_sf):
    import pandas as pd
    import pyarrow as pa

    import ray.data as rd
    from deepdoctection_ray.queries import build_queries

    failures = []
    for name, fn in build_queries().items():
        try:
            r = fn(empty_sf)
            if isinstance(r, rd.Dataset):
                r.count()
            elif isinstance(r, pa.Table):
                r.num_rows
            else:
                assert isinstance(r, pd.DataFrame)
        except Exception as e:  # noqa: BLE001 - collect everything, fail once
            failures.append(f"{name}: {type(e).__name__}: {e}")
    assert not failures, "queries crashed on empty input:\n" + "\n".join(failures)
