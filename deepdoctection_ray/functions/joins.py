"""Join helpers for Ray Data pipelines.

The reference's only cross-record join is the in-memory COCO hash join
(``custom_serialize.py:349-375``); at engine level we provide the two
scale-correct shapes:

- broadcast hash join: the small side goes to the object store ONCE
  (``ray.put``), each actor materializes the lookup dict in ``__init__`` and
  maps rows per batch — no shuffle at all;
- semi/anti join: broadcast the key set and filter inside ``map_batches``.

Both-sides-large joins should bucket by key hash and join per bucket (see
``stages/dedup.py`` for the bucketed-groupby shape).
"""

from __future__ import annotations

from typing import Mapping

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def broadcast_join(
    ds: ray.data.Dataset,
    small: Mapping,
    key_column: str,
    value_columns: dict[str, pa.DataType],
    how: str = "inner",
) -> ray.data.Dataset:
    """Inner/left join of ``ds`` against a driver-side mapping
    ``key -> {col: value}``; the mapping is shipped once via ``ray.put``."""
    assert how in ("inner", "left")
    ref = ray.put(dict(small))

    class Join:
        def __init__(self) -> None:
            self._lookup = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            keys = batch[key_column].to_pylist()
            hits = [self._lookup.get(k) for k in keys]
            if how == "inner":
                mask = pa.array([h is not None for h in hits])
                batch = batch.filter(mask)
                hits = [h for h in hits if h is not None]
            for col, typ in value_columns.items():
                batch = batch.append_column(
                    col, pa.array([h[col] if h else None for h in hits], typ)
                )
            return batch

    return ds.map_batches(Join, batch_format="pyarrow", concurrency=(1, 4))


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key_column: str,
    ts_column: str,
    right_value_columns: list[str],
    suffix: str = "_right",
) -> ray.data.Dataset:
    """Backward as-of join: for each left row, the latest right row of the
    same key with ``right.ts <= left.ts``.

    The two sides are co-partitioned by one ``groupby(key)`` (a ``side``
    column keeps them apart inside the group) and matched with
    ``pandas.merge_asof`` per key — the guide's bucketed merge_asof shape.
    Rows with no earlier right match keep nulls (left join semantics).
    """
    import numpy as np
    import pandas as pd

    left_cols = left.schema().names
    l = left.add_column("__side", lambda df: pd.Series(["l"] * len(df)), batch_format="pandas")
    keep = [key_column, ts_column] + right_value_columns
    r = right.select_columns(keep).add_column(
        "__side", lambda df: pd.Series(["r"] * len(df)), batch_format="pandas"
    )
    both = l.union(r)

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["__side"] == "l"].drop(columns=["__side"]).sort_values(ts_column, kind="stable")
        rg = g[g["__side"] == "r"][keep].sort_values(ts_column, kind="stable")
        if lg.empty:
            return pd.DataFrame()
        lg = lg[[c for c in lg.columns if c in left_cols]]
        merged = pd.merge_asof(
            lg,
            rg.rename(columns={c: c + suffix for c in right_value_columns + [ts_column]}),
            left_on=ts_column,
            right_on=ts_column + suffix,
            left_by=key_column,
            right_by=key_column,
            direction="backward",
        )
        return merged

    return both.groupby(key_column).map_groups(per_key, batch_format="pandas")


def semi_join(ds: ray.data.Dataset, keys, key_column: str, anti: bool = False) -> ray.data.Dataset:
    """Keep (or with ``anti=True`` drop) rows whose key is in the broadcast set."""
    key_array = pa.array(sorted(set(keys)))

    def f(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch[key_column], value_set=key_array)
        if anti:
            mask = pc.invert(mask)
        return batch.filter(mask)

    return ds.map_batches(f, batch_format="pyarrow")
