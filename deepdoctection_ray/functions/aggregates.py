"""Pre-aggregated grouped sums: combine inside map_batches, shuffle partials.

A bare ``groupby(key).aggregate(...)`` shuffles every row; this helper runs
``pyarrow.Table.group_by`` per batch first (C++ hash aggregation), so the wide
exchange only carries one row per (key, batch) — the combiner pattern the
100-TB target requires.
"""

from __future__ import annotations

from typing import Sequence

import pyarrow as pa

import ray.data
from ray.data.aggregate import Sum


def grouped_sums(
    ds: ray.data.Dataset,
    keys: Sequence[str],
    sum_columns: Sequence[str],
    count_alias: str | None = "n",
) -> ray.data.Dataset:
    """Grouped sums (+ row count) with per-batch partial aggregation.

    Result columns: ``keys + [f"sum_{c}" for c in sum_columns] + [count_alias]``.
    """
    keys = list(keys)
    sum_columns = list(sum_columns)

    def partial(batch: pa.Table) -> pa.Table:
        aggs = [(c, "sum") for c in sum_columns]
        if count_alias:
            aggs.append(([], "count_all"))
        t = batch.group_by(keys).aggregate(aggs)
        names = list(keys) + [f"sum_{c}" for c in sum_columns]
        if count_alias:
            names.append(count_alias)
        # pa group_by output column order varies across versions — map by name
        rename = {f"{c}_sum": f"sum_{c}" for c in sum_columns}
        if count_alias:
            rename["count_all"] = count_alias
        cols = {}
        for name in t.column_names:
            cols[rename.get(name, name)] = t[name]
        return pa.table({n: cols[n] for n in names})

    partials = ds.map_batches(partial, batch_format="pyarrow")
    aggs = [Sum(f"sum_{c}", alias_name=f"sum_{c}") for c in sum_columns]
    if count_alias:
        aggs.append(Sum(count_alias, alias_name=count_alias))
    return partials.groupby(keys).aggregate(*aggs)
