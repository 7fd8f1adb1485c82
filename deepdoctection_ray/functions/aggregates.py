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


def grouped_int_sums(
    ds: ray.data.Dataset,
    keys: Sequence[str],
    int_columns: Sequence[str],
    count_alias: str | None = "n",
    as_float: bool = True,
) -> ray.data.Dataset:
    """EXACT grouped sums for integer-scaled money columns.

    Float partial sums accumulate error that can flip a rounded digit at large
    scale factors; instead the caller pre-scales money to int64 units (cents /
    micro-units), per-batch ``pyarrow`` int sums are exact, and the final
    combine runs in Python arbitrary-precision ints — immune to both float
    error and int64 overflow at any corpus size. Matches a DuckDB oracle that
    sums ``BIGINT`` (HUGEINT accumulator) bit-for-bit.

    Output: ``keys + [f"sum_{c}" (float64 = exact int, converted once)] +
    [count_alias]``; callers divide by the scale to get money doubles — the
    single int→double conversion mirrors DuckDB's ``sum_hugeint / scale``.
    ``as_float=False`` keeps sums as int64 (for per-key intermediates feeding
    a further exact aggregation — caller guarantees no per-key overflow).
    """
    keys = list(keys)
    int_columns = list(int_columns)

    def partial(batch: pa.Table) -> pa.Table:
        aggs = [(c, "sum") for c in int_columns]
        if count_alias:
            aggs.append(([], "count_all"))
        t = batch.group_by(keys).aggregate(aggs)
        rename = {f"{c}_sum": f"sum_{c}" for c in int_columns}
        if count_alias:
            rename["count_all"] = count_alias
        cols = {rename.get(n, n): t[n] for n in t.column_names}
        names = keys + [f"sum_{c}" for c in int_columns] + ([count_alias] if count_alias else [])
        return pa.table({n: cols[n] for n in names})

    def combine(g: pa.Table) -> pa.Table:
        out = {k: [g[k][0].as_py()] for k in keys}
        for c in int_columns:
            total = sum(g[f"sum_{c}"].to_pylist())
            out[f"sum_{c}"] = (
                pa.array([float(total)], pa.float64())
                if as_float
                else pa.array([total], pa.int64())
            )
        if count_alias:
            out[count_alias] = pa.array([sum(g[count_alias].to_pylist())], pa.int64())
        return pa.table(out)

    return ds.map_batches(partial, batch_format="pyarrow").groupby(keys).map_groups(
        combine, batch_format="pyarrow"
    )
