"""Distributed global prefix sum (scan) and token-budget sequence packing.

Neither the reference (single-pass Python iterators, SURVEY §2.10: "no
windows") nor Ray Data ships an ordered global cumulative sum; training-data
pipelines need one to pack documents into fixed-token-budget training
sequences reproducibly. The classic two-pass scan maps cleanly onto Ray
Data:

1. rows partition into CONTIGUOUS ranges of the order key (range id =
   ``(key - min) // width`` — a driver-safe ``min``/``max`` pair is the only
   global state); one cheap aggregation yields each range's total, and the
   driver exclusive-scans those R totals into per-range offsets (R values,
   broadcast back — never the data);
2. each range sorts locally and cumulative-sums its own rows on top of its
   offset — one bucketed shuffle, all per-row work vectorized numpy.

The result equals ``SUM(value) OVER (ORDER BY key ROWS UNBOUNDED PRECEDING)``
bit-for-bit, which keeps the whole construction DuckDB-differential.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def global_cumsum(
    ds: ray.data.Dataset,
    order_column: str,
    value_column: str,
    out_column: str = "cumsum",
    num_ranges: int = 64,
) -> ray.data.Dataset:
    """Exact inclusive prefix sum of ``value_column`` in ``order_column``
    order (int64 keys, unique per row, non-null — nulls raise). Output: input
    columns + ``out_column``.

    The input executes ONCE: the scan needs three downstream consumers
    (extent, per-range totals, the final per-range cumsum), so ``ds``
    materializes to object-store blocks up front instead of re-running its
    upstream pipeline per consumer (the diamond-recompute pitfall). Callers
    should project to the minimal columns first — the materialized footprint
    is (key, value, carried columns), spillable.
    """
    ds = ds.materialize()

    # pass 0: key extent (two scalars on the driver — never the data)
    from ray.data.aggregate import Max, Min

    extent = ds.aggregate(Min(order_column), Max(order_column))
    lo, hi = extent[f"min({order_column})"], extent[f"max({order_column})"]
    if lo is None or hi is None:
        # zero rows (or an all-null key column, equally unscannable): return
        # an empty dataset that still carries the output schema. A fully
        # empty input may have lost its schema entirely (Ray keeps none for
        # zero-row map outputs) — fall back to the documented int64 contract
        # for the key/value columns.
        base = ds.schema()
        if base is not None and getattr(base, "names", None):
            cols = {n: pa.array([], t) for n, t in zip(base.names, base.types)}
        else:
            cols = {
                order_column: pa.array([], pa.int64()),
                value_column: pa.array([], pa.int64()),
            }
        cols[out_column] = pa.array([], pa.int64())
        return ray.data.from_arrow(pa.table(cols))

    width = max(1, (int(hi) - int(lo) + num_ranges) // num_ranges)

    def tag(batch: pa.Table) -> pa.Table:
        if batch[order_column].null_count:
            raise ValueError(f"global_cumsum: null {order_column!r} keys are not orderable")
        rng = pc.divide(
            pc.subtract(batch[order_column], pa.scalar(int(lo), batch[order_column].type)),
            pa.scalar(width, pa.int64()),
        )
        return batch.append_column("__range", pc.cast(rng, pa.int64()))

    tagged = ds.map_batches(tag, batch_format="pyarrow", batch_size=None)

    # pass 1: per-range totals → driver exclusive scan (≤ num_ranges rows)
    totals = {
        r["__range"]: r[f"sum({value_column})"]
        for r in tagged.groupby("__range").sum(value_column).take_all()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for r in sorted(totals):
        offsets[r] = acc
        acc += int(totals[r])

    # pass 2: one range = one group; sort + vectorized cumsum + offset
    def scan_range(g: pa.Table) -> pa.Table:
        rid = g["__range"][0].as_py()
        t = g.sort_by([(order_column, "ascending")])
        vals = t[value_column].to_numpy(zero_copy_only=False).astype(np.int64)
        run = np.cumsum(vals) + offsets.get(rid, 0)
        return t.drop_columns(["__range"]).append_column(
            out_column, pa.array(run, pa.int64())
        )

    return tagged.groupby("__range").map_groups(scan_range, batch_format="pyarrow")


def pack_by_token_budget(
    ds: ray.data.Dataset,
    order_column: str,
    tokens_column: str,
    budget: int,
    num_ranges: int = 64,
) -> ray.data.Dataset:
    """Assign each document to a training-sequence bin by cumulative token
    count in ``order_column`` order: ``bin = exclusive_prefix // budget`` —
    the deterministic, coordination-free packing a reproducible data pipeline
    needs (any worker recomputes the same assignment; equals the SQL window
    ``floor(lag-cumsum / budget)``). Documents longer than ``budget`` occupy
    their own bin(s) rather than being dropped. Output: ``(order_column,
    tokens_column, seq_bin)``."""
    with_sum = global_cumsum(ds, order_column, tokens_column, "__cum", num_ranges)

    def to_bin(batch: pa.Table) -> pa.Table:
        cum = batch["__cum"].to_numpy(zero_copy_only=False)
        toks = batch[tokens_column].to_numpy(zero_copy_only=False)
        bins = (cum - toks) // budget
        return pa.table(
            {
                order_column: batch[order_column],
                tokens_column: batch[tokens_column],
                "seq_bin": pa.array(bins.astype(np.int64), pa.int64()),
            }
        )

    return with_sum.map_batches(to_bin, batch_format="pyarrow")
