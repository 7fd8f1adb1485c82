"""Distributed column profiler — corpus QA `describe` over any table.

For each requested column: row count, null count, EXACT distinct count,
lexicographic/numeric min and max, and mean (numeric columns). The shapes:

- **stats pass**: one streaming ``map_batches`` reduces every block to ONE
  typed partials row (count, nulls, min, max, sum per column); the merge is
  over ``n_blocks`` tiny rows. Nothing corpus-sized leaves the blocks.
- **distinct pass**: blocks emit their per-column UNIQUE values only
  (pre-aggregation: the exchange carries at most ``distinct_per_block``
  rows, not raw rows), hash-bucketed on (column, value) so every duplicate
  lands in one bucket; each bucket dedups vectorized and emits per-column
  partial counts; a tiny final sum yields exact distincts. For a unique-key
  column the exchange is corpus-sized by necessity (that is what exact
  distinct costs); swap in ``stages.sketches.approx_distinct`` when a ±2%
  estimate is acceptable at 100 TB.

The profile itself is n_columns rows — returned as a driver-side Arrow
table like the other scalar-ish results (quantiles, HLL).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.bucketed import bucketed_map_groups

__all__ = ["profile_table"]


def _is_numeric(t: pa.DataType) -> bool:
    return pa.types.is_integer(t) or pa.types.is_floating(t)


def profile_table(
    ds: ray.data.Dataset,
    columns: list[str] | None = None,
    num_buckets: int = 32,
    sketch: bool = False,
    sketch_k: int = 512,
) -> pa.Table:
    """Profile ``columns`` (default: all) of ``ds``.

    Returns columns ``(col_name, n_rows, n_nulls, n_distinct, min_s, max_s,
    mean)`` — min/max stringified for a uniform schema (int→str is
    injective, so SQL ``CAST(... AS VARCHAR)`` reproduces them), ``mean``
    NULL for non-numeric columns, distinct counts excluding nulls (SQL
    ``count(DISTINCT ...)`` semantics).

    ``sketch=True`` additionally carries ONE KLL quantile sketch per numeric
    column through the SAME partials pass (a fixed-size binary per batch,
    merged on the driver) and appends ``p50_est`` / ``p50_err_bound``
    columns — the 100-TB profiler shape, where the exact iterative-histogram
    quantile (``exact_quantiles``) would cost extra full passes per column.
    """
    schema = ds.schema()
    types = dict(zip(schema.names, schema.types))
    cols = list(columns) if columns is not None else list(schema.names)

    def partials(batch: pa.Table) -> pa.Table:
        out: dict[str, pa.Array] = {"n_rows": pa.array([len(batch)], pa.int64())}
        for c in cols:
            col = batch[c]
            out[f"nulls__{c}"] = pa.array([col.null_count], pa.int64())
            mm = pc.min_max(col)
            out[f"min__{c}"] = pa.array([mm["min"].as_py()], types[c])
            out[f"max__{c}"] = pa.array([mm["max"].as_py()], types[c])
            if _is_numeric(types[c]):
                s = pc.sum(col)
                out[f"sum__{c}"] = pa.array(
                    [s.as_py() if s.is_valid else 0], pa.float64()
                )
                if sketch:
                    from .sketches import KLLSketch

                    sk = KLLSketch(sketch_k)
                    sk.update(
                        pc.drop_null(col).to_numpy(zero_copy_only=False).astype(np.float64)
                    )
                    out[f"sk__{c}"] = pa.array([sk.to_bytes()], pa.binary())
        return pa.table(out)

    stats = ds.map_batches(partials, batch_format="pyarrow", batch_size=None)
    # n_blocks tiny rows; keep as Python values — a pandas round-trip would
    # coerce an int64 min/max to float64 whenever some block is all-null
    srows = stats.take_all()

    def explode_unique(batch: pa.Table) -> pa.Table:
        names, vals = [], []
        for c in cols:
            u = pc.drop_null(pc.unique(batch[c]))
            sv = pc.cast(u, pa.string())
            names.extend([c] * len(sv))
            vals.append(sv)
        flat = pa.concat_arrays([v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v for v in vals]) if vals else pa.array([], pa.string())
        return pa.table({"col": pa.array(names, pa.string()), "v": flat})

    def count_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g.drop_duplicates(["col", "v"])
        out = d.groupby("col", sort=False).size().reset_index(name="cnt")
        return out

    pairs = ds.map_batches(explode_unique, batch_format="pyarrow", batch_size=None)
    bucket_counts = bucketed_map_groups(
        pairs, ["col", "v"], count_bucket, num_buckets, batch_format="pandas"
    ).to_pandas()  # ≤ num_buckets × n_cols rows
    distinct = bucket_counts.groupby("col")["cnt"].sum() if len(bucket_counts) else pd.Series(dtype=np.int64)

    n_rows = sum(r["n_rows"] for r in srows)
    names, nulls_o, dist_o, min_o, max_o, mean_o = [], [], [], [], [], []
    for c in cols:
        names.append(c)
        nn = sum(r[f"nulls__{c}"] for r in srows)
        nulls_o.append(nn)
        dist_o.append(int(distinct.get(c, 0)))
        mins = [r[f"min__{c}"] for r in srows if r[f"min__{c}"] is not None]
        maxs = [r[f"max__{c}"] for r in srows if r[f"max__{c}"] is not None]
        min_o.append(str(min(mins)) if mins else None)
        max_o.append(str(max(maxs)) if maxs else None)
        if _is_numeric(types[c]) and n_rows - nn > 0:
            mean_o.append(round(sum(r[f"sum__{c}"] for r in srows) / (n_rows - nn), 6))
        else:
            mean_o.append(None)
    out_cols = {
        "col_name": pa.array(names, pa.string()),
        "n_rows": pa.array([n_rows] * len(cols), pa.int64()),
        "n_nulls": pa.array(nulls_o, pa.int64()),
        "n_distinct": pa.array(dist_o, pa.int64()),
        "min_s": pa.array(min_o, pa.string()),
        "max_s": pa.array(max_o, pa.string()),
        "mean": pa.array(mean_o, pa.float64()),
    }
    if sketch:
        from .sketches import KLLSketch

        p50, errs = [], []
        for c in cols:
            if _is_numeric(types[c]) and n_rows - nulls_o[names.index(c)] > 0:
                sk = KLLSketch(sketch_k)
                for r in srows:
                    sk.merge(KLLSketch.from_bytes(r[f"sk__{c}"]))
                p50.append(sk.quantile(0.5))
                errs.append(sk.err_bound)
            else:
                p50.append(None)
                errs.append(None)
        out_cols["p50_est"] = pa.array(p50, pa.float64())
        out_cols["p50_err_bound"] = pa.array(errs, pa.int64())
    return pa.table(out_cols)
