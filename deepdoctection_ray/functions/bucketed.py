"""Bucketed groupby — the engine's answer to the tiny-group explosion.

``groupby(key).map_groups(fn)`` schedules one Python call (plus a block
slice) per distinct key. That is ruinous when keys are mostly unique: exact
dedup over a clean corpus, per-conversation assembly at 10^9 conversations,
per-user sessionization, the per-key combine of a high-cardinality partial
aggregate. Instead, rows co-partition by ``hash(key) % num_buckets`` (still
ONE shuffle, but a bounded group count) and the caller's function receives a
whole bucket at once — per-key work becomes a vectorized in-bucket groupby
(``pyarrow.Table.group_by`` / pandas) instead of a Ray task per key.

The same shape powers the LSH dedup family (``stages/dedup.py``,
``_grouped_collisions``); this module is the generic engine surface used by
``grouped_int_sums``, ``dedup_exact``, ``assemble_conversations``,
``asof_join`` and sessionization.

Partitioning assumption (100-TB note): per-key state stays bounded by the
bucket, so ``num_buckets`` must scale with the corpus — size it so
``corpus / num_buckets`` fits an aggregator's heap, exactly like a shuffle
partition count. Keys never split across buckets (hash co-location), so the
per-key semantics are identical to the naive groupby.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

BUCKET_COL = "__bucket"


def tag_buckets(batch: pa.Table, key_cols: Sequence[str], num_buckets: int) -> pa.Table:
    """Append a stable int64 bucket id for the key columns (vectorized hash;
    deterministic across processes — pandas' fixed-key row hash)."""
    kdf = batch.select(list(key_cols)).to_pandas()
    h = pd.util.hash_pandas_object(kdf, index=False).to_numpy() % np.uint64(num_buckets)
    return batch.append_column(BUCKET_COL, pa.array(h.astype(np.int64), pa.int64()))


def bucketed_map_groups(
    ds: ray.data.Dataset,
    key_cols: Sequence[str],
    emit_bucket: Callable,
    num_buckets: int = 64,
    batch_format: str = "pyarrow",
    anchor: "pa.Table | pa.Schema | None" = None,
) -> ray.data.Dataset:
    """Run ``emit_bucket`` once per hash bucket instead of once per key.

    ``emit_bucket`` receives one whole bucket (``pa.Table`` or
    ``pd.DataFrame`` per ``batch_format``) WITHOUT the bucket column; all rows
    of any given key are guaranteed to be in the same bucket. Its result
    (Arrow table or DataFrame) is normalized to Arrow so empty outputs stay
    schema-stable where possible.
    """
    key_cols = list(key_cols)
    # batch_size=None: tag whole blocks — re-chunking into default 1024-row
    # batches immediately before the groupby exchange fragments the shuffle
    # input (the documented 8× extraction regression; CLAUDE.md invariant)
    tagged = ds.map_batches(
        lambda b: tag_buckets(b, key_cols, num_buckets),
        batch_format="pyarrow",
        batch_size=None,
    )

    if batch_format == "pyarrow":

        def run(g: pa.Table):
            out = emit_bucket(g.drop_columns([BUCKET_COL]))
            if isinstance(out, pd.DataFrame):
                out = pa.Table.from_pandas(out, preserve_index=False)
            return out

    else:

        def run(g: pd.DataFrame):
            out = emit_bucket(g.drop(columns=[BUCKET_COL]))
            if isinstance(out, pd.DataFrame):
                out = pa.Table.from_pandas(out, preserve_index=False)
            return out

    out = tagged.groupby(BUCKET_COL).map_groups(run, batch_format=batch_format)
    if anchor is not None:
        # empty-corpus schema guard: Ray's map_groups on zero rows yields a
        # schema-less dataset; one lazily-unioned typed empty block keeps the
        # documented columns visible to downstream joins / column access
        sch = anchor.schema if isinstance(anchor, pa.Table) else anchor
        out = out.union(ray.data.from_arrow(sch.empty_table()))
    return out
