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
import pyarrow.compute as pc

import ray.data

BUCKET_COL = "__bucket"

# auto-sizing rule: one bucket per ~64 MiB of input so a whole bucket fits an
# aggregator's heap with headroom, floored at 16 (parallelism on small data)
# and capped at 4096 (beyond that the per-bucket scheduling overhead wins)
AUTO_BUCKET_BYTES = 64 << 20
AUTO_BUCKET_MIN = 16
AUTO_BUCKET_MAX = 4096


def auto_num_buckets(
    input_bytes: int,
    target_bucket_bytes: int = AUTO_BUCKET_BYTES,
    lo: int = AUTO_BUCKET_MIN,
    hi: int = AUTO_BUCKET_MAX,
) -> int:
    """Size ``num_buckets`` from the input's byte size.

    The module docstring's 100-TB obligation made executable: callers that
    know their input size (a parquet footer, ``ds.size_bytes()`` on a
    materialized set) derive the bucket count instead of hardcoding one.
    ``clamp(bytes // 64 MiB, 16, 4096)`` — at 100 TB that saturates to 4096
    buckets of ~25 GB each, which a 64-core aggregator node absorbs as a
    stream; at test scale it floors to 16 so tiny corpora still parallelize.
    """
    return max(lo, min(hi, int(input_bytes) // int(target_bucket_bytes)))

# 64-bit FNV prime (odd → invertible mod 2^64) and its modular inverse: the
# string hash is a polynomial hash computed with ONE cumsum/cumprod over the
# flat byte buffer — no per-row Python, no pandas conversion
_POLY_P = np.uint64(0x100000001B3)
_POLY_PINV = np.uint64(pow(0x100000001B3, -1, 1 << 64))
_COMBINE_C = np.uint64(0x9E3779B97F4A7C15)
_NULL_H = np.uint64(0xA0761D6478BD642F)


def _mix64(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (vectorized, wraps mod 2^64)."""
    h = h.astype(np.uint64, copy=True)
    h ^= h >> np.uint64(30)
    h *= np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> np.uint64(27)
    h *= np.uint64(0x94D049BB133111EB)
    h ^= h >> np.uint64(31)
    return h


def _hash_bytes_array(arr: pa.Array) -> np.ndarray:
    """Content hash of a ``large_string``/``large_binary`` array.

    ``h_i = P^len_i * Σ_j byte_ij * P^-j  (mod 2^64)`` — position-independent
    by construction (the prefix sums cancel the global offset), so equal
    content always hashes equal regardless of where the row sits in the
    buffer. O(total_bytes) numpy, zero copies beyond the uint8→uint64 widen.
    """
    n = len(arr)
    if n == 0:
        return np.empty(0, np.uint64)
    bufs = arr.buffers()
    offs = np.frombuffer(bufs[1], np.int64)[arr.offset : arr.offset + n + 1]
    data = np.frombuffer(bufs[2], np.uint8) if bufs[2] is not None else np.empty(0, np.uint8)
    seg = data[offs[0] : offs[-1]].astype(np.uint64)
    rel = (offs - offs[0]).astype(np.int64)
    m = seg.shape[0]
    pw = np.empty(m + 1, np.uint64)
    pw[0] = 1
    ipw = np.empty(m + 1, np.uint64)
    ipw[0] = 1
    if m:
        np.cumprod(np.full(m, _POLY_P, np.uint64), out=pw[1:])
        np.cumprod(np.full(m, _POLY_PINV, np.uint64), out=ipw[1:])
    pre = np.empty(m + 1, np.uint64)
    pre[0] = 0
    if m:
        np.cumsum(seg * ipw[:-1], out=pre[1:])
    lens = (rel[1:] - rel[:-1]).astype(np.uint64)
    return _mix64((pre[rel[1:]] - pre[rel[:-1]]) * pw[rel[1:]] ^ _mix64(lens))


def _hash_column(col: "pa.ChunkedArray | pa.Array") -> np.ndarray:
    """Deterministic vectorized uint64 hash of one Arrow column."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if pa.types.is_dictionary(t):
        col = pc.cast(col, t.value_type)
        t = col.type
    null_mask: np.ndarray | None = None
    if col.null_count:
        null_mask = pc.is_null(col).to_numpy(zero_copy_only=False)
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        h = _hash_bytes_array(pc.cast(pc.fill_null(col, ""), pa.large_string()))
    elif pa.types.is_binary(t) or pa.types.is_large_binary(t) or pa.types.is_fixed_size_binary(t):
        h = _hash_bytes_array(pc.cast(pc.fill_null(col, b""), pa.large_binary()))
    elif pa.types.is_floating(t):
        v = pc.fill_null(pc.cast(col, pa.float64()), 0.0).to_numpy(zero_copy_only=False)
        h = _mix64(v.view(np.uint64))
    else:
        # ints / bool / temporal / decimal-free keys: widen to int64 bits
        v = pc.fill_null(pc.cast(col, pa.int64()), 0).to_numpy(zero_copy_only=False)
        h = _mix64(v.astype(np.int64).view(np.uint64))
    if null_mask is not None:
        h[null_mask] = _NULL_H
    return h


def hash_rows(batch: pa.Table, key_cols: Sequence[str]) -> np.ndarray:
    """Deterministic cross-process uint64 row hash over ``key_cols`` —
    pure Arrow/numpy (no pandas conversion on the hot generic path)."""
    h = np.full(batch.num_rows, _COMBINE_C, np.uint64)
    for name in key_cols:
        ch = _hash_column(batch[name])
        # boost::hash_combine, vectorized mod-2^64
        h = h ^ (ch + _COMBINE_C + (h << np.uint64(6)) + (h >> np.uint64(2)))
    return _mix64(h)


def tag_buckets(batch: pa.Table, key_cols: Sequence[str], num_buckets: int) -> pa.Table:
    """Append a stable int64 bucket id for the key columns (vectorized
    Arrow/numpy hash; deterministic across processes — pinned by
    ``tests/test_stages_misc.py``)."""
    h = hash_rows(batch, list(key_cols)) % np.uint64(num_buckets)
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
