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


def semi_join(ds: ray.data.Dataset, keys, key_column: str, anti: bool = False) -> ray.data.Dataset:
    """Keep (or with ``anti=True`` drop) rows whose key is in the broadcast set."""
    key_array = pa.array(sorted(set(keys)))

    def f(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch[key_column], value_set=key_array)
        if anti:
            mask = pc.invert(mask)
        return batch.filter(mask)

    return ds.map_batches(f, batch_format="pyarrow")
