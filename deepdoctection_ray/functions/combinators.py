"""Stream-combinator parity (SURVEY.md §2.2) on ``ray.data.Dataset``.

Each function documents which reference combinator it replaces
(``dd_core/src/dd_core/dataflow/common.py`` / ``custom.py`` / ``serialize.py``).
The bodies are deliberately thin — the point is that Ray Data already HAS
these semantics; per-row python callbacks are only used where the reference's
contract is inherently per-record (map-with-drop), and every hot-path caller
should use ``map_batches`` directly instead.
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, Sequence

import ray.data


def map_data(ds: ray.data.Dataset, fn: Callable[[dict], dict | None]) -> ray.data.Dataset:
    """``MapData`` (``common.py:100-131``): map a record, drop on ``None``
    (map + filter fused)."""

    def batched(rows: dict[str, Any]) -> list[dict]:
        import pandas as pd

        out = []
        for row in pd.DataFrame(rows).to_dict("records"):
            mapped = fn(row)
            if mapped is not None:
                out.append(mapped)
        import pyarrow as pa

        return pa.Table.from_pylist(out) if out else pa.Table.from_pylist([])

    return ds.map_batches(batched, batch_format="numpy")


def map_data_component(
    ds: ray.data.Dataset, fn: Callable[[Any], Any], column: str
) -> ray.data.Dataset:
    """``MapDataComponent`` (``common.py:134-170``): map one field of a record."""
    return ds.add_column(column, lambda df: df[column].map(fn), batch_format="pandas")


def flatten_data(ds: ray.data.Dataset, fn: Callable[[dict], Iterable[dict]]) -> ray.data.Dataset:
    """``FlattenData`` (``common.py:77-97``): one record → many."""
    return ds.flat_map(fn)


def concat_data(*datasets: ray.data.Dataset) -> ray.data.Dataset:
    """``ConcatData`` (``common.py:217-252``): sequential concatenation."""
    out = datasets[0]
    for d in datasets[1:]:
        out = out.union(d)
    return out


def join_data(ds1: ray.data.Dataset, ds2: ray.data.Dataset) -> ray.data.Dataset:
    """``JoinData`` (``common.py:255-313``): positional zip, merged columns."""
    return ds1.zip(ds2)


def batch_data(ds: ray.data.Dataset, batch_size: int) -> ray.data.Dataset:
    """``BatchData`` (``common.py:316-366``): N records → one list record.
    In Ray Data batching is implicit in ``map_batches(batch_size=N)``; this
    materializes the grouping as ``pa.list_`` columns for API parity."""
    import pyarrow as pa

    def to_lists(batch: pa.Table) -> pa.Table:
        return pa.table(
            {name: pa.array([batch[name].to_pylist()]) for name in batch.column_names}
        )

    return ds.map_batches(to_lists, batch_format="pyarrow", batch_size=batch_size)


def repeated_data(ds: ray.data.Dataset, num: int) -> ray.data.Dataset:
    """``RepeatedData`` (``common.py:173-214``): repeat the stream N times.
    (Epoch loops should iterate the Dataset driver-side instead.)"""
    return concat_data(*([ds] * num))


def cache_data(ds: ray.data.Dataset) -> ray.data.Dataset:
    """``CacheData`` (``custom.py:38-97``): materialize once, serve from cache."""
    return ds.materialize()


def from_list(
    items: Sequence[dict],
    max_datapoints: int | None = None,
    shuffle: bool = False,
    seed: int = 42,
) -> ray.data.Dataset:
    """``CustomDataFromList`` (``custom.py:101-202``): list → stream with
    max_datapoints and deterministic shuffle."""
    ds = ray.data.from_items(list(items))
    if shuffle:
        ds = ds.random_shuffle(seed=seed)
    if max_datapoints is not None:
        ds = ds.limit(max_datapoints)
    return ds


def fake_data(n: int, row_builder: Callable[[int], dict]) -> ray.data.Dataset:
    """``FakeData`` (``serialize.py:84``): synthetic records by index."""
    import pyarrow as pa

    def build(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pylist([row_builder(int(i)) for i in batch["id"].to_pylist()])

    return ray.data.range(n).map_batches(build, batch_format="pyarrow")
