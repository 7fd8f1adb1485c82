"""High-key-cardinality scaling evidence for the bucketed-groupby sites.

The round-2 audit flagged four per-key ``map_groups`` call sites as
scale-weak (one Python call per distinct key): ``grouped_int_sums``'s final
combine, ``dedup_exact``, ``assemble_conversations`` and sessionize/as-of.
All four now run on the bucketed pattern (``functions/bucketed.py``): runtime
must scale with ROW count and BUCKET count, not with key count.

This script times each operator on the same row count at low vs high key
cardinality (1000× more keys). A per-key implementation degrades by orders of
magnitude; the bucketed one stays within host noise. Output: one JSON line.

Run: ``python scripts/bench_cardinality.py`` (fresh Ray session, 32 CPUs by
default; ``RAY_GRAFT_CPUS`` overrides).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ROWS = 1_000_000
LOW_KEYS = 1_000
HIGH_KEYS = 500_000


def _consume(ds) -> int:
    n = 0
    for b in ds.iter_batches(batch_format="pyarrow"):
        n += b.num_rows
    return n


def _docs(n_rows: int, n_keys: int):
    """Documents table: text repeats every n_keys rows (dedup groups)."""
    import ray.data

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy()
        key = ids % n_keys
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array([f"document body text {k}" for k in key], pa.string()),
            }
        )

    return ray.data.range(n_rows).map_batches(gen, batch_format="pyarrow")


def _turns(n_rows: int, n_convs: int):
    import ray.data

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy()
        conv = ids % n_convs
        return pa.table(
            {
                "conv_id": pa.array([f"c{c:09d}" for c in conv], pa.string()),
                "turn_idx": pa.array((ids // n_convs).astype(np.int32), pa.int32()),
                "role": pa.array(np.where(ids % 2 == 0, "user", "assistant")),
                "extracted_text": pa.array([f"turn text {i}" for i in ids], pa.string()),
            }
        )

    return ray.data.range(n_rows).map_batches(gen, batch_format="pyarrow")


def _ledger(n_rows: int, n_keys: int):
    import ray.data

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy()
        return pa.table(
            {
                "k": pa.array(ids % n_keys, pa.int64()),
                "amount": pa.array((ids * 37 % 100_000).astype(np.int64), pa.int64()),
            }
        )

    return ray.data.range(n_rows).map_batches(gen, batch_format="pyarrow")


def _events(n_rows: int, n_users: int):
    import pandas as pd
    import ray.data

    def gen(batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy()
        ts = pd.Timestamp("2026-01-01").value + (ids * 61_000_000_000)  # 61 s apart
        return pa.table(
            {
                "user_id": pa.array(ids % n_users, pa.int64()),
                "event_id": pa.array(ids, pa.int64()),
                "ts": pa.array(pd.to_datetime(ts)),
            }
        )

    return ray.data.range(n_rows).map_batches(gen, batch_format="pyarrow")


def bench(name: str, fn, results: dict) -> None:
    t0 = time.perf_counter()
    rows = fn()
    dt = round(time.perf_counter() - t0, 3)
    results[name] = {"sec": dt, "rows_out": rows}
    print(f"  {name}: {dt}s ({rows} rows out)", file=sys.stderr)


def main() -> None:
    import ray

    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        include_dashboard=False,
        logging_level="ERROR",
    )
    import pandas as pd

    from deepdoctection_ray.functions.aggregates import grouped_int_sums
    from deepdoctection_ray.functions.bucketed import bucketed_map_groups
    from deepdoctection_ray.pipelines.extraction import assemble_conversations
    from deepdoctection_ray.stages.dedup import dedup_exact

    def sessions_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
        gaps = g["ts"].diff().dt.total_seconds()
        brk = (gaps > 1800) & g["user_id"].eq(g["user_id"].shift())
        res = (
            pd.DataFrame({"user_id": g["user_id"], "brk": brk})
            .groupby("user_id", sort=False)
            .agg(n_sessions=("brk", "sum"), n_events=("brk", "size"))
            .reset_index()
        )
        return res

    from deepdoctection_ray.stages.dedup import dedup_segments

    # exchange-bytes evidence for the dedup_segments pre-hash: the shuffle row
    # used to carry the full segment text as the key; it now carries a 32-char
    # md5. Measure the actual Arrow bytes of one representative explode output
    # both ways (25-word segments, the Lee-et-al-style paragraph window).
    from deepdoctection_ray.kernels.ids import md5_hex

    seg_texts = [
        " ".join(f"word{(i * 31 + j) % 997}" for j in range(25)) for i in range(10_000)
    ]
    ids64 = pa.array(np.arange(10_000, dtype=np.int64))
    idx64 = pa.array(np.zeros(10_000, dtype=np.int64))
    with_text = pa.table({"doc_id": ids64, "seg_idx": idx64, "seg": pa.array(seg_texts)})
    with_key = pa.table(
        {"doc_id": ids64, "seg_idx": idx64,
         "seg_key": pa.array([md5_hex(s) for s in seg_texts])}
    )
    exchange_bytes = {
        "text_key_bytes": with_text.nbytes,
        "md5_key_bytes": with_key.nbytes,
        "ratio": round(with_key.nbytes / with_text.nbytes, 3),
    }
    print(f"  segment exchange bytes: {exchange_bytes}", file=sys.stderr)

    results: dict = {}
    for label, keys in (("low", LOW_KEYS), ("high", HIGH_KEYS)):
        bench(f"dedup_exact_{label}", lambda k=keys: _consume(dedup_exact(_docs(N_ROWS, k))), results)
        bench(
            f"dedup_segments_{label}",
            lambda k=keys: _consume(
                dedup_segments(_docs(N_ROWS // 4, k), "text", "doc_id", window=20)
            ),
            results,
        )
        bench(
            f"assemble_{label}",
            lambda k=keys: _consume(assemble_conversations(_turns(N_ROWS, k))),
            results,
        )
        bench(
            f"grouped_int_sums_{label}",
            lambda k=keys: _consume(grouped_int_sums(_ledger(N_ROWS, k), ["k"], ["amount"])),
            results,
        )
        bench(
            f"sessionize_{label}",
            lambda k=keys: _consume(
                bucketed_map_groups(
                    _events(N_ROWS, k), ["user_id"], sessions_bucket, 32, batch_format="pandas"
                )
            ),
            results,
        )

    ratios = {
        op: round(results[f"{op}_high"]["sec"] / results[f"{op}_low"]["sec"], 2)
        for op in ("dedup_exact", "dedup_segments", "assemble", "grouped_int_sums", "sessionize")
    }
    print(
        json.dumps(
            {
                "metric": "cardinality_scaling",
                "n_rows": N_ROWS,
                "low_keys": LOW_KEYS,
                "high_keys": HIGH_KEYS,
                "results": results,
                "high_over_low_ratio": ratios,
                "segment_exchange_bytes": exchange_bytes,
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
