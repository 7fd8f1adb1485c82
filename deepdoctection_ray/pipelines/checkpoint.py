"""Partitioned, resumable output layout with per-partition lineage.

The reference has no stream-level checkpointing (SURVEY.md §4); this design is
native to the Ray rebuild:

- output is hash-partitioned by ``crc32(conv_id) % P`` — ONE partitioning key
  reused by every downstream stage;
- each partition writes atomically (temp file → ``os.replace``) as
  ``part-{i:05d}.parquet`` plus ``part-{i:05d}.lineage.json`` (row counts,
  error tally, payload-kind histogram, engine version) and a
  ``_SUCCESS.{i:05d}`` marker;
- a resumed run scans the markers and filters finished partitions OUT at the
  read, before any extraction work happens;
- row ids are content hashes (kernels.ids), so a retried partition overwrites
  with identical bytes — idempotent by construction.
"""

from __future__ import annotations

import json
import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

from .. import __version__

PART_FMT = "part-{i:05d}.parquet"
LINEAGE_FMT = "part-{i:05d}.lineage.json"
MARKER_FMT = "_SUCCESS.{i:05d}"


def completed_partitions(output_dir: str) -> set[int]:
    """Partition ids with a success marker AND an output file present."""
    if not os.path.isdir(output_dir):
        return set()
    names = set(os.listdir(output_dir))
    done = set()
    for name in names:
        if name.startswith("_SUCCESS."):
            i = int(name.split(".", 1)[1])
            if PART_FMT.format(i=i) in names:
                done.add(i)
    return done


def clear_output(output_dir: str) -> None:
    """Remove all partition files/lineage/markers (clean-slate rerun)."""
    if not os.path.isdir(output_dir):
        return
    for name in os.listdir(output_dir):
        if name.startswith(("part-", "_SUCCESS.", ".tmp-")):
            os.remove(os.path.join(output_dir, name))


def write_partition(output_dir: str, part_id: int, table: pa.Table, extra_lineage: dict | None = None) -> dict:
    """Atomically write one partition + lineage + marker; returns the lineage.

    Refuses to re-finalize a partition whose success marker already exists:
    inside one run that means a partition's rows arrived in two different
    writer tasks (an input block split — size ``num_partitions`` so a
    partition stays under ``target_max_block_size``), which would silently
    drop rows if allowed. Crash leftovers carry no marker and overwrite fine.
    """
    os.makedirs(output_dir, exist_ok=True)
    if os.path.exists(os.path.join(output_dir, MARKER_FMT.format(i=part_id))):
        raise RuntimeError(
            f"partition {part_id} already finalized in {output_dir}; "
            "duplicate write detected (block split or dirty output dir)"
        )
    tmp = os.path.join(output_dir, f".tmp-{part_id}-{uuid.uuid4().hex}")
    pq.write_table(table, tmp)
    os.replace(tmp, os.path.join(output_dir, PART_FMT.format(i=part_id)))

    n_errors = 0
    kind_hist: dict[str, int] = {}
    if "error" in table.column_names:
        n_errors = int(pa.compute.sum(table["error"].is_valid()).as_py() or 0)
    if "payload_kind" in table.column_names:
        counts = table.group_by("payload_kind").aggregate([("payload_kind", "count")])
        kind_hist = dict(
            zip(counts["payload_kind"].to_pylist(), counts["payload_kind_count"].to_pylist())
        )
    lineage = {
        "part_id": part_id,
        "n_rows": table.num_rows,
        "n_errors": n_errors,
        "payload_kinds": kind_hist,
        "engine_version": __version__,
        **(extra_lineage or {}),
    }
    lin_tmp = os.path.join(output_dir, f".tmp-lin-{part_id}-{uuid.uuid4().hex}")
    with open(lin_tmp, "w") as fh:
        json.dump(lineage, fh)
    os.replace(lin_tmp, os.path.join(output_dir, LINEAGE_FMT.format(i=part_id)))
    # marker last: its presence implies data + lineage are on disk
    marker = os.path.join(output_dir, MARKER_FMT.format(i=part_id))
    with open(marker + ".tmp", "w") as fh:
        fh.write("ok")
    os.replace(marker + ".tmp", marker)
    return lineage


def read_lineage(output_dir: str) -> list[dict]:
    out = []
    for name in sorted(os.listdir(output_dir)):
        if name.endswith(".lineage.json"):
            with open(os.path.join(output_dir, name)) as fh:
                out.append(json.load(fh))
    return out
