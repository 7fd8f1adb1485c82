"""Checkpoint retry semantics (pipelines/checkpoint.py): idempotent
re-finalize on identical content, hard error on divergent content, marker
temp files that never parse as markers (ADVICE round-1 fixes)."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest

from deepdoctection_ray.pipelines.checkpoint import (
    completed_partitions,
    write_partition,
)

TABLE = pa.table({"conv_id": ["a", "b"], "turn_idx": [0, 1], "v": [1.0, 2.0]})


def test_identical_retry_is_idempotent(tmp_path):
    out = str(tmp_path)
    first = write_partition(out, 3, TABLE)
    # a Ray task retry re-runs the finalized partition with identical rows
    again = write_partition(out, 3, TABLE)
    assert again["n_rows"] == first["n_rows"] == 2
    assert completed_partitions(out) == {3}


def test_divergent_refinalize_raises(tmp_path):
    out = str(tmp_path)
    write_partition(out, 3, TABLE)
    other = pa.table({"conv_id": ["a", "c"], "turn_idx": [0, 5], "v": [1.0, 9.0]})
    with pytest.raises(RuntimeError, match="different content"):
        write_partition(out, 3, other)


def test_stray_marker_suffix_does_not_break_resume(tmp_path):
    out = str(tmp_path)
    write_partition(out, 1, TABLE)
    # crash leftovers / foreign files with the marker prefix but junk suffixes
    for junk in ("_SUCCESS.abc", "_SUCCESS.00002.tmp"):
        with open(os.path.join(out, junk), "w") as fh:
            fh.write("x")
    assert completed_partitions(out) == {1}


def test_marker_requires_data_file(tmp_path):
    out = str(tmp_path)
    write_partition(out, 1, TABLE)
    os.remove(os.path.join(out, "part-00001.parquet"))
    assert completed_partitions(out) == set()  # marker without data ≠ done
