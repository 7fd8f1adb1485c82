"""Column profiler: nulls, exact distinct, typed min/max, mean."""

import pyarrow as pa

import ray.data

from deepdoctection_ray.stages.profile import profile_table


def _table():
    return pa.table(
        {
            "k": pa.array([3, 1, 2, None, 2, 10], pa.int64()),
            "s": pa.array(["b", "a", None, "a", "z", "m"], pa.string()),
            "f": pa.array([1.5, 2.5, 3.0, 4.0, None, 1.0], pa.float64()),
        }
    )


def test_profile_matches_hand_computation(ray_session):
    ds = ray.data.from_arrow(_table()).repartition(3)
    out = profile_table(ds).to_pandas().set_index("col_name")
    k = out.loc["k"]
    assert (k.n_rows, k.n_nulls, k.n_distinct) == (6, 1, 4)
    # numeric min/max, not lexicographic: 10 > 9 would break a string-min impl
    assert (k.min_s, k.max_s) == ("1", "10")
    assert k["mean"] == round((3 + 1 + 2 + 2 + 10) / 5, 6)
    s = out.loc["s"]
    assert (s.n_nulls, s.n_distinct, s.min_s, s.max_s) == (1, 4, "a", "z")
    assert s["mean"] != s["mean"]  # NaN for non-numeric
    f = out.loc["f"]
    assert (f.n_nulls, f.n_distinct) == (1, 5)
    assert f["mean"] == round(12.0 / 5, 6)


def test_profile_block_layout_invariant(ray_session):
    t = _table()
    one = profile_table(ray.data.from_arrow(t)).to_pandas()
    many = profile_table(ray.data.from_arrow(t).repartition(6)).to_pandas()
    assert one.equals(many)


def test_profile_column_subset(ray_session):
    ds = ray.data.from_arrow(_table())
    out = profile_table(ds, ["s"]).to_pandas()
    assert list(out["col_name"]) == ["s"]
