"""Grouped exact quantiles (functions/aggregates.grouped_quantiles)."""

import numpy as np
import pyarrow as pa



def test_grouped_quantiles_matches_pandas(ray_session):
    import math

    import ray.data
    from deepdoctection_ray.functions.aggregates import grouped_quantiles

    rng = np.random.RandomState(5)
    keys = rng.choice(["a", "b", "c"], size=500)
    vals = np.round(rng.standard_normal(500) * 10, 1)  # heavy ties
    t = pa.table(
        {
            "k": pa.array(keys, pa.string()),
            "v": pa.array(vals, pa.float64()),
        }
    )
    qs = [0.1, 0.5, 0.9]
    out = (
        grouped_quantiles(ray.data.from_arrow(t), ["k"], "v", qs, num_buckets=4)
        .to_pandas()
        .sort_values(["k", "q"])
        .reset_index(drop=True)
    )
    for key in ["a", "b", "c"]:
        sub = np.sort(vals[keys == key])
        for q in qs:
            kth = max(0, math.ceil(q * len(sub)) - 1)
            got = out[(out["k"] == key) & (out["q"] == q)]["value"].iloc[0]
            assert got == sub[kth], (key, q)
    assert len(out) == 9


def test_pps_sample_exact_count_and_proportionality(ray_session):
    import ray.data
    from deepdoctection_ray.stages.text_stats import pps_systematic_sample

    rng = np.random.RandomState(7)
    w = rng.randint(1, 100, size=1000).astype(np.int64)
    # one heavy doc: weight > 2 * W/n so it MUST be picked (multiple times)
    w[123] = int(w.sum())  # ~half the total line
    t = pa.table(
        {
            "doc_id": pa.array(range(1000), pa.int64()),
            "wt": pa.array(w, pa.int64()),
        }
    )
    out = (
        pps_systematic_sample(
            ray.data.from_arrow(t).repartition(5), "doc_id", "wt", n=200
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    assert out["n_picks"].sum() == 200  # exactly n draws, always
    heavy = out[out["doc_id"] == 123]["n_picks"].iloc[0]
    assert 95 <= heavy <= 105  # ~half the line -> ~half the picks
    # zero-weight rows can never be drawn
    t2 = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "wt": pa.array([0, 10, 0], pa.int64()),
        }
    )
    out2 = pps_systematic_sample(
        ray.data.from_arrow(t2), "doc_id", "wt", n=4
    ).to_pandas()
    assert list(out2["doc_id"]) == [2] and out2["n_picks"].iloc[0] == 4


def test_pps_sample_deterministic_and_empty(ray_session):
    import ray.data
    from deepdoctection_ray.stages.text_stats import pps_systematic_sample

    t = pa.table(
        {
            "doc_id": pa.array(range(50), pa.int64()),
            "wt": pa.array([(i % 7) + 1 for i in range(50)], pa.int64()),
        }
    )
    a = pps_systematic_sample(ray.data.from_arrow(t), "doc_id", "wt", 10).to_pandas()
    b = pps_systematic_sample(
        ray.data.from_arrow(t).repartition(9), "doc_id", "wt", 10
    ).to_pandas()
    pd_a = a.sort_values("doc_id").reset_index(drop=True)
    pd_b = b.sort_values("doc_id").reset_index(drop=True)
    assert pd_a.equals(pd_b)  # partitioning-independent
    empty = pps_systematic_sample(
        ray.data.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()), "wt": pa.array([], pa.int64())})
        ),
        "doc_id",
        "wt",
        5,
    ).to_pandas()
    assert len(empty) == 0


def test_normalize_text_unicode(ray_session):
    import ray.data
    from deepdoctection_ray.stages.text_stats import normalize_text

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                ["  Héllo\t\nWORLD  ", "Straße  ß", "", "Café x"],
                pa.string(),
            ),
        }
    )
    out = (
        normalize_text(ray.data.from_arrow(t), "text")
        .to_pandas()
        .sort_values("doc_id")
    )
    import unicodedata

    exp = [unicodedata.normalize("NFC", x) for x in ["héllo world", "straße ß", "", "café x"]]
    assert list(out["norm_text"]) == exp
    # original column preserved
    assert "text" in out.columns
