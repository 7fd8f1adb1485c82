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
