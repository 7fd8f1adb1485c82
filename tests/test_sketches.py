"""Count-Min sketch (stages/sketches.py — HLL is pinned in test_text_ops.py)."""



def test_countmin_never_underestimates(ray_session):
    import collections

    import numpy as np
    import pyarrow as pa

    import ray.data
    from deepdoctection_ray.kernels.normalize import word_ngrams
    from deepdoctection_ray.stages.sketches import CountMinSketch, countmin_ngrams

    rng = np.random.RandomState(3)
    words = "red green blue cyan teal gold pink grey".split()
    texts = [
        " ".join(words[int(rng.randint(len(words)))] for _ in range(25))
        for _ in range(120)
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    cm = countmin_ngrams(
        ray.data.from_arrow(t).repartition(6), "text", k=3, depth=4, width=256
    )
    true = collections.Counter(g for x in texts for g in word_ngrams(x, 3))
    grams = np.asarray(sorted(true), dtype=object)
    est = cm.estimate(grams)
    exact = np.asarray([true[g] for g in grams], dtype=np.int64)
    assert (est >= exact).all()                  # never underestimates
    assert cm.counters.sum() == 4 * exact.sum()  # each occurrence hits 4 rows
    # serialization round-trip + merge associativity
    cm2 = CountMinSketch.from_bytes(cm.to_bytes(), 4, 256)
    assert (cm2.estimate(grams) == est).all()
    half = CountMinSketch(4, 256)
    half.merge(cm2).merge(CountMinSketch(4, 256))
    assert (half.estimate(grams) == est).all()


def test_kll_guarantee_and_serialization():
    """The self-certified bound must hold for EVERY quantile under merge,
    across distributions including heavy ties and pre-sorted inputs (the
    deterministic-compaction adversarial shapes)."""
    import numpy as np

    from deepdoctection_ray.stages.sketches import KLLSketch

    rng = np.random.RandomState(7)
    cases = {
        "uniform": rng.uniform(0, 1000, 100000),
        "lognormal": rng.lognormal(3, 2, 100000),
        "ties": rng.randint(0, 30, 100000).astype(float),
        "sorted": np.sort(rng.uniform(0, 1, 100000)),
    }
    for name, data in cases.items():
        parts = np.array_split(data, 23)
        sketches = []
        for p in parts:
            s = KLLSketch(256)
            s.update(p)
            sketches.append(s)
        sk = sketches[0]
        for s in sketches[1:]:
            sk.merge(s)
        assert sk.n == len(data)
        srt = np.sort(data)
        for q in [0.01, 0.1, 0.5, 0.9, 0.99]:
            est = sk.quantile(q)
            lo = int(np.searchsorted(srt, est, side="left")) + 1
            hi = int(np.searchsorted(srt, est, side="right"))
            target = max(int(np.ceil(q * sk.n)), 1)
            d = max(lo - target, target - hi, 0)
            assert d <= sk.err_bound, (name, q, d, sk.err_bound)
        # the certificate is useful, not vacuous: well under 5% of n
        assert sk.err_bound < 0.05 * sk.n
        rt = KLLSketch.from_bytes(sk.to_bytes())
        assert rt.n == sk.n and rt.err_bound == sk.err_bound
        assert all((a == b).all() for a, b in zip(rt.levels, sk.levels))
        assert rt.quantile(0.5) == sk.quantile(0.5)


def test_kll_quantiles_distributed_and_profile_sketch(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from deepdoctection_ray.stages.profile import profile_table
    from deepdoctection_ray.stages.sketches import kll_quantiles

    rng = np.random.RandomState(3)
    vals = rng.lognormal(2, 1, 20000)
    ds = ray.data.from_arrow(
        pa.table({"x": pa.array(vals, pa.float64()), "s": pa.array(["a"] * 20000)})
    ).repartition(13)
    t = kll_quantiles(ds, "x", [0.25, 0.5, 0.75], k=256)
    srt = np.sort(vals)
    err = int(t["err_bound"][0].as_py())
    assert int(t["n"][0].as_py()) == 20000
    for q, est in zip(t["q"].to_pylist(), t["value"].to_pylist()):
        lo = int(np.searchsorted(srt, est, side="left")) + 1
        hi = int(np.searchsorted(srt, est, side="right"))
        target = max(int(np.ceil(q * 20000)), 1)
        assert max(lo - target, target - hi, 0) <= err

    prof = profile_table(ds, sketch=True)
    rows = {r["col_name"]: r for r in prof.to_pylist()}
    med = rows["x"]["p50_est"]
    exact_med = float(srt[int(np.ceil(0.5 * 20000)) - 1])
    # p50 estimate within the certified rank bound translated to value space
    k = int(np.ceil(0.5 * 20000)) - 1
    bound = rows["x"]["p50_err_bound"]
    lo_v = srt[max(k - bound, 0)]
    hi_v = srt[min(k + bound, 19999)]
    assert lo_v <= med <= hi_v, (med, exact_med, bound)
    # non-numeric columns carry NULL sketch fields
    assert rows["s"]["p50_est"] is None and rows["s"]["p50_err_bound"] is None
