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
