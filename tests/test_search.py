"""BM25 search: brute-force parity, determinism across block layouts."""

import math

import pytest

import ray.data

from deepdoctection_ray.stages.search import bm25_search

DOCS = [
    {"doc_id": 1, "text": "spark spark spark window"},
    {"doc_id": 2, "text": "window hash window"},
    {"doc_id": 3, "text": "nothing relevant at all here today"},
    {"doc_id": 4, "text": "hash"},
    {"doc_id": 5, "text": "spark window hash spark window hash spark window hash"},
    {"doc_id": 6, "text": "sparkle windows hashes"},  # word-boundary: no match
]
TERMS = ["spark", "window", "hash"]


def _brute(docs, terms, k1=1.2, b=0.75):
    import re

    dls = [len(d["text"].split()) for d in docs]
    n = len(docs)
    avgdl = sum(dls) / n
    tfs = [
        [len(re.findall(r"\b" + t + r"\b", d["text"])) for t in terms] for d in docs
    ]
    dfs = [sum(1 for row in tfs if row[i] > 0) for i in range(len(terms))]
    out = []
    for d, dl, row in zip(docs, dls, tfs):
        s = 0.0
        for i, tf in enumerate(row):
            idf = math.log(1.0 + (n - dfs[i] + 0.5) / (dfs[i] + 0.5))
            s += idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
        out.append((d["doc_id"], round(s, 6)))
    return sorted(out, key=lambda x: (-x[1], x[0]))


@pytest.mark.parametrize("parallelism", [1, 4])
def test_bm25_matches_brute_force(ray_session, parallelism):
    ds = ray.data.from_items(DOCS, override_num_blocks=parallelism)
    got = bm25_search(ds, TERMS, k=6).to_pandas()
    exp = _brute(DOCS, TERMS)
    assert list(zip(got["doc_id"], got["score"])) == exp
    # doc 6 ("sparkle windows") must score 0 — word boundaries respected
    assert got.set_index("doc_id").loc[6, "score"] == 0.0


def test_bm25_topk_cut(ray_session):
    ds = ray.data.from_items(DOCS, override_num_blocks=3)
    got = bm25_search(ds, TERMS, k=2).to_pandas()
    exp = _brute(DOCS, TERMS)[:2]
    assert list(zip(got["doc_id"], got["score"])) == exp


def test_bm25_empty_corpus(ray_session):
    import pyarrow as pa

    empty = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})
    )
    out = bm25_search(empty, TERMS, k=5)
    assert out.count() == 0


def test_bm25_empty_corpus_preserves_id_type(ray_session):
    import pyarrow as pa

    empty = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([], pa.string()), "text": pa.array([], pa.string())})
    )
    out = bm25_search(empty, TERMS, k=5)
    assert out.count() == 0
    sch = out.schema()
    assert sch.types[sch.names.index("doc_id")] == pa.string()


def test_bm25_all_zero_length_docs(ray_session):
    """Every document tokenless: avgdl would be 0 — scores must be 0.0, not
    NaN (the dl/avgdl norm term must not produce 0/0)."""
    docs = [{"doc_id": 1, "text": ""}, {"doc_id": 2, "text": "   "}]
    got = bm25_search(ray.data.from_items(docs), TERMS, k=2).to_pandas()
    assert list(got["score"]) == [0.0, 0.0]
    assert list(got["doc_id"]) == [1, 2]


def test_tfidf_topk_matches_reference(ray_session):
    import math

    import numpy as np
    import pyarrow as pa

    import ray.data
    from deepdoctection_ray.stages.search import tfidf_topk

    texts = [
        "apple banana apple cherry",
        "banana banana date",
        "apple egg egg egg fig",
        "cherry date fig",
    ]
    t = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = (
        tfidf_topk(ray.data.from_arrow(t).repartition(3), "text", "doc_id", top_n=2)
        .to_pandas()
        .sort_values(["doc_id", "tfidf", "term"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    # hand reference
    from collections import Counter

    tfs = [Counter(x.split()) for x in texts]
    df = Counter(w for c in tfs for w in c)
    n = len(texts)
    for doc_id, c in enumerate(tfs):
        scored = sorted(
            ((round(tf * math.log(n / df[w]), 6), w) for w, tf in c.items()),
            key=lambda p: (-p[0], p[1]),
        )[:2]
        got = out[out["doc_id"] == doc_id]
        assert list(got["term"]) == [w for _, w in scored]
        assert np.allclose(got["tfidf"], [s for s, _ in scored], atol=1e-9)
    # exactly top_n rows per doc
    assert (out.groupby("doc_id").size() == 2).all()


def test_tfidf_empty_corpus(ray_session):
    import pyarrow as pa

    import ray.data
    from deepdoctection_ray.stages.search import tfidf_topk

    t = pa.table(
        {
            "doc_id": pa.array([1], pa.int64()),
            "text": pa.array([""], pa.string()),
        }
    )
    out_ds = tfidf_topk(ray.data.from_arrow(t), "text", "doc_id", top_n=2)
    # Ray's to_pandas() drops columns from a fully-empty dataset; assert on
    # the dataset schema (typed by the operator's empty guard) + row count
    assert out_ds.count() == 0
    assert "tfidf" in out_ds.schema().names
