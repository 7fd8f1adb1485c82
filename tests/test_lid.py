"""Trained Cavnar–Trenkle language ID (stages/lid.py)."""

import numpy as np
import pyarrow as pa

import ray.data

from deepdoctection_ray.stages.lid import (
    NgramLanguageClassifier,
    _gram_len,
    _rank_topk,
    gram_keys,
    key_to_gram,
    train_ngram_lid,
)


def test_gram_key_roundtrip():
    keys = gram_keys("abcΩ1")
    grams = sorted(key_to_gram(int(k)) for k in keys)
    expect = sorted(
        ["a", "b", "c", "Ω", "1", "ab", "bc", "cΩ", "Ω1", "abc", "bcΩ", "cΩ1"]
    )
    assert grams == expect


def test_rank_total_order():
    # "aabab": counts a=3, b=2, ab=2, aa=1, ba=1, aab=1, aba=1, bab=1
    keys = gram_keys("aabab")
    uk, c = np.unique(keys, return_counts=True)
    ranked = sorted(
        ((r, key_to_gram(k)) for k, r in _rank_topk(uk, c, 5).items())
    )
    # count desc, then LENGTH asc, then gram asc: b (len 1) before ab (len 2)
    assert ranked == [(0, "a"), (1, "b"), (2, "ab"), (3, "aa"), (4, "ba")]


def _two_language_corpus():
    rng = np.random.RandomState(7)
    voc_a = ["aba", "bab", "abba", "baab", "ab"]
    voc_b = ["zyz", "yzy", "zyyz", "yzzy", "zy"]
    rows = []
    for i in range(60):
        voc, lang = (voc_a, "aa") if i % 2 == 0 else (voc_b, "zz")
        words = [voc[int(rng.randint(len(voc)))] for _ in range(20)]
        rows.append((i, " ".join(words), lang))
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
        }
    )


def test_train_and_classify_separable(ray_session):
    corpus = _two_language_corpus()
    ds = ray.data.from_arrow(corpus)
    profiles = train_ngram_lid(ds, "text", "lang", top_k=50)
    assert set(profiles["lang"].to_pylist()) == {"aa", "zz"}
    # ranks are 0..K-1 contiguous per language
    pdf = profiles.to_pandas()
    for _, sub in pdf.groupby("lang"):
        assert list(sub["rank"]) == list(range(len(sub)))
    out = (
        ds.map_batches(
            NgramLanguageClassifier,
            batch_format="pyarrow",
            concurrency=(1, 2),
            batch_size=16,
            fn_constructor_kwargs=dict(profiles=profiles, top_k=50),
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    truth = corpus.to_pandas().sort_values("doc_id")
    # a genuinely separable corpus classifies perfectly
    assert list(out["pred_lang"]) == list(truth["lang"])
    assert (out["dist"] >= 0).all()


def test_classifier_drops_empty_text(ray_session):
    profiles = train_ngram_lid(
        ray.data.from_arrow(_two_language_corpus()), "text", "lang", top_k=50
    )
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(["abab", ""], pa.string()),
            }
        )
    )
    out = ds.map_batches(
        NgramLanguageClassifier,
        batch_format="pyarrow",
        concurrency=(1, 2),
        fn_constructor_kwargs=dict(profiles=profiles, top_k=50),
    ).to_pandas()
    assert list(out["doc_id"]) == [1]
    assert out["pred_lang"].iloc[0] == "aa"


def test_gram_len_kernel():
    keys = gram_keys("xyz")
    lens = sorted(_gram_len(keys).tolist())
    assert lens == [1, 1, 1, 2, 2, 3]
