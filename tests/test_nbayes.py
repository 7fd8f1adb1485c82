"""Trained multinomial Naive Bayes classifier (stages/nbayes.py)."""

import hashlib

import numpy as np
import pyarrow as pa

import ray.data

from deepdoctection_ray.stages.nbayes import (
    NaiveBayesClassifier,
    token_buckets,
    train_naive_bayes,
)


def test_token_buckets_matches_sql_convention():
    toks = np.asarray(["spark", "join", "spark", ""], dtype=object)
    got = token_buckets(toks, 4096)
    exp = [
        int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % 4096 for t in toks
    ]
    assert got.tolist() == exp
    assert got[0] == got[2]


def _corpus():
    rows = [
        (0, "ham ham eggs", "a"),
        (1, "ham eggs eggs ham", "a"),
        (2, "spam spam bacon", "b"),
        (3, "spam bacon bacon spam", "b"),
        (4, "ham spam", "a"),
    ]
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
        }
    )


def test_train_matches_hand_counts(ray_session):
    corpus = _corpus()
    model = train_naive_bayes(
        ray.data.from_arrow(corpus), "text", "lang", num_buckets=64
    ).to_pandas()
    # bucket -1 rows carry per-label doc counts
    priors = model[model["bucket"] == -1].set_index("label")["c"].to_dict()
    assert priors == {"a": 3, "b": 2}
    # token totals per label
    totals = model[model["bucket"] >= 0].groupby("label")["c"].sum().to_dict()
    assert totals == {"a": 9, "b": 7}
    # a specific count: "ham" appears 4x under label a, 0x under b
    hb = int(hashlib.md5(b"ham").hexdigest()[:8], 16) % 64
    sub = model[(model["bucket"] == hb) & (model["label"] == "a")]
    # ham may share its bucket with another token at B=64 — count is >= 4
    assert sub["c"].sum() >= 4


def test_classify_matches_numpy_reference(ray_session):
    corpus = _corpus()
    ds = ray.data.from_arrow(corpus)
    B = 64
    model = train_naive_bayes(ds, "text", "lang", num_buckets=B)
    out = (
        ds.map_batches(
            NaiveBayesClassifier,
            batch_format="pyarrow",
            concurrency=(1, 2),
            fn_constructor_kwargs=dict(model=model, num_buckets=B),
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # hand-computed reference
    df = corpus.to_pandas()
    labels = sorted(df["lang"].unique())
    docs = {l: (df["lang"] == l).sum() for l in labels}
    counts = {l: np.zeros(B) for l in labels}
    for _, r in df.iterrows():
        for t in r["text"].split(" "):
            if t:
                b = int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % B
                counts[r["lang"]][b] += 1
    for _, r in out.iterrows():
        toks = [t for t in df.loc[df["doc_id"] == r["doc_id"], "text"].iloc[0].split(" ") if t]
        scores = {}
        for l in labels:
            s = np.log(docs[l] / len(df))
            s += sum(np.log(counts[l][int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % B] + 1.0) for t in toks)
            s -= len(toks) * np.log(counts[l].sum() + B)
            scores[l] = s
        best = min(labels, key=lambda l: (-scores[l], l))
        assert r["pred"] == best
        assert abs(r["score"] - scores[best]) < 1e-6
    # the toy corpus is separable — and doc 4 ("ham spam") goes to the
    # higher-prior class a
    assert list(out["pred"]) == ["a", "a", "b", "b", "a"]


def test_classifier_drops_zero_token_docs(ray_session):
    model = train_naive_bayes(
        ray.data.from_arrow(_corpus()), "text", "lang", num_buckets=64
    )
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([7, 8, 9], pa.int64()),
                "text": pa.array(["ham", "", "   "], pa.string()),
            }
        )
    )
    out = ds.map_batches(
        NaiveBayesClassifier,
        batch_format="pyarrow",
        concurrency=(1, 2),
        fn_constructor_kwargs=dict(model=model, num_buckets=64),
    ).to_pandas()
    assert list(out["doc_id"]) == [7]
    assert out["pred"].iloc[0] == "a"


def test_model_is_fixed_size(ray_session):
    """The trained model never exceeds L x (B + 1) rows however many docs."""
    big = pa.table(
        {
            "doc_id": pa.array(range(2000), pa.int64()),
            "text": pa.array(
                [f"w{i % 50} w{(i * 7) % 50} common" for i in range(2000)],
                pa.string(),
            ),
            "lang": pa.array(
                ["x" if i % 2 else "y" for i in range(2000)], pa.string()
            ),
        }
    )
    model = train_naive_bayes(
        ray.data.from_arrow(big), "text", "lang", num_buckets=32
    )
    assert len(model) <= 2 * (32 + 1)


def test_token_features_explode():
    from deepdoctection_ray.stages.nbayes import _token_features

    feats, rows, poss = _token_features(["a b", "", "c"])
    by_pos = {}
    for f, r, p in zip(feats, rows, poss):
        by_pos.setdefault((int(r), int(p)), set()).add(str(f))
    assert by_pos[(0, 1)] == {"0:a", "1:^", "2:b"}
    assert by_pos[(0, 2)] == {"0:b", "1:a", "2:$"}
    assert by_pos[(2, 1)] == {"0:c", "1:^", "2:$"}
    assert len(by_pos) == 3


def test_token_nb_learns_context(ray_session):
    """'bank' is class x after 'river' and class y after 'money' — a
    cur-token-only model cannot split these; the context features do."""
    rows = []
    for i in range(30):
        rows.append((i * 2, "river bank flows", "w x w"))
        rows.append((i * 2 + 1, "money bank pays", "w y w"))
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "labels": pa.array([r[2] for r in rows], pa.string()),
        }
    )
    from deepdoctection_ray.stages.nbayes import TokenNBClassifier, train_token_nb

    ds = ray.data.from_arrow(t)
    model = train_token_nb(ds, "text", "labels", num_buckets=256)
    out = (
        ds.drop_columns(["labels"])
        .map_batches(
            TokenNBClassifier,
            batch_format="pyarrow",
            concurrency=(1, 2),
            fn_constructor_kwargs=dict(model=model, num_buckets=256),
        )
        .to_pandas()
    )
    mid = out[out["pos"] == 2].sort_values("doc_id")
    evens = mid[mid["doc_id"] % 2 == 0]
    odds = mid[mid["doc_id"] % 2 == 1]
    assert set(evens["pred"]) == {"x"}
    assert set(odds["pred"]) == {"y"}
    # every position classified, 1-based pos
    assert len(out) == 60 * 3
    assert out["pos"].min() == 1 and out["pos"].max() == 3


def test_token_seq_fixture_deterministic():
    from deepdoctection_ray.synth import make_token_seq_corpus

    a = make_token_seq_corpus(50, seed=9)
    b = make_token_seq_corpus(50, seed=9)
    assert a.equals(b)
    # labels stream is parallel to token stream
    for text, labs in zip(a["text"].to_pylist(), a["labels"].to_pylist()):
        assert len(text.split(" ")) == len(labs.split(" "))
        assert set(labs.split(" ")) <= {"number", "date", "url", "email", "word"}
