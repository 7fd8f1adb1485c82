"""Distributed BPE tokenizer training + application (stages/bpe.py).

Three implementations are pinned against each other: the NAIVE
recount-per-round trainer (golden reference), the incremental pair-update
trainer (the production local loop), and the fully distributed round loop
(pair-count exchange per merge). The tokenizer stage must reproduce the
single-threaded greedy encode exactly.
"""

import random

import pyarrow as pa

import ray.data

from deepdoctection_ray.stages.bpe import (
    BpeTokenizer,
    _pretokenize,
    encode_word,
    train_bpe,
    train_bpe_local,
    train_bpe_naive,
    train_bpe_rounds,
    word_counts,
)

DOCS = [
    "streamer streaming streams stream",
    "merger merging merged merge, merge!",
    "sorter sorting sorted sorts sort",
    "the streamer merged the sorted stream",
    "filters filtering filtered; filter",
    "batch batches batching batched batch",
]


def _counts(docs):
    from collections import Counter

    c = Counter()
    for d in docs:
        c.update(_pretokenize(d, False))
    return dict(c)


def test_incremental_equals_naive_fuzz():
    roots = ["stream", "merg", "sort", "filt", "batch", "tabl", "quer", "wind"]
    sufs = ["", "e", "er", "ing", "ed", "s", "ation", "y"]
    vocab = [r + s for r in roots for s in sufs]
    for trial in range(25):
        rnd = random.Random(trial)
        counts = {
            w: rnd.randint(1, 60)
            for w in rnd.sample(vocab, rnd.randint(4, len(vocab)))
        }
        nm = rnd.randint(1, 100)
        assert train_bpe_naive(counts, nm) == train_bpe_local(counts, nm), trial


def test_merge_overlap_left_to_right():
    # 'aaaa</w>' with merge (a,a): non-overlapping left-to-right → aa aa </w>
    merges = train_bpe_naive({"aaaa": 3}, 2)
    assert merges[0] == ("a", "a")
    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_word("aaaaa", ranks)[:2] == ["aa", "aa"]


def test_min_count_floor():
    counts = {"abab": 10, "zqzq": 1}
    merges = train_bpe_local(counts, 50, min_count=2)
    flat = "".join(a + b for a, b in merges)
    assert "z" not in flat and "q" not in flat


def test_word_counts_distributed(ray_session):
    ds = ray.data.from_arrow(pa.table({"text": DOCS}))
    got = {
        r["word"]: r["n"]
        for b in word_counts(ds, "text").iter_batches(batch_format="pyarrow")
        for r in pa.table(b).to_pylist()
    }
    assert got == _counts(DOCS)


def test_train_bpe_distributed_counting_equals_local(ray_session):
    ds = ray.data.from_arrow(pa.table({"text": DOCS}))
    assert train_bpe(ds, "text", num_merges=40) == train_bpe_local(
        _counts(DOCS), 40
    )


def test_train_bpe_max_words_cap(ray_session):
    # cap keeps the most frequent words (count desc, word asc): with the cap
    # at 2 the trainer sees only the two heaviest words
    ds = ray.data.from_arrow(
        pa.table({"text": ["xy xy xy xy", "uv uv uv", "kj"]})
    )
    merges = train_bpe(ds, "text", num_merges=10, max_words=2)
    flat = "".join(a + b for a, b in merges)
    assert "k" not in flat and "j" not in flat
    assert ("x", "y") in merges and ("u", "v") in merges


def test_train_bpe_rounds_equals_local(ray_session):
    ds = ray.data.from_arrow(pa.table({"text": DOCS}))
    assert train_bpe_rounds(ds, "text", num_merges=12) == train_bpe_local(
        _counts(DOCS), 12
    )


def test_tokenizer_stage_matches_single_threaded(ray_session):
    counts = _counts(DOCS)
    merges = train_bpe_local(counts, 60)
    ranks = {p: i for i, p in enumerate(merges)}
    ds = ray.data.from_arrow(
        pa.table({"doc_id": list(range(len(DOCS))), "text": DOCS})
    )
    out = (
        ds.map_batches(
            BpeTokenizer,
            batch_format="pyarrow",
            concurrency=(1, 2),
            batch_size=2,
            fn_constructor_kwargs=dict(merges=merges),
        )
        .to_pandas()
        .sort_values("doc_id")
    )
    for doc_id, toks in zip(out["doc_id"], out["bpe_tokens"]):
        expect = []
        for w in _pretokenize(DOCS[doc_id], False):
            expect.extend(encode_word(w, ranks))
        assert list(toks) == expect
        # round-trip: stripping the end-of-word markers reconstructs the text
        joined = "".join(expect).replace("</w>", " ").strip()
        assert joined == " ".join(_pretokenize(DOCS[doc_id], False))


def test_encode_unknown_chars_pass_through():
    merges = train_bpe_local({"ab": 5}, 10)
    ranks = {p: i for i, p in enumerate(merges)}
    assert encode_word("Ω", ranks) == ["Ω", "</w>"]
