"""Distributed BPE tokenizer training + application.

The reference CONSUMES pretrained word-piece vocabularies (its LayoutLM
mapper, ``dd_core``'s tokenizer plumbing mirrored in
``kernels/layoutlm.py``) but never TRAINS one — at 100-TB corpus scale the
tokenizer itself is a product of the data pipeline, so this operator is part
of the beyond-reference surface (same tier as the dedup family). Algorithm:
byte-pair encoding per Sennrich et al. 2016 ("Neural Machine Translation of
Rare Words with Subword Units", public literature), with the standard
industrial two-phase layout (what HF tokenizers / SentencePiece do):

1. **word counting — the only corpus-scale pass.** Pre-tokenize each doc
   inside ``map_batches`` (compiled regex, vectorized-per-batch ``Counter``
   partial counts so duplicate words never leave the batch), then one
   grouped sum. 100 TB of text reduces to the distinct-word table.
2. **merge loop over the word-count table.** The table is bounded by the
   ``min_count`` frequency floor + ``max_words`` cap (count-desc, word-asc —
   the same knobs Sennrich/SentencePiece expose) and is vocab-sized
   (10^5-10^7 rows), so the default path collects it ONCE to the trainer and
   runs the exact incremental merge loop locally — identical shape to HF
   ``tokenizers``' trainer, which also counts distributed/streamed and merges
   on one machine. For word tables too large even for one node,
   :func:`train_bpe_rounds` keeps the symbol table distributed and runs each
   merge round as one pair-count exchange (per-batch weighted pair partials →
   grouped sum → per-block argmax → driver sees O(blocks) rows) + one
   vectorized merge pass; both paths produce bit-identical merge lists (the
   tie-break is total: count desc, then lexicographically smallest pair).

Application (:class:`BpeTokenizer`) is an actor-pool ``map_batches`` stage:
merge ranks are built once per actor in ``__init__``; per batch, the distinct
words are encoded once each through a per-actor cache (Zipf makes the cache
hit rate extreme) and re-broadcast to their occurrences.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

__all__ = [
    "word_counts",
    "train_bpe_naive",
    "train_bpe_local",
    "train_bpe",
    "train_bpe_rounds",
    "encode_word",
    "BpeTokenizer",
]

# GPT-2-ish pre-tokenizer without the lookbehind exotica: runs of word chars
# (with leading apostrophe contractions) or runs of non-space punctuation.
_PRETOKEN_RE = re.compile(r"[\w']+|[^\w\s]+")

_EOW = "</w>"


def _pretokenize(text: str, lowercase: bool) -> list[str]:
    if lowercase:
        text = text.lower()
    return _PRETOKEN_RE.findall(text)


def word_counts(
    ds: ray.data.Dataset,
    text_column: str = "text",
    lowercase: bool = False,
) -> ray.data.Dataset:
    """Corpus → distinct-word count table ``(word, n)``.

    Per-batch ``Counter`` partials (duplicate words collapse before the
    exchange), then one grouped sum — the only corpus-scale pass of BPE
    training.
    """
    from ..functions.aggregates import grouped_sums

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for text in batch[text_column].to_pylist():
            if text:
                c.update(_pretokenize(text, lowercase))
        if not c:
            return pa.table(
                {"word": pa.array([], pa.string()), "c": pa.array([], pa.int64())}
            )
        words, counts = zip(*c.items())
        return pa.table(
            {"word": pa.array(words, pa.string()), "c": pa.array(counts, pa.int64())}
        )

    sums = grouped_sums(
        ds.map_batches(partial, batch_format="pyarrow"), ["word"], ["c"], count_alias=None
    )
    return sums.map_batches(
        lambda t: pa.table(
            {"word": t["word"], "n": pa.compute.cast(t["sum_c"], pa.int64())}
        ),
        batch_format="pyarrow",
        batch_size=None,
    )


def _symbols(word: str) -> tuple[str, ...]:
    """Initial symbol sequence: characters plus the end-of-word marker."""
    return tuple(word) + (_EOW,)


def _pair_stats(vocab: dict[tuple[str, ...], int]) -> Counter:
    stats: Counter = Counter()
    for syms, n in vocab.items():
        for i in range(len(syms) - 1):
            stats[(syms[i], syms[i + 1])] += n
    return stats


def _merge_syms(syms: tuple[str, ...], pair: tuple[str, str]) -> tuple[str, ...]:
    """Left-to-right non-overlapping merge of ``pair`` in one symbol tuple."""
    a, b = pair
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _best_pair(stats) -> tuple[str, str] | None:
    """Deterministic total order: count desc, then lexicographically smallest."""
    best = None
    best_n = 0
    for pair, n in stats.items():
        if n > best_n or (n == best_n and best is not None and pair < best):
            best, best_n = pair, n
    return best if best_n > 0 else None


def train_bpe_naive(
    counts: dict[str, int], num_merges: int, min_count: int = 1
) -> list[tuple[str, str]]:
    """Reference trainer: recount ALL pair stats from scratch every round.

    O(rounds × corpus-vocab) — used to generate golden fixtures and as the
    independent implementation the incremental trainer is pinned against.
    """
    vocab = {
        _symbols(w): n for w, n in counts.items() if n >= min_count and w
    }
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair = _best_pair(_pair_stats(vocab))
        if pair is None:
            break
        merges.append(pair)
        vocab = {_merge_syms(s, pair): n for s, n in vocab.items()}
    return merges


def train_bpe_local(
    counts: dict[str, int], num_merges: int, min_count: int = 1
) -> list[tuple[str, str]]:
    """Incremental trainer: pair stats updated only for words that contained
    the merged pair (an inverted pair→word index), the standard fast loop.
    Bit-identical output to :func:`train_bpe_naive` (pinned in tests)."""
    words: list[tuple[str, ...]] = []
    freqs: list[int] = []
    for w, n in counts.items():
        if n >= min_count and w:
            words.append(_symbols(w))
            freqs.append(n)
    stats: Counter = Counter()
    where: dict[tuple[str, str], set[int]] = {}
    for wi, syms in enumerate(words):
        n = freqs[wi]
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            stats[p] += n
            where.setdefault(p, set()).add(wi)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair = _best_pair(stats)
        if pair is None:
            break
        merges.append(pair)
        touched = where.get(pair, set())
        for wi in sorted(touched):
            old = words[wi]
            n = freqs[wi]
            for i in range(len(old) - 1):
                p = (old[i], old[i + 1])
                stats[p] -= n
                if stats[p] <= 0:
                    del stats[p]
                s = where.get(p)
                if s is not None:
                    s.discard(wi)
                    if not s:
                        del where[p]
            new = _merge_syms(old, pair)
            words[wi] = new
            for i in range(len(new) - 1):
                p = (new[i], new[i + 1])
                stats[p] += n
                where.setdefault(p, set()).add(wi)
    return merges


def train_bpe(
    ds: ray.data.Dataset,
    text_column: str = "text",
    num_merges: int = 200,
    min_count: int = 1,
    max_words: int = 1_000_000,
    lowercase: bool = False,
) -> list[tuple[str, str]]:
    """Distributed word counting → exact local merge loop (the default path).

    ``min_count`` + ``max_words`` bound what reaches the trainer: the word
    table is truncated to the ``max_words`` most frequent words (count desc,
    word asc — deterministic), which is the documented scale knob; at 100 TB
    a ``min_count`` of a few occurrences already collapses the table to
    vocab size. Only the capped table is collected.
    """
    wc = word_counts(ds, text_column, lowercase=lowercase)
    if min_count > 1:
        wc = wc.map_batches(
            lambda b: b.filter(pc.greater_equal(b["n"], min_count)),
            batch_format="pyarrow",
        )
    # deterministic cap: top max_words by (n desc, word asc)
    capped = wc.sort(["n", "word"], descending=[True, False]).limit(max_words)
    counts: dict[str, int] = {}
    for b in capped.iter_batches(batch_format="pyarrow"):
        t = pa.table(b)
        counts.update(zip(t["word"].to_pylist(), t["n"].to_pylist()))
    return train_bpe_local(counts, num_merges, min_count=min_count)


def _pair_partials(batch: pa.Table) -> pa.Table:
    """Weighted adjacent-pair counts for one block of the symbol table —
    vectorized over the flattened list column, combined per batch."""
    syms = batch["syms"]
    if isinstance(syms, pa.ChunkedArray):
        syms = syms.combine_chunks()
    n = batch["n"].to_numpy(zero_copy_only=False)
    flat = syms.flatten().to_numpy(zero_copy_only=False)
    offs = syms.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offs = offs - offs[0]  # sliced arrays: flatten() re-bases, offsets don't
    lens = np.diff(offs)
    total = len(flat)
    if total == 0:
        return pa.table(
            {"a": pa.array([], pa.string()), "b": pa.array([], pa.string()),
             "c": pa.array([], pa.int64())}
        )
    keep = np.ones(total, dtype=bool)
    keep[offs[1:][lens > 0] - 1] = False  # last symbol of each word opens no pair
    idx = np.nonzero(keep)[0]
    w = np.repeat(n, lens)[idx]
    df = pd.DataFrame({"a": flat[idx], "b": flat[idx + 1], "c": w})
    agg = df.groupby(["a", "b"], sort=False, as_index=False)["c"].sum()
    return pa.table(
        {"a": pa.array(agg["a"], pa.string()), "b": pa.array(agg["b"], pa.string()),
         "c": pa.array(agg["c"].to_numpy(), pa.int64())}
    )


def _apply_merge_batch(batch: pa.Table, pair: tuple[str, str]) -> pa.Table:
    """Merge ``pair`` in every symbol row of one block. The vectorized scan
    finds the (typically few) rows containing the pair; only those re-walk
    their symbols in Python."""
    syms = batch["syms"]
    if isinstance(syms, pa.ChunkedArray):
        syms = syms.combine_chunks()
    flat = syms.flatten().to_numpy(zero_copy_only=False)
    offs = syms.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offs = offs - offs[0]
    lens = np.diff(offs)
    a, b = pair
    total = len(flat)
    hit_rows: np.ndarray
    if total == 0:
        hit_rows = np.array([], dtype=np.int64)
    else:
        keep = np.ones(total, dtype=bool)
        keep[offs[1:][lens > 0] - 1] = False
        idx = np.nonzero(keep)[0]
        pm = (flat[idx] == a) & (flat[idx + 1] == b)
        # map flat hit positions back to row ids
        hit_pos = idx[pm]
        hit_rows = np.unique(np.searchsorted(offs, hit_pos, side="right") - 1)
    if len(hit_rows) == 0:
        return batch
    rows = syms.to_pylist()
    for ri in hit_rows:
        rows[ri] = list(_merge_syms(tuple(rows[ri]), pair))
    out = batch.set_column(
        batch.schema.get_field_index("syms"),
        "syms",
        pa.array(rows, pa.list_(pa.string())),
    )
    return out


def train_bpe_rounds(
    ds: ray.data.Dataset,
    text_column: str = "text",
    num_merges: int = 50,
    min_count: int = 1,
    lowercase: bool = False,
) -> list[tuple[str, str]]:
    """Fully distributed merge loop — the scale path for word tables too
    large to collect anywhere.

    The symbol table ``(syms: list<string>, n)`` stays a Dataset throughout;
    each round is one pair-count exchange (per-batch weighted partials →
    grouped sum → per-block argmax, so the driver sees O(blocks) candidate
    rows) and one vectorized merge pass, materialized to pin lineage.
    Bit-identical to :func:`train_bpe_local` (total-order tie-break).
    """
    from ..functions.aggregates import grouped_sums

    wc = word_counts(ds, text_column, lowercase=lowercase)
    if min_count > 1:
        wc = wc.map_batches(
            lambda b: b.filter(pc.greater_equal(b["n"], min_count)),
            batch_format="pyarrow",
        )

    def init_syms(batch: pa.Table) -> pa.Table:
        words = batch["word"].to_pylist()
        return pa.table(
            {
                "syms": pa.array([list(_symbols(w)) for w in words], pa.list_(pa.string())),
                "n": batch["n"],
            }
        )

    state = wc.map_batches(init_syms, batch_format="pyarrow").materialize()
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        partials = state.map_batches(_pair_partials, batch_format="pyarrow")
        sums = grouped_sums(partials, ["a", "b"], ["c"], count_alias=None)

        def block_best(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table(
                    {"a": pa.array([], pa.string()), "b": pa.array([], pa.string()),
                     "c": pa.array([], pa.int64())}
                )
            df = pd.DataFrame(
                {
                    "a": t["a"].to_numpy(zero_copy_only=False),
                    "b": t["b"].to_numpy(zero_copy_only=False),
                    "c": t["sum_c"].to_numpy(zero_copy_only=False).astype(np.int64),
                }
            )
            df = df.sort_values(["c", "a", "b"], ascending=[False, True, True])
            return pa.Table.from_pandas(df.head(1), preserve_index=False).select(
                ["a", "b", "c"]
            )

        cands = sorted(
            (
                (int(r["c"]), r["a"], r["b"])
                for r in pa.concat_tables(
                    [pa.table(b) for b in sums.map_batches(
                        block_best, batch_format="pyarrow"
                    ).iter_batches(batch_format="pyarrow")],
                    promote_options="default",
                ).to_pylist()
            ),
            key=lambda t: (-t[0], t[1], t[2]),
        )
        if not cands or cands[0][0] <= 0:
            break
        pair = (cands[0][1], cands[0][2])
        merges.append(pair)
        state = state.map_batches(
            lambda b, p=pair: _apply_merge_batch(b, p), batch_format="pyarrow"
        ).materialize()
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank merge loop (the standard GPT-2 encoder shape)."""
    syms = list(_symbols(word))
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


class BpeTokenizer:
    """Actor-pool tokenizer stage: ranks built once per actor, per-batch
    encode over the DISTINCT words of the batch through a per-actor cache."""

    def __init__(
        self,
        merges: list[tuple[str, str]],
        text_column: str = "text",
        output_column: str = "bpe_tokens",
        lowercase: bool = False,
    ):
        self.ranks = {tuple(p): i for i, p in enumerate(merges)}
        self.text_column = text_column
        self.output_column = output_column
        self.lowercase = lowercase
        self._cache: dict[str, list[str]] = {}

    def _encode_word(self, word: str) -> list[str]:
        toks = self._cache.get(word)
        if toks is None:
            toks = encode_word(word, self.ranks)
            if len(self._cache) < 1_000_000:
                self._cache[word] = toks
        return toks

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: list[list[str]] = []
        for text in batch[self.text_column].to_pylist():
            toks: list[str] = []
            if text:
                for w in _pretokenize(text, self.lowercase):
                    toks.extend(self._encode_word(w))
            out.append(toks)
        return batch.append_column(
            self.output_column, pa.array(out, pa.list_(pa.string()))
        )
