"""Trained statistical language identification (Cavnar–Trenkle 1994).

The reference's ``LanguageDetectionService`` wraps a fasttext/HF model
(``extern/hflm.py``, ``pipe/language.py``) — no weights exist in this
sandbox, so ``stages/text_stats.LanguageId`` ships a stopword heuristic.
This module adds the genuinely TRAINED statistical classifier the service
contract implies: char-n-gram rank profiles per language ("N-Gram-Based Text
Categorization", Cavnar & Trenkle 1994 — the published ancestor of
fasttext-style LID), trained distributed over a labeled corpus and applied
as an actor-pool stage. Everything is integer counting + integer rank
arithmetic, so training AND inference rebuild bit-exactly in SQL (the
driver-hash oracle `q_ngram_lid`).

Design (100-TB shape):

- **gram counting is vectorized int work.** Each batch UTF-32-decodes its
  texts into one codepoint array; 1/2/3-gram keys pack into int64
  (21 bits/codepoint, missing positions padded with a sentinel above any
  codepoint, so keys are unique across gram lengths and numeric order within
  a length equals codepoint/string order). Per-batch ``(lang, key)`` partial
  counts collapse duplicates before the exchange; one grouped sum follows.
- **profiles stay distributed until K-sized.** ``top_n_per_group`` prunes to
  the per-language top-K candidates (lossless per-batch combiner → bucketed
  head); only L×K rows reach the driver, where the final rank 0..K-1 is
  assigned under the total order (count desc, gram length asc, gram asc).
- **classification is an actor-pool stage.** Profiles (a dict of int64
  key → rank per language) build once per actor; each batch re-derives its
  docs' top-K gram ranks with the same vectorized kernel and scores the
  out-of-place distance ``Σ |doc_rank − profile_rank|`` (missing gram → K)
  against every language — argmin with lexicographic tie-break.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

__all__ = ["gram_keys", "train_ngram_lid", "NgramLanguageClassifier"]

# pad sentinel: larger than any Unicode codepoint (0x10FFFF), 21 bits
_PAD = 0x1FFFFF
_BITS = 21


def gram_keys(text: str) -> np.ndarray:
    """All 1/2/3-gram int64 keys of one text (positions i..i+n-1 packed as
    ``pad*(3-n) + codepoints``, big-endian within the key)."""
    cps = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)
    m = len(cps)
    if m == 0:
        return np.empty(0, dtype=np.int64)
    pad2 = np.int64(_PAD) << (2 * _BITS)
    pad1 = np.int64(_PAD) << (2 * _BITS)  # for 2-grams only the top slot pads
    out = [pad2 | (np.int64(_PAD) << _BITS) | cps]
    if m >= 2:
        out.append(pad1 | (cps[:-1] << _BITS) | cps[1:])
    if m >= 3:
        out.append((cps[:-2] << (2 * _BITS)) | (cps[1:-1] << _BITS) | cps[2:])
    return np.concatenate(out)


def key_to_gram(key: int) -> str:
    """Inverse of :func:`gram_keys` packing (for the readable profile table)."""
    parts = [(key >> (2 * _BITS)) & _PAD, (key >> _BITS) & _PAD, key & _PAD]
    return "".join(chr(p) for p in parts if p != _PAD)


def _gram_len(keys: np.ndarray) -> np.ndarray:
    """Character length of each packed gram (how many non-pad slots)."""
    top = (keys >> (2 * _BITS)) & _PAD
    mid = (keys >> _BITS) & _PAD
    return 3 - (top == _PAD).astype(np.int64) - (mid == _PAD).astype(np.int64)


def _batch_gram_counts(
    texts: list, extra: np.ndarray | None = None
) -> tuple[np.ndarray, np.ndarray, np.ndarray | None]:
    """Vectorized (key, count[, owner]) triples for one batch of texts.

    ``extra`` attaches an owner id per text (doc id or lang code) so the
    pandas groupby collapses duplicates per owner before anything leaves the
    batch."""
    keys_parts = []
    owner_parts = []
    for i, t in enumerate(texts):
        k = gram_keys(t or "")
        if len(k) == 0:
            continue
        keys_parts.append(k)
        if extra is not None:
            owner_parts.append(np.full(len(k), extra[i], dtype=np.int64))
    if not keys_parts:
        return (
            np.empty(0, np.int64),
            np.empty(0, np.int64),
            np.empty(0, np.int64) if extra is not None else None,
        )
    keys = np.concatenate(keys_parts)
    if extra is None:
        df = pd.DataFrame({"k": keys})
        agg = df.groupby("k", sort=False).size().reset_index(name="c")
        return agg["k"].to_numpy(), agg["c"].to_numpy(np.int64), None
    owners = np.concatenate(owner_parts)
    df = pd.DataFrame({"o": owners, "k": keys})
    agg = df.groupby(["o", "k"], sort=False).size().reset_index(name="c")
    return agg["k"].to_numpy(), agg["c"].to_numpy(np.int64), agg["o"].to_numpy()


def _rank_topk(keys: np.ndarray, counts: np.ndarray, k: int) -> dict[int, int]:
    """Total-order rank 0..k-1: count desc, gram length asc, gram (key within
    length == codepoint order) asc. Returns key → rank for the top k."""
    lens = _gram_len(keys)
    order = np.lexsort((keys, lens, -counts))[:k]
    return {int(keys[i]): r for r, i in enumerate(order)}


def train_ngram_lid(
    ds: ray.data.Dataset,
    text_column: str = "text",
    label_column: str = "lang",
    top_k: int = 200,
) -> pa.Table:
    """Distributed profile training → tiny ``(lang, gram, rank)`` table.

    One corpus pass of vectorized gram counting (per-batch partials), one
    grouped sum, a distributed per-language top-K prune; only L×K rows reach
    the driver for final ranking.
    """
    from ..functions.aggregates import grouped_sums, top_n_per_group

    def partial(batch: pa.Table) -> pa.Table:
        langs = batch[label_column].to_pylist()
        # dictionary-encode langs to int for the vectorized groupby
        uniq = sorted(set(langs))
        code = {l: i for i, l in enumerate(uniq)}
        owner = np.array([code[l] for l in langs], dtype=np.int64)
        keys, counts, owners = _batch_gram_counts(
            batch[text_column].to_pylist(), owner
        )
        inv = {i: l for l, i in code.items()}
        return pa.table(
            {
                "lang": pa.array([inv[int(o)] for o in owners], pa.string()),
                "key": pa.array(keys, pa.int64()),
                "c": pa.array(counts, pa.int64()),
            }
        )

    sums = grouped_sums(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["lang", "key"],
        ["c"],
        count_alias=None,
    )

    def with_len(t: pa.Table) -> pa.Table:
        keys = t["key"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "lang": t["lang"],
                "key": t["key"],
                "c": pa.compute.cast(t["sum_c"], pa.int64()),
                "glen": pa.array(_gram_len(keys), pa.int64()),
            }
        )

    cand = top_n_per_group(
        sums.map_batches(with_len, batch_format="pyarrow", batch_size=None),
        ["lang"],
        ["c", "glen", "key"],
        top_k,
        descending=[True, False, False],
        num_buckets=8,
        anchor=pa.schema(
            [("lang", pa.string()), ("key", pa.int64()),
             ("c", pa.int64()), ("glen", pa.int64())]
        ),
    )
    prof = cand.to_pandas()  # L × K rows — dimension-sized
    rows = {"lang": [], "gram": [], "key": [], "rank": []}
    for lang, sub in prof.groupby("lang", sort=True):
        ranks = _rank_topk(
            sub["key"].to_numpy(np.int64), sub["c"].to_numpy(np.int64), top_k
        )
        for key, r in sorted(ranks.items(), key=lambda kv: kv[1]):
            rows["lang"].append(lang)
            rows["gram"].append(key_to_gram(key))
            rows["key"].append(key)
            rows["rank"].append(r)
    return pa.table(
        {
            "lang": pa.array(rows["lang"], pa.string()),
            "gram": pa.array(rows["gram"], pa.string()),
            "key": pa.array(rows["key"], pa.int64()),
            "rank": pa.array(rows["rank"], pa.int64()),
        }
    )


class NgramLanguageClassifier:
    """Actor-pool stage: out-of-place distance against trained profiles.

    ``profiles`` is the table from :func:`train_ngram_lid` (passed through
    the constructor — L×K rows, tiny). Docs whose text yields no grams are
    dropped (no profile to score). Output adds ``pred_{label}`` and
    ``dist`` (int64) columns.
    """

    def __init__(
        self,
        profiles: pa.Table | dict,
        text_column: str = "text",
        id_column: str = "doc_id",
        top_k: int = 200,
        pred_column: str = "pred_lang",
    ):
        if isinstance(profiles, pa.Table):
            langs = profiles["lang"].to_pylist()
            keys = profiles["key"].to_pylist()
            ranks = profiles["rank"].to_pylist()
            table: dict[str, dict[int, int]] = {}
            for l, k, r in zip(langs, keys, ranks):
                table.setdefault(l, {})[int(k)] = int(r)
            profiles = table
        # per language: (sorted key array, aligned rank array) for the
        # vectorized searchsorted match in __call__
        self.profiles: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        for l in sorted(profiles):
            ks = np.array(sorted(profiles[l]), dtype=np.int64)
            rs = np.array([profiles[l][int(x)] for x in ks], dtype=np.int64)
            self.profiles[l] = (ks, rs)
        self.text_column = text_column
        self.id_column = id_column
        self.top_k = top_k
        self.pred_column = pred_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_column].to_pylist()
        ids = batch[self.id_column].to_numpy(zero_copy_only=False)
        out_ids, out_pred, out_dist = [], [], []
        k = self.top_k
        for i, t in enumerate(texts):
            keys = gram_keys(t or "")
            if len(keys) == 0:
                continue
            uk, counts = np.unique(keys, return_counts=True)
            lens = _gram_len(uk)
            order = np.lexsort((uk, lens, -counts))[:k]
            doc_keys = uk[order]
            doc_rank = np.arange(len(order), dtype=np.int64)
            best_lang, best_dist = None, None
            for lang, (pk, pr) in self.profiles.items():
                if len(pk) == 0:
                    d = k * len(doc_keys)
                    if best_dist is None or d < best_dist:
                        best_lang, best_dist = lang, d
                    continue
                idx = np.searchsorted(pk, doc_keys)
                idx_c = np.clip(idx, 0, len(pk) - 1)
                found = pk[idx_c] == doc_keys
                d = int(
                    np.abs(doc_rank[found] - pr[idx_c[found]]).sum()
                    + k * int((~found).sum())
                )
                if best_dist is None or d < best_dist:
                    best_lang, best_dist = lang, d
            out_ids.append(ids[i])
            out_pred.append(best_lang)
            out_dist.append(best_dist)
        return pa.table(
            {
                self.id_column: pa.array(out_ids, batch[self.id_column].type),
                self.pred_column: pa.array(out_pred, pa.string()),
                "dist": pa.array(out_dist, pa.int64()),
            }
        )
