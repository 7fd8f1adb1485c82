"""Trained multinomial Naive Bayes document classifier (hashed features).

The reference's ``LMSequenceClassifierService`` (``pipe/lm.py``,
``extern/hflm.py``) wraps a fine-tuned transformer — no weights exist in this
sandbox, so ``stages/classify.py`` ships a rule stand-in for the service
contract. This module adds the genuinely TRAINED statistical counterpart:
a multinomial Naive Bayes classifier over hashed bag-of-words features (the
fastText-style linear classifier LLM curation pipelines train for
quality/domain filtering — CCNet, LLaMA use exactly this shape). Training is
pure distributed integer counting and inference is a log-space dot product,
so both rebuild in SQL (the driver-hash oracle ``q_nb_classify``).

Design (100-TB shape):

- **fixed-size model, regardless of corpus size.** Tokens hash into
  ``num_buckets`` feature buckets (md5 prefix — the repo-wide SQL-matching
  convention, see ``split_by_hash``), so the trained model is exactly
  ``L × (num_buckets + 1)`` counts however large the corpus: broadcast-safe,
  never a vocab-sized join. This is the fastText hashing-trick layout.
- **training is one counting pass.** Per-batch pyarrow/pandas partials
  collapse duplicate ``(label, bucket)`` pairs before the exchange
  (the :func:`~..functions.aggregates.grouped_sums` combiner pattern); one
  grouped sum follows; the driver sees only the fixed-size model.
- **per-batch md5 work is per DISTINCT token** (same trick as
  ``kernels/grams.py``): hash once per unique token per batch, scatter via
  inverse indices.
- **classification is an actor-pool stage.** The model (a dense
  ``num_buckets × L`` log-prob matrix) builds once per actor in
  ``__init__``; each batch explodes tokens, maps them through the cached
  per-batch distinct-token hash, and scores every class with one
  ``np.add.at`` scatter — no Python loop over tokens.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

__all__ = [
    "train_naive_bayes",
    "NaiveBayesClassifier",
    "token_buckets",
    "train_token_nb",
    "TokenNBClassifier",
]


def _tokens(text: str) -> list[str]:
    """Single-space split, empties dropped — matches the SQL oracle's
    ``string_split(text, ' ') ... WHERE tok <> ''`` exactly."""
    return [t for t in (text or "").split(" ") if t]


def token_buckets(tokens: np.ndarray, num_buckets: int) -> np.ndarray:
    """md5-prefix bucket per token, hashed once per DISTINCT token.

    SQL equivalent: ``('0x' || substr(md5(tok), 1, 8))::UBIGINT % B``.
    """
    uniq, inv = np.unique(tokens, return_inverse=True)
    ub = np.fromiter(
        (
            int(hashlib.md5(t.encode("utf-8")).hexdigest()[:8], 16) % num_buckets
            for t in uniq
        ),
        dtype=np.int64,
        count=len(uniq),
    )
    return ub[inv]


def _explode(texts: list) -> tuple[np.ndarray, np.ndarray]:
    """All tokens of a batch + the row index each came from."""
    toks, rows = [], []
    for i, t in enumerate(texts):
        tt = _tokens(t)
        if tt:
            toks.append(np.asarray(tt, dtype=object))
            rows.append(np.full(len(tt), i, dtype=np.int64))
    if not toks:
        return np.empty(0, dtype=object), np.empty(0, dtype=np.int64)
    return np.concatenate(toks), np.concatenate(rows)


def _empty_model() -> pa.Table:
    return pa.table(
        {
            "label": pa.array([], pa.string()),
            "bucket": pa.array([], pa.int64()),
            "c": pa.array([], pa.int64()),
        }
    )


def train_naive_bayes(
    ds: ray.data.Dataset,
    text_column: str = "text",
    label_column: str = "lang",
    num_buckets: int = 4096,
) -> pa.Table:
    """One distributed counting pass → fixed-size ``(label, bucket, c)`` model.

    Rows with ``bucket == -1`` carry the per-label DOCUMENT count (the prior);
    all other rows are per-``(label, bucket)`` token counts. Output size is
    bounded by ``L × (num_buckets + 1)`` whatever the corpus size.
    """
    from ..functions.aggregates import grouped_sums

    def partial(batch: pa.Table) -> pa.Table:
        labels = np.asarray(batch[label_column].to_pylist(), dtype=object)
        toks, rows = _explode(batch[text_column].to_pylist())
        if len(toks):
            buckets = token_buckets(toks, num_buckets)
            tok_lab = labels[rows]
        else:
            buckets = np.empty(0, np.int64)
            tok_lab = np.empty(0, dtype=object)
        df = pd.DataFrame(
            {
                "label": np.concatenate([tok_lab, labels]),
                "bucket": np.concatenate(
                    [buckets, np.full(len(labels), -1, dtype=np.int64)]
                ),
            }
        )
        agg = df.groupby(["label", "bucket"], sort=False).size().reset_index(name="c")
        return pa.table(
            {
                "label": pa.array(agg["label"], pa.string()),
                "bucket": pa.array(agg["bucket"], pa.int64()),
                "c": pa.array(agg["c"], pa.int64()),
            }
        )

    sums = grouped_sums(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["label", "bucket"],
        ["c"],
        count_alias=None,
    )

    def rename(t: pa.Table) -> pa.Table:
        return pa.table(
            {"label": t["label"], "bucket": t["bucket"],
             "c": pa.compute.cast(t["sum_c"], pa.int64())}
        )

    model = sums.map_batches(rename, batch_format="pyarrow")
    out = model.to_pandas()  # ≤ L × (num_buckets + 1) rows — model-sized
    if out.empty:
        # zero-row corpus: Ray loses the aggregate's schema — typed empty model
        return _empty_model()
    out = out.sort_values(["label", "bucket"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


class NaiveBayesClassifier:
    """Actor-pool stage: multinomial NB scoring against a trained model.

    ``score(d, c) = ln(docs_c / total_docs)
                    + Σ_t ln(count(bucket_t, c) + 1)
                    − n_tokens(d) · ln(tok_total_c + B)``

    (add-one smoothing over the B hashed buckets — summed in exactly the
    grouping the SQL oracle uses so float error stays ~1e-12). Docs with no
    tokens are dropped. Output: ``(id, pred, score)`` with the argmax broken
    by label ascending.
    """

    def __init__(
        self,
        model: pa.Table,
        text_column: str = "text",
        id_column: str = "doc_id",
        num_buckets: int = 4096,
        pred_column: str = "pred",
    ):
        df = model.to_pandas() if isinstance(model, pa.Table) else model
        self.labels = sorted(df["label"].unique())
        lidx = {l: i for i, l in enumerate(self.labels)}
        L = len(self.labels)
        counts = np.zeros((num_buckets, L), dtype=np.float64)
        docs = np.zeros(L, dtype=np.float64)
        for label, bucket, c in zip(df["label"], df["bucket"], df["c"]):
            if bucket < 0:
                docs[lidx[label]] = c
            else:
                counts[int(bucket), lidx[label]] = c
        total_docs = docs.sum()
        self.prior = np.log(docs / total_docs)
        self.log1c = np.log(counts + 1.0)  # ln(count+1) per (bucket, label)
        self.log_denom = np.log(counts.sum(axis=0) + float(num_buckets))
        self.num_buckets = num_buckets
        self.text_column = text_column
        self.id_column = id_column
        self.pred_column = pred_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks, rows = _explode(batch[self.text_column].to_pylist())
        ids = batch[self.id_column]
        if len(toks) == 0 or not self.labels:
            return pa.table(
                {
                    self.id_column: pa.array([], ids.type),
                    self.pred_column: pa.array([], pa.string()),
                    "score": pa.array([], pa.float64()),
                }
            )
        buckets = token_buckets(toks, self.num_buckets)
        n = len(batch)
        L = len(self.labels)
        sum_log = np.zeros((n, L), dtype=np.float64)
        np.add.at(sum_log, rows, self.log1c[buckets])
        n_tok = np.bincount(rows, minlength=n).astype(np.float64)
        scores = self.prior[None, :] + sum_log - n_tok[:, None] * self.log_denom[None, :]
        keep = n_tok > 0
        best = np.argmax(scores, axis=1)  # np.argmax takes the FIRST max:
        # labels are sorted ascending, so ties already break label-asc
        kidx = np.nonzero(keep)[0]
        return pa.table(
            {
                self.id_column: ids.take(pa.array(kidx, pa.int64())),
                self.pred_column: pa.array(
                    [self.labels[b] for b in best[kidx]], pa.string()
                ),
                "score": pa.array(
                    np.round(scores[kidx, best[kidx]], 6), pa.float64()
                ),
            }
        )


# --------------------------------------------------------------------------
# Token-level classifier (LMTokenClassifierService analog, genuinely trained)
# --------------------------------------------------------------------------

_TEMPLATES = ("0:", "1:", "2:")  # cur / prev / next feature prefixes
_BOS, _EOS = "^", "$"


def _token_features(texts: list) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Explode a batch of space-joined token streams into per-position
    context features.

    Returns ``(features, row_idx, pos)``: for every token position, THREE
    template-prefixed feature strings (``0:cur``, ``1:prev``, ``2:next``
    with ``^``/``$`` sentinels at sequence edges), the batch row each
    belongs to, and the 1-based position within its document (matching the
    SQL oracle's list indexing)."""
    feats, rows, poss = [], [], []
    for i, t in enumerate(texts):
        toks = [x for x in (t or "").split(" ") if x]
        if not toks:
            continue
        n = len(toks)
        cur = np.asarray(toks, dtype=object)
        prev = np.concatenate([[_BOS], cur[:-1]])
        nxt = np.concatenate([cur[1:], [_EOS]])
        f = np.concatenate(
            [
                np.char.add("0:", cur.astype(str)).astype(object),
                np.char.add("1:", prev.astype(str)).astype(object),
                np.char.add("2:", nxt.astype(str)).astype(object),
            ]
        )
        feats.append(f)
        rows.append(np.full(3 * n, i, dtype=np.int64))
        poss.append(np.tile(np.arange(1, n + 1, dtype=np.int64), 3))
    if not feats:
        e = np.empty(0, dtype=object)
        z = np.empty(0, dtype=np.int64)
        return e, z, z
    return np.concatenate(feats), np.concatenate(rows), np.concatenate(poss)


def train_token_nb(
    ds: ray.data.Dataset,
    text_column: str = "text",
    labels_column: str = "labels",
    num_buckets: int = 4096,
) -> pa.Table:
    """Train the contextual token NB: one distributed counting pass over
    ``(label, feature-bucket)`` pairs (every token contributes its 3 context
    features), plus per-label token counts for the prior (``bucket == -1``
    rows). Fixed ``L × (num_buckets + 1)`` output — broadcast-safe."""
    from ..functions.aggregates import grouped_sums

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch[text_column].to_pylist()
        labs = batch[labels_column].to_pylist()
        feats, rows, poss = _token_features(texts)
        # align labels with the exploded features: label of position p of row r
        lab_lists = [
            [x for x in (l or "").split(" ") if x] for l in labs
        ]
        if len(feats):
            f_lab = np.asarray(
                [lab_lists[r][p - 1] for r, p in zip(rows, poss)], dtype=object
            )
            buckets = token_buckets(feats, num_buckets)
        else:
            f_lab = np.empty(0, dtype=object)
            buckets = np.empty(0, np.int64)
        # priors: one count per TOKEN (not per feature) per label
        tok_labs = np.concatenate([np.asarray(x, dtype=object) for x in lab_lists if x]) \
            if any(lab_lists) else np.empty(0, dtype=object)
        df = pd.DataFrame(
            {
                "label": np.concatenate([f_lab, tok_labs]),
                "bucket": np.concatenate(
                    [buckets, np.full(len(tok_labs), -1, dtype=np.int64)]
                ),
            }
        )
        agg = df.groupby(["label", "bucket"], sort=False).size().reset_index(name="c")
        return pa.table(
            {
                "label": pa.array(agg["label"], pa.string()),
                "bucket": pa.array(agg["bucket"], pa.int64()),
                "c": pa.array(agg["c"], pa.int64()),
            }
        )

    sums = grouped_sums(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["label", "bucket"],
        ["c"],
        count_alias=None,
    )

    def rename(t: pa.Table) -> pa.Table:
        return pa.table(
            {"label": t["label"], "bucket": t["bucket"],
             "c": pa.compute.cast(t["sum_c"], pa.int64())}
        )

    out = sums.map_batches(rename, batch_format="pyarrow").to_pandas()
    if out.empty:
        return _empty_model()
    out = out.sort_values(["label", "bucket"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


class TokenNBClassifier:
    """Actor-pool stage: per-token contextual NB scoring.

    ``score(pos, c) = ln(tokens_c / total_tokens)
                      + Σ_{3 features} ln(count(bucket, c) + 1)
                      − 3 · ln(feat_total_c + B)``

    Output: one ``(id, pos, pred, score)`` row per token position (1-based
    ``pos``, matching DuckDB list indexing in the oracle). Argmax ties break
    label-ascending."""

    def __init__(
        self,
        model: pa.Table,
        text_column: str = "text",
        id_column: str = "doc_id",
        num_buckets: int = 4096,
        pred_column: str = "pred",
    ):
        df = model.to_pandas() if isinstance(model, pa.Table) else model
        self.labels = sorted(df["label"].unique())
        lidx = {l: i for i, l in enumerate(self.labels)}
        L = len(self.labels)
        counts = np.zeros((num_buckets, L), dtype=np.float64)
        toks = np.zeros(L, dtype=np.float64)
        for label, bucket, c in zip(df["label"], df["bucket"], df["c"]):
            if bucket < 0:
                toks[lidx[label]] = c
            else:
                counts[int(bucket), lidx[label]] = c
        self.prior = np.log(toks / toks.sum())
        self.log1c = np.log(counts + 1.0)
        self.log_denom = np.log(counts.sum(axis=0) + float(num_buckets))
        self.num_buckets = num_buckets
        self.text_column = text_column
        self.id_column = id_column
        self.pred_column = pred_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_column].to_pylist()
        ids_np = batch[self.id_column].to_numpy(zero_copy_only=False)
        feats, rows, poss = _token_features(texts)
        if len(feats) == 0 or not self.labels:
            return pa.table(
                {
                    self.id_column: pa.array([], batch[self.id_column].type),
                    "pos": pa.array([], pa.int64()),
                    self.pred_column: pa.array([], pa.string()),
                    "score": pa.array([], pa.float64()),
                }
            )
        buckets = token_buckets(feats, self.num_buckets)
        # one output slot per (row, pos): dense-index the token positions
        key = rows * (1 + int(poss.max())) + poss
        uniq_key, slot = np.unique(key, return_inverse=True)
        n_slots = len(uniq_key)
        L = len(self.labels)
        sum_log = np.zeros((n_slots, L), dtype=np.float64)
        np.add.at(sum_log, slot, self.log1c[buckets])
        scores = self.prior[None, :] + sum_log - 3.0 * self.log_denom[None, :]
        best = np.argmax(scores, axis=1)  # first max == label-asc tie-break
        out_rows = (uniq_key // (1 + int(poss.max()))).astype(np.int64)
        out_pos = (uniq_key % (1 + int(poss.max()))).astype(np.int64)
        return pa.table(
            {
                self.id_column: pa.array(
                    ids_np[out_rows], batch[self.id_column].type
                ),
                "pos": pa.array(out_pos, pa.int64()),
                self.pred_column: pa.array(
                    [self.labels[b] for b in best], pa.string()
                ),
                "score": pa.array(
                    np.round(scores[np.arange(n_slots), best], 6), pa.float64()
                ),
            }
        )
