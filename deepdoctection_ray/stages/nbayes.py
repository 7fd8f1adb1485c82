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

__all__ = ["train_naive_bayes", "NaiveBayesClassifier", "token_buckets"]


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
        if len(toks) == 0:
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
