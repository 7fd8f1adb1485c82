"""LayoutLM featurization as an actor-pool stage.

The Ray analog of the reference's ``LayoutLMDataCollator`` /
``image_to_layoutlm_features`` path (``dd_core/mapper/laylmstruct.py:424-667``
feeding ``pipe/lm.py:41-285``): a pdfish word-layer payload becomes one row
PER SLIDING WINDOW, each carrying aligned token/box tensors as list columns —
the exact input an HF LayoutLM forward pass consumes batched. Windowing
params live in ``__init__`` (once per actor).
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa

from ..kernels.layoutlm import layoutlm_features


class LayoutLMFeaturizer:
    def __init__(
        self,
        text_column: str = "text",
        max_length: int = 512,
        sliding_window_stride: int = 128,
    ) -> None:
        self._text_column = text_column
        self._max_length = max_length
        self._stride = sliding_window_stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        keep_cols = [c for c in batch.column_names if c != self._text_column]
        out_rows: dict[str, list] = {c: [] for c in keep_cols}
        win_idx: list[int] = []
        n_pieces: list[int] = []
        input_ids: list[list[int]] = []
        bboxes: list[list[int]] = []
        attn: list[list[int]] = []
        word_ids: list[list[int]] = []
        payloads = batch[self._text_column].to_pylist()
        for r, payload in enumerate(payloads):
            doc = json.loads(payload)
            page = doc.get("page") or {}
            words_raw = doc.get("words") or []
            words = [w["text"] for w in words_raw]
            boxes = np.array(
                [[w["x0"], w["top"], w["x1"], w["bottom"]] for w in words_raw], dtype=np.float64
            ).reshape(-1, 4)
            windows = layoutlm_features(
                words,
                boxes,
                float(page.get("width", 612.0)),
                float(page.get("height", 792.0)),
                max_length=self._max_length,
                sliding_window_stride=self._stride,
            )
            total_pieces = _count_pieces(words)
            for k, win in enumerate(windows):
                for c in keep_cols:
                    out_rows[c].append(batch[c][r].as_py())
                win_idx.append(k)
                n_pieces.append(total_pieces)
                input_ids.append(win["input_ids"])
                bboxes.append(win["bbox"].reshape(-1).tolist())
                attn.append(win["attention_mask"])
                word_ids.append(win["word_ids"])
        cols = {c: pa.array(out_rows[c]) for c in keep_cols}
        cols["window_idx"] = pa.array(win_idx, pa.int32())
        cols["n_word_pieces"] = pa.array(n_pieces, pa.int64())
        cols["input_ids"] = pa.array(input_ids, pa.list_(pa.int32()))
        cols["bbox"] = pa.array(bboxes, pa.list_(pa.int32()))
        cols["attention_mask"] = pa.array(attn, pa.list_(pa.int8()))
        cols["word_ids"] = pa.array(word_ids, pa.list_(pa.int32()))
        return pa.table(cols)


def _count_pieces(words: list[str]) -> int:
    from ..kernels.layoutlm import wordpiece

    return sum(len(wordpiece(w)) for w in words)
