"""LayoutLM feature mapping: word-box → token alignment with sliding windows.

Re-expression of ``image_to_layoutlm_features`` / sliding windows
(``dd_core/src/dd_core/mapper/laylmstruct.py:79-667``) without the HF
tokenizer (no model assets in this environment): a deterministic word-piece
rule stands in for the vocabulary — the HARD, public part (token→word
alignment, 0-1000 box normalization, [CLS]/[SEP]/[PAD] box conventions,
stride-overlapped window construction for >max_length sequences) is rebuilt
faithfully. Drop an HF fast tokenizer into :func:`wordpiece` to upgrade.

Conventions mirrored from the reference:
- boxes scale to a 1000×1000 grid (``laylmstruct.py:82-85``);
- `[CLS]` box = [0,0,1000,1000], `[SEP]` = [1000,1000,1000,1000], `[PAD]` =
  [0,0,0,0] (``laylmstruct.py:74-75``);
- window k covers content tokens ``[k*stride, k*stride + max_length-2)``
  with `[CLS]`/`[SEP]` re-added per window and the last window padded
  (``_tokenize_with_sliding_window``, ``laylmstruct.py:238-420``).
"""

from __future__ import annotations

import re

import numpy as np

from .ids import stable_int

CLS, SEP, PAD, UNK = "[CLS]", "[SEP]", "[PAD]", "[UNK]"
CLS_BOX = (0, 0, 1000, 1000)
SEP_BOX = (1000, 1000, 1000, 1000)
PAD_BOX = (0, 0, 0, 0)
VOCAB_SIZE = 30_522  # bert-base vocab cardinality; ids here are stable hashes
_PIECE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
_CHUNK = 4


def wordpiece(word: str) -> list[str]:
    """Deterministic word-piece stand-in: alpha/digit/punct runs, long runs
    chunked to 4 chars with '##' continuation markers (BERT convention)."""
    pieces: list[str] = []
    for run in _PIECE_RE.findall(word):
        for i in range(0, len(run), _CHUNK):
            chunk = run[i : i + _CHUNK]
            pieces.append(("##" + chunk) if pieces else chunk)
    return pieces or [UNK]


def token_id(token: str) -> int:
    special = {CLS: 101, SEP: 102, PAD: 0, UNK: 100}
    if token in special:
        return special[token]
    return 1000 + stable_int(token) % (VOCAB_SIZE - 1000)


def normalize_boxes(boxes: np.ndarray, width: float, height: float) -> np.ndarray:
    """Word boxes → int 0-1000 grid (``laylmstruct.py:82-85``)."""
    out = boxes.astype(np.float64).copy()
    out[:, [0, 2]] *= 1000.0 / max(width, 1e-9)
    out[:, [1, 3]] *= 1000.0 / max(height, 1e-9)
    return np.clip(np.round(out), 0, 1000).astype(np.int64)


def layoutlm_features(
    words: list[str],
    boxes: np.ndarray,
    width: float,
    height: float,
    max_length: int = 512,
    sliding_window_stride: int = 128,
) -> list[dict]:
    """Word list + boxes → one feature dict per window.

    Each window: ``tokens``, ``input_ids``, ``bbox`` ([max_length, 4] int,
    normalized grid), ``word_ids`` (-1 for specials/padding), and
    ``attention_mask`` — all exactly ``max_length`` long.
    """
    norm = normalize_boxes(boxes, width, height) if len(words) else np.zeros((0, 4), np.int64)
    tokens: list[str] = []
    word_ids: list[int] = []
    for wi, word in enumerate(words):
        for piece in wordpiece(word):
            tokens.append(piece)
            word_ids.append(wi)

    budget = max_length - 2  # room for [CLS] and [SEP]
    if len(tokens) <= budget:
        starts = [0]
    else:
        stride = sliding_window_stride or budget
        starts = list(range(0, len(tokens) - budget + stride, stride))
        # clamp the final window so it ends exactly at the last token
        starts = sorted({min(s, max(len(tokens) - budget, 0)) for s in starts})

    windows = []
    for s in starts:
        chunk = tokens[s : s + budget]
        chunk_words = word_ids[s : s + budget]
        w_tokens = [CLS] + chunk + [SEP]
        w_word_ids = [-1] + chunk_words + [-1]
        w_boxes = [CLS_BOX] + [tuple(norm[wi]) for wi in chunk_words] + [SEP_BOX]
        attn = [1] * len(w_tokens)
        pad = max_length - len(w_tokens)
        w_tokens += [PAD] * pad
        w_word_ids += [-1] * pad
        w_boxes += [PAD_BOX] * pad
        attn += [0] * pad
        windows.append(
            {
                "tokens": w_tokens,
                "input_ids": [token_id(t) for t in w_tokens],
                "word_ids": w_word_ids,
                "bbox": np.array(w_boxes, dtype=np.int64),
                "attention_mask": attn,
            }
        )
    return windows
