"""LayoutLM feature mapper: piece/word alignment, box grid, windows
(kernels/layoutlm.py; reference laylmstruct.py:79-667 semantics)."""

from __future__ import annotations

import numpy as np

from deepdoctection_ray.kernels.layoutlm import (
    CLS_BOX,
    PAD_BOX,
    SEP_BOX,
    layoutlm_features,
    normalize_boxes,
    wordpiece,
)


def test_wordpiece_chunks_and_continuations():
    assert wordpiece("cat") == ["cat"]
    assert wordpiece("shuffling") == ["shuf", "##flin", "##g"]
    assert wordpiece("a1-b") == ["a", "##1", "##-", "##b"]
    assert wordpiece("") == ["[UNK]"]


def test_normalize_boxes_grid():
    out = normalize_boxes(np.array([[0.0, 0.0, 300.0, 200.0]]), 600.0, 400.0)
    assert out.tolist() == [[0, 0, 500, 500]]


def test_single_window_alignment():
    words = ["hello", "world"]
    boxes = np.array([[0.0, 0.0, 60.0, 40.0], [60.0, 0.0, 120.0, 40.0]])
    wins = layoutlm_features(words, boxes, 600.0, 400.0, max_length=8)
    assert len(wins) == 1
    w = wins[0]
    assert w["tokens"] == ["[CLS]", "hell", "##o", "worl", "##d", "[SEP]", "[PAD]", "[PAD]"]
    assert w["word_ids"] == [-1, 0, 0, 1, 1, -1, -1, -1]
    assert tuple(w["bbox"][0]) == CLS_BOX
    assert tuple(w["bbox"][5]) == SEP_BOX
    assert tuple(w["bbox"][6]) == PAD_BOX
    # both pieces of a word share the word's box
    assert (w["bbox"][1] == w["bbox"][2]).all()
    assert w["attention_mask"] == [1] * 6 + [0, 0]


def test_sliding_windows_cover_tail_exactly():
    words = [f"w{i}" for i in range(20)]  # one piece each... w10 -> 'w' '##10'? no: 'w10' runs: ['w','10'] = 2 pieces
    boxes = np.tile(np.array([[0.0, 0.0, 10.0, 10.0]]), (20, 1))
    wins = layoutlm_features(words, boxes, 100.0, 100.0, max_length=12, sliding_window_stride=4)
    n_pieces = sum(len(wordpiece(w)) for w in words)
    budget = 10
    assert len(wins) > 1
    # every window exactly max_length long; last window ends at the final piece
    for w in wins:
        assert len(w["tokens"]) == 12
    content_counts = [sum(1 for t in w["word_ids"] if t >= 0) for w in wins]
    assert all(c <= budget for c in content_counts)
    # union of covered pieces == all pieces (stride windows overlap, no gap)
    covered = set()
    starts = []
    for w in wins:
        ids = [t for t in w["word_ids"] if t >= 0]
        starts.append(ids[0])
        covered.update(ids)
    assert covered == set(range(20))
    assert n_pieces >= budget  # sanity: windows were actually needed
