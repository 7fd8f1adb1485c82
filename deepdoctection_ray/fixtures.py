"""Deterministic fixture + golden tables backing the oracle SQL of queries
whose inputs are synthesized (transcripts, layout docs, table docs) or whose
semantics need seeded near-duplicates (embedding dedup).

Two kinds of parquet land under ``FIXTURE_DIR``:

- *input fixtures* (``table_docs``, ``layout_docs``, ``transcripts`` via
  :func:`deepdoctection_ray.synth.write_transcripts`, ``neardup_vecs``):
  regenerated from fixed seeds, identical bytes every run. The oracle SQL
  reads them with ``read_parquet('<path>')`` and re-derives the expected
  result independently (e.g. table segmentation from the construction truth
  embedded in cell texts).
- *golden outputs* (``golden_turns``, ``golden_layout``, ``golden_doc_type``):
  produced by running the SINGLE-THREADED kernel over the input fixture on
  one thread with no Ray. The extraction kernel itself is independently
  fuzz-verified against the reference implementation
  (``tests/test_reference_parity.py``, 0/1000 mismatches), so a golden-backed
  oracle checks what SQL cannot express — that the distributed plumbing
  (shuffles, actor pools, ordering restoration, dead-lettering) reproduces
  the single-threaded result exactly.

Both ``queries()`` and ``oracle_sql()`` call :func:`ensure_fixtures`;
whichever the driver invokes first pays the (sub-second) generation cost.
Generation needs NO Ray session.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

FIXTURE_DIR = "/tmp/ddray_fixtures"
_VERSION = 19

TRANSCRIPTS_DIR = "/tmp/ddray_transcripts_small"
N_CONVS, SEED, HOT = 60, 42, 10
N_LAYOUT, N_TABLE, N_PUBTABLES, N_PDFS, N_LINKS = 300, 200, 150, 40, 150
N_SUBIMG = 120


def path(name: str) -> str:
    return os.path.join(FIXTURE_DIR, f"{name}.parquet")


def make_neardup_vecs(dim: int = 64, n_base: int = 20, seed: int = 123) -> pa.Table:
    """Seeded unit vectors with one near-duplicate each (cosine ~0.96-0.99), so
    the embedding-dedup query returns a non-vacuous, known pair set.
    vec_ids start at 1_000_000 to stay clear of the sf tables' ids."""
    rng = np.random.RandomState(seed)
    base = rng.standard_normal((n_base, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    noisy = base + 0.03 * rng.standard_normal((n_base, dim))
    noisy /= np.linalg.norm(noisy, axis=1, keepdims=True)
    vecs = np.concatenate([base, noisy]).astype(np.float32)
    ids = np.concatenate(
        [np.arange(n_base), np.arange(n_base) + n_base]
    ) + 1_000_000
    return pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs], pa.list_(pa.float32())),
            "label": pa.array([0] * (2 * n_base), pa.int32()),
        }
    )


def _golden_turns(transcripts: pa.Table) -> pa.Table:
    """Single-threaded golden extraction of the transcript fixture (one
    ``extract_turn`` call per row, no Ray) — includes ``role`` so the
    conversation-assembly oracle can re-derive role prefixes in SQL."""
    from .kernels.extract import extract_turn

    rows = sorted(
        zip(
            transcripts["conv_id"].to_pylist(),
            transcripts["turn_idx"].to_pylist(),
            transcripts["role"].to_pylist(),
            transcripts["text"].to_pylist(),
        )
    )
    conv, tix, role, kind, text = [], [], [], [], []
    for cid, t, r, payload in rows:
        res = extract_turn(payload)
        conv.append(cid)
        tix.append(t)
        role.append(r)
        kind.append(res["payload_kind"])
        text.append(res["extracted_text"])
    return pa.table(
        {
            "conv_id": pa.array(conv, pa.string()),
            "turn_idx": pa.array(tix, pa.int32()),
            "role": pa.array(role, pa.string()),
            "payload_kind": pa.array(kind, pa.string()),
            "extracted_text": pa.array(text, pa.string()),
        }
    )


N_BPE_MERGES = 160


def _write_bpe_goldens(corpus: pa.Table) -> None:
    """Golden BPE artifacts via the NAIVE recount-per-round trainer (the
    independent implementation — the distributed path trains through the
    incremental loop, so merge-list equality pins both the plumbing and the
    algorithm) plus the single-threaded greedy encode of every doc."""
    import hashlib
    from collections import Counter

    from .stages.bpe import _pretokenize, encode_word, train_bpe_naive

    counts: Counter = Counter()
    texts = corpus["text"].to_pylist()
    for t in texts:
        counts.update(_pretokenize(t, False))
    merges = train_bpe_naive(dict(counts), N_BPE_MERGES)
    pq.write_table(
        pa.table(
            {
                "rank": pa.array(range(len(merges)), pa.int64()),
                "lhs": pa.array([a for a, _ in merges], pa.string()),
                "rhs": pa.array([b for _, b in merges], pa.string()),
            }
        ),
        path("golden_bpe_merges"),
    )
    ranks = {p: i for i, p in enumerate(merges)}
    n_tokens, fps = [], []
    for t in texts:
        toks: list[str] = []
        for w in _pretokenize(t, False):
            toks.extend(encode_word(w, ranks))
        n_tokens.append(len(toks))
        fps.append(hashlib.md5(" ".join(toks).encode()).hexdigest())
    pq.write_table(
        pa.table(
            {
                "doc_id": corpus["doc_id"],
                "n_tokens": pa.array(n_tokens, pa.int64()),
                "tokens_fp": pa.array(fps, pa.string()),
            }
        ),
        path("golden_bpe_tokens"),
    )


def ensure_fixtures() -> str:
    """Write all fixture/golden parquet under FIXTURE_DIR (idempotent)."""
    from .stages.classify import SequenceClassifier
    from .stages.extract import TurnExtractor
    from .synth import (
        make_boilerplate_docs,
        make_bpe_corpus,
        make_deskew_docs,
        make_entity_docs,
        make_layout_docs,
        make_link_docs,
        make_audio_dedup_corpus,
        make_image_dedup_corpus,
        make_media_audio_corpus,
        make_media_image_corpus,
        make_pdf_corpus,
        make_pubtables_docs,
        make_subimage_docs,
        make_table_docs,
        make_token_seq_corpus,
        make_transcripts,
        write_transcripts,
    )

    marker = os.path.join(FIXTURE_DIR, "_meta.json")
    meta = {"v": _VERSION, "n_convs": N_CONVS, "seed": SEED, "hot": HOT,
            "n_layout": N_LAYOUT, "n_table": N_TABLE, "n_pubtables": N_PUBTABLES,
            "n_pdfs": N_PDFS, "n_links": N_LINKS, "n_subimg": N_SUBIMG}
    if os.path.exists(marker):
        try:
            with open(marker) as fh:
                if json.load(fh) == meta:
                    write_transcripts(TRANSCRIPTS_DIR, n_convs=N_CONVS, seed=SEED, hot_factor=HOT)
                    return FIXTURE_DIR
        except Exception:
            pass
    os.makedirs(FIXTURE_DIR, exist_ok=True)

    write_transcripts(TRANSCRIPTS_DIR, n_convs=N_CONVS, seed=SEED, hot_factor=HOT)
    transcripts = make_transcripts(n_convs=N_CONVS, seed=SEED, hot_factor=HOT)

    pq.write_table(_golden_turns(transcripts), path("golden_turns"))

    layout = make_layout_docs(N_LAYOUT, seed=SEED)
    pq.write_table(layout, path("layout_docs"))
    extracted = TurnExtractor()(layout)  # one batch, current thread — no Ray
    pq.write_table(
        extracted.select(["doc_id", "payload_kind", "extracted_text"]), path("golden_layout")
    )
    typed = SequenceClassifier()(extracted)
    pq.write_table(typed.select(["doc_id", "doc_type"]), path("golden_doc_type"))

    pq.write_table(make_table_docs(N_TABLE, seed=SEED), path("table_docs"))
    pq.write_table(make_pubtables_docs(N_PUBTABLES, seed=SEED), path("pubtables_docs"))
    pq.write_table(make_neardup_vecs(), path("neardup_vecs"))
    pq.write_table(make_boilerplate_docs(), path("boilerplate_docs"))
    pq.write_table(make_token_seq_corpus(200, seed=SEED), path("token_seqs"))
    media_img, golden_img = make_media_image_corpus(60, seed=SEED)
    pq.write_table(media_img, path("media_images"))
    pq.write_table(golden_img, path("golden_image_stats"))
    media_aud, golden_aud = make_media_audio_corpus(40, seed=SEED)
    pq.write_table(media_aud, path("media_audio"))
    pq.write_table(golden_aud, path("golden_audio_features"))
    media_dd, golden_pairs = make_image_dedup_corpus(24, seed=SEED)
    pq.write_table(media_dd, path("media_dedup_images"))
    pq.write_table(golden_pairs, path("golden_image_pairs"))
    media_ad, golden_apairs = make_audio_dedup_corpus(20, seed=SEED)
    pq.write_table(media_ad, path("media_dedup_audio"))
    pq.write_table(golden_apairs, path("golden_audio_pairs"))
    pq.write_table(make_deskew_docs(100, seed=SEED), path("deskew_docs"))
    pq.write_table(make_entity_docs(400, seed=SEED), path("entity_docs"))
    link_docs, link_truth = make_link_docs(N_LINKS, seed=SEED)
    pq.write_table(link_docs, path("link_docs"))
    pq.write_table(link_truth, path("link_truth"))
    sub_docs, sub_truth = make_subimage_docs(N_SUBIMG, seed=SEED)
    pq.write_table(sub_docs, path("subimage_docs"))
    pq.write_table(sub_truth, path("subimage_truth"))

    bpe_corpus = make_bpe_corpus(240, seed=SEED)
    pq.write_table(bpe_corpus, path("bpe_corpus"))
    _write_bpe_goldens(bpe_corpus)

    files, truth = make_pdf_corpus(N_PDFS, seed=SEED)
    pdf_dir = os.path.join(FIXTURE_DIR, "pdfs")
    os.makedirs(pdf_dir, exist_ok=True)
    for name, data in files:
        with open(os.path.join(pdf_dir, name), "wb") as fh:
            fh.write(data)
    pq.write_table(
        pa.table(
            {
                "file_name": pa.array([t["file_name"] for t in truth], pa.string()),
                "page_number": pa.array([t["page_number"] for t in truth], pa.int64()),
                "text": pa.array([t["text"] for t in truth], pa.string()),
                "width_px": pa.array([t["width_px"] for t in truth], pa.int64()),
                "height_px": pa.array([t["height_px"] for t in truth], pa.int64()),
                "n_dark": pa.array([t["n_dark"] for t in truth], pa.int64()),
            }
        ),
        path("pdf_truth"),
    )

    tmp = marker + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, marker)
    return FIXTURE_DIR
