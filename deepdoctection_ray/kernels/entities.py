"""Entity extraction over classified tokens — ``Page.get_entities`` analog.

The reference emits, per page, the reading-ordered words whose token tag is
not OTHER, each with its annotation id and the id of its successor word
(``dd_core/datapoint/view.py:1756-1784``; ``RelationshipKey.SUCCESSOR``,
``object_types.py:451``). Here the same surface is computed over the flat
extraction row: spans are already in reading order, ``token_classes`` is the
parallel token-class column the :class:`stages.classify.TokenClassifier`
stage adds, and the successor link chains ADJACENT same-class entity tokens
(a multi-token entity reads through its successor chain, which is what the
relationship exists for).

Annotation ids are deterministic: ``{doc_id}/{token_index}`` — stable across
runs and workers, so links survive any shuffle.
"""

from __future__ import annotations

import pyarrow as pa

# the OTHER analog: the TokenClassifier's catch-all class
OTHER_CLASS = "word"


def entities_of_row(
    doc_id: str, text: str, spans: list[dict], token_classes: list[str]
) -> list[dict]:
    """Reference-shaped entity dicts for one row (``view.py:1756-1784``)."""
    out = []
    n = len(spans)
    for i, (s, cls) in enumerate(zip(spans, token_classes)):
        if cls == OTHER_CLASS or cls is None:
            continue
        succ = (
            f"{doc_id}/{i + 1}"
            if i + 1 < n and token_classes[i + 1] == cls
            else None
        )
        out.append(
            {
                "word": text[s["start"] : s["end"]],
                "entity": cls,
                "annotation_id": f"{doc_id}/{i}",
                "successor_annotation_id": succ,
            }
        )
    return out


def entity_rows(batch: pa.Table, id_column: str = "doc_id") -> pa.Table:
    """Explode classified turns into one row per entity token:
    ``(doc_id, tok_idx, word, entity, annotation_id, successor_annotation_id)``.
    Runs inside ``map_batches`` — never a driver loop."""
    ids = batch[id_column].to_pylist()
    texts = batch["extracted_text"].to_pylist()
    spans = batch["spans"].to_pylist()
    classes = batch["token_classes"].to_pylist()
    o_id, o_idx, o_word, o_ent, o_ann, o_succ = [], [], [], [], [], []
    for doc_id, text, row_spans, row_classes in zip(ids, texts, spans, classes):
        row_spans = row_spans or []
        row_classes = row_classes or []
        n = len(row_spans)
        for i, (s, cls) in enumerate(zip(row_spans, row_classes)):
            if cls == OTHER_CLASS or cls is None:
                continue
            o_id.append(doc_id)
            o_idx.append(i)
            o_word.append(text[s["start"] : s["end"]])
            o_ent.append(cls)
            o_ann.append(f"{doc_id}/{i}")
            o_succ.append(
                f"{doc_id}/{i + 1}" if i + 1 < n and row_classes[i + 1] == cls else None
            )
    return pa.table(
        {
            "doc_id": pa.array(o_id, batch[id_column].type),
            "tok_idx": pa.array(o_idx, pa.int64()),
            "word": pa.array(o_word, pa.string()),
            "entity": pa.array(o_ent, pa.string()),
            "annotation_id": pa.array(o_ann, pa.string()),
            "successor_annotation_id": pa.array(o_succ, pa.string()),
        }
    )
