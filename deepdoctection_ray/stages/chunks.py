"""Block-level chunk projection of extraction output.

The ``Page.chunks`` analog (``view.py:1409-1441``): one row per ordered text
block — (turn keys, block_idx, reading_order, category, chunk text). This is
the natural unit for RAG indexing / chunked training data; the chunk text is
sliced from ``extracted_text`` via the block's span range, so no re-parse
happens.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data


def explode_chunks(
    ds: ray.data.Dataset,
    key_columns: tuple[str, ...] = ("conv_id", "turn_idx"),
) -> ray.data.Dataset:
    """Extraction output → one row per block (vectorized batch explode)."""
    keys = list(key_columns)

    def explode(batch: pa.Table) -> pa.Table:
        out_keys: dict[str, list] = {k: [] for k in keys}
        block_idx: list[int] = []
        reading_order: list[int] = []
        category: list[str] = []
        chunk_text: list[str] = []
        texts = batch["extracted_text"].to_pylist()
        spans = batch["spans"].to_pylist()
        blocks = batch["blocks"].to_pylist()
        key_cols = {k: batch[k].to_pylist() for k in keys}
        for row_i, (text, row_spans, row_blocks) in enumerate(zip(texts, spans, blocks)):
            bounds: dict[int, tuple[int, int]] = {}
            for s in row_spans or []:
                b = s["block_idx"]
                lo, hi = bounds.get(b, (s["start"], s["end"]))
                bounds[b] = (min(lo, s["start"]), max(hi, s["end"]))
            for b_i, blk in enumerate(row_blocks or []):
                if b_i not in bounds:
                    continue
                lo, hi = bounds[b_i]
                for k in keys:
                    out_keys[k].append(key_cols[k][row_i])
                block_idx.append(b_i)
                reading_order.append(blk["reading_order"])
                category.append(blk["category"])
                chunk_text.append(text[lo:hi])
        cols = {k: pa.array(out_keys[k], batch[k].type) for k in keys}
        cols.update(
            {
                "block_idx": pa.array(block_idx, pa.int32()),
                "reading_order": pa.array(reading_order, pa.int32()),
                "category": pa.array(category, pa.string()),
                "chunk_text": pa.array(chunk_text, pa.string()),
            }
        )
        return pa.table(cols)

    return ds.map_batches(explode, batch_format="pyarrow")
