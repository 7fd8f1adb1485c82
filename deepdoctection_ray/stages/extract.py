"""The extraction stage: Arrow batch in → Arrow batch out, one actor per slot.

The Ray analog of the reference's component chain
``ImageLayoutService → TextExtractionService → MatchingService →
TextOrderService → PageParsingService`` collapsed into one per-turn kernel
call (every reference component is a per-record map — SURVEY.md §2.3 — so the
fusion is semantics-preserving and saves N object-store round trips per turn).

Stateful pieces (the warm HTML parser, compiled regexes) live in the actor's
``__init__`` — once per worker process, amortized over all batches.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from ..kernels.extract import extract_turn
from ..kernels.html_blocks import DEFAULT_MAX_LINK_DENSITY, _BlockCollector
from ..kernels.reading_order import PARAGRAPH_BREAK

SPAN_TYPE = pa.list_(
    pa.struct(
        [
            ("start", pa.int32()),
            ("end", pa.int32()),
            ("block_idx", pa.int32()),
            ("category", pa.string()),
            ("reading_order", pa.int32()),
        ]
    )
)
BLOCK_TYPE = pa.list_(
    pa.struct(
        [
            ("category", pa.string()),
            ("reading_order", pa.int32()),
            ("n_words", pa.int32()),
        ]
    )
)


def conv_partition_ids(
    conv_ids: pa.ChunkedArray | pa.Array,
    num_partitions: int,
    turn_idx: pa.ChunkedArray | pa.Array | None = None,
    salt_span: int | None = None,
) -> np.ndarray:
    """Stable partition id per row: ``crc32(conv_id) % P``.

    crc32 is a C single-call per row (~100ns); identical across processes and
    runs (unlike ``hash()``), which is what resumable partitioning needs.

    With ``salt_span`` set, the key becomes ``conv_id # turn_idx//salt_span``:
    a conversation larger than one partition's budget splits into fixed
    turn-ranges spread over the hash space (SURVEY.md §7.4 skew handling).
    Ordering within each range is preserved by the per-partition sort; a
    consumer that needs one giant conversation contiguous re-merges its
    ranges by turn_idx — that cost is paid only for the pathological key.
    """
    vals = conv_ids.to_pylist()
    if salt_span:
        turns = turn_idx.to_pylist()
        return np.fromiter(
            (
                zlib.crc32(f"{v}#{t // salt_span}".encode("utf-8")) % num_partitions
                for v, t in zip(vals, turns)
            ),
            dtype=np.int32,
            count=len(vals),
        )
    return np.fromiter(
        (zlib.crc32(v.encode("utf-8")) % num_partitions for v in vals),
        dtype=np.int32,
        count=len(vals),
    )


class TurnExtractor:
    """Actor-pool batch extractor.

    Use as ``ds.map_batches(TurnExtractor, batch_format="pyarrow",
    concurrency=N, batch_size=B, fn_constructor_kwargs=...)``.
    """

    def __init__(
        self,
        max_link_density: float = DEFAULT_MAX_LINK_DENSITY,
        paragraph_break: float = PARAGRAPH_BREAK,
        keep_payload: bool = False,
        text_column: str = "text",
        deskew: bool = False,
    ) -> None:
        self._parser = _BlockCollector()  # warm parser, reused across batches
        self._mld = max_link_density
        self._pb = paragraph_break
        self._keep_payload = keep_payload
        self._text_column = text_column
        self._deskew = deskew

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self._text_column).to_pylist()
        extracted: list[str] = []
        kinds: list[str] = []
        errors: list[str | None] = []
        # flat accumulators + offsets → Arrow list<struct> built via
        # from_arrays (no per-span python dict crosses into Arrow)
        s_start: list[int] = []
        s_end: list[int] = []
        s_block: list[int] = []
        s_cat: list[str] = []
        s_order: list[int] = []
        s_offsets: list[int] = [0]
        b_cat: list[str] = []
        b_order: list[int] = []
        b_words: list[int] = []
        b_offsets: list[int] = [0]
        for text in texts:
            res = extract_turn(
                text if text is not None else "",
                max_link_density=self._mld,
                paragraph_break=self._pb,
                html_parser=self._parser,
                deskew=self._deskew,
            )
            extracted.append(res["extracted_text"])
            kinds.append(res["payload_kind"])
            errors.append(res["error"])
            sp = res["spans"]
            s_start.extend(sp["start"])
            s_end.extend(sp["end"])
            s_block.extend(sp["block_idx"])
            s_cat.extend(sp["category"])
            s_order.extend(sp["reading_order"])
            s_offsets.append(len(s_start))
            bl = res["blocks"]
            b_cat.extend(bl["category"])
            b_order.extend(bl["reading_order"])
            b_words.extend(bl["n_words"])
            b_offsets.append(len(b_cat))

        span_struct = pa.StructArray.from_arrays(
            [
                pa.array(s_start, pa.int32()),
                pa.array(s_end, pa.int32()),
                pa.array(s_block, pa.int32()),
                pa.array(s_cat, pa.string()),
                pa.array(s_order, pa.int32()),
            ],
            fields=list(SPAN_TYPE.value_type),
        )
        spans_arr = pa.ListArray.from_arrays(pa.array(s_offsets, pa.int32()), span_struct)
        block_struct = pa.StructArray.from_arrays(
            [
                pa.array(b_cat, pa.string()),
                pa.array(b_order, pa.int32()),
                pa.array(b_words, pa.int32()),
            ],
            fields=list(BLOCK_TYPE.value_type),
        )
        blocks_arr = pa.ListArray.from_arrays(pa.array(b_offsets, pa.int32()), block_struct)

        out = batch
        if not self._keep_payload:
            out = out.drop_columns([self._text_column])  # payload never crosses the stage
        out = out.append_column("extracted_text", pa.array(extracted, pa.string()))
        out = out.append_column("spans", spans_arr)
        out = out.append_column("blocks", blocks_arr)
        out = out.append_column("payload_kind", pa.array(kinds, pa.string()))
        out = out.append_column("error", pa.array(errors, pa.string()))
        return out
