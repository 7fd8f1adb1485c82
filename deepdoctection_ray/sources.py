"""Sources / sinks (SURVEY.md §2.1) as thin Ray Data wrappers.

Each function names the serializer it replaces in
``dd_core/src/dd_core/dataflow/custom_serialize.py``.
"""

from __future__ import annotations

from typing import Sequence

import pyarrow as pa

import ray.data


def read_jsonl(path: str | Sequence[str], max_datapoints: int | None = None) -> ray.data.Dataset:
    """``SerializerJsonlines.load`` (``custom_serialize.py:127-162``)."""
    ds = ray.data.read_json(path)
    return ds.limit(max_datapoints) if max_datapoints else ds


def write_jsonl(ds: ray.data.Dataset, path: str) -> None:
    """``SerializerJsonlines.save`` (``custom_serialize.py:164-184``)."""
    ds.write_json(path)


def read_tabsep(path: str | Sequence[str], max_datapoints: int | None = None) -> ray.data.Dataset:
    """``SerializerTabsepFiles.load`` (``custom_serialize.py:187-222``):
    one record per text line."""
    ds = ray.data.read_text(path)
    return ds.limit(max_datapoints) if max_datapoints else ds


def read_files(
    path: str | Sequence[str],
    file_extensions: Sequence[str] | None = None,
    max_datapoints: int | None = None,
    shuffle: bool = False,
    seed: int = 42,
) -> ray.data.Dataset:
    """``SerializerFiles.load`` (``custom_serialize.py:244-320``): recursive
    binary file walk with extension filter; deterministic listing replaces the
    sort flag, ``random_shuffle`` the shuffle flag."""
    ds = ray.data.read_binary_files(path, include_paths=True, file_extensions=list(file_extensions) if file_extensions else None)
    if shuffle:
        ds = ds.random_shuffle(seed=seed)
    return ds.limit(max_datapoints) if max_datapoints else ds


def read_coco(path: str) -> ray.data.Dataset:
    """``SerializerCoco.load`` (``custom_serialize.py:562-631``): COCO json →
    one record per image with its annotation list attached.

    The reference does an in-memory hash join image←annotations
    (``custom_serialize.py:349-375``); here the join is a
    ``groupby(image_id).map_groups`` over an exploded annotation dataset,
    with the (small) image table broadcast into the group mapper.
    """
    import json

    import ray

    with open(path) as fh:
        doc = json.load(fh)
    images = {img["id"]: img for img in doc.get("images", [])}
    img_ref = ray.put(images)
    anns = doc.get("annotations", [])
    if not anns:
        return ray.data.from_items(
            [{"image": img, "annotations": []} for img in images.values()]
        )
    ann_ds = ray.data.from_items(anns)

    def assemble(group: pa.Table) -> pa.Table:
        import ray as _ray

        imgs = _ray.get(img_ref)
        image_id = group["image_id"][0].as_py()
        return pa.Table.from_pylist(
            [{"image": imgs.get(image_id), "annotations": group.to_pylist()}]
        )

    joined = ann_ds.groupby("image_id").map_groups(assemble, batch_format="pyarrow")
    # the reference's defaultdict join yields EVERY image, including ones with
    # zero annotations (custom_serialize.py:604-607) — union those back in
    with_anns = {a["image_id"] for a in anns}
    orphans = [img for iid, img in images.items() if iid not in with_anns]
    if orphans:
        joined = joined.union(
            ray.data.from_items([{"image": img, "annotations": []} for img in orphans])
        )
    return joined


def split_pdf_pages(row: dict, mode: str = "word") -> list[dict]:
    """``SerializerPdfDoc.load`` mapper (``custom_serialize.py:620-717``):
    one binary pdf → per-page records.

    Real PDFs (``%PDF`` magic) are split by the pure-Python container parser
    (``kernels/pdf.py`` — classic + PDF-1.5 xref layouts; the reference's
    ``PDFStreamer``, ``dd_core/utils/pdf_utils.py:406-545``): each record
    carries a standalone re-serialized single-page PDF plus the page's
    extracted text layer as a pdfish JSON payload ready for the extraction
    stage. ``mode='word'`` is the pdfplumber granularity
    (``PdfPlumberTextDetector``); ``mode='line'`` the pypdfium one
    (``Pdfmium2TextDetector``, ``extern/pdftext.py:138-232``). Non-PDF
    buffers keep the legacy ``b"%PAGE%"`` synthetic split so the plumbing
    tests stay format-agnostic.
    """
    import json

    if mode not in ("word", "line"):
        raise ValueError(f"mode must be 'word' or 'line', got {mode!r}")
    data: bytes = row["bytes"]
    path = row.get("path", "")
    file_name = path.rsplit("/", 1)[-1]
    if data.startswith(b"%PDF"):
        from .kernels.pdf import PdfReader

        reader = PdfReader(data)
        out = []
        for i in range(reader.num_pages):
            width, height = reader.page_size(i)
            records = reader.page_words(i) if mode == "word" else reader.page_lines(i)
            out.append(
                {
                    "path": path,
                    "file_name": file_name,
                    "pdf_bytes": reader.page_pdf_bytes(i),
                    "page_number": i,
                    "document_id": path,
                    "text": json.dumps(
                        {
                            "page": {"width": width, "height": height},
                            "words": records,
                        }
                    ),
                }
            )
        return out
    pages = data.split(b"%PAGE%") if b"%PAGE%" in data else [data]
    return [
        {
            "path": path,
            "file_name": file_name,
            "pdf_bytes": page,
            "page_number": i,
            "document_id": path,
            "text": "",
        }
        for i, page in enumerate(pages)
    ]


def read_pdf(path: str | Sequence[str], mode: str = "word") -> ray.data.Dataset:
    """``SerializerPdfDoc.load`` (``custom_serialize.py:658-717``):
    binary read → per-page flat_map; page bytes stay in the row.
    ``mode``: 'word' (pdfplumber granularity) or 'line' (pypdfium)."""
    return ray.data.read_binary_files(path, include_paths=True).flat_map(
        lambda row: split_pdf_pages(row, mode)
    )
