"""Dataset-builder surface: canonical-schema readers over Ray Data.

The reference ships ~10 dataset builders (``dd_datasets/instances/*.py``)
on a shared contract: a ``DatasetCard`` describing categories/splits/files
(``dd_datasets/base.py:429-520``), a ``DataFlowBaseBuilder.build`` that
yields canonical ``Image`` datapoints (``dataflow_builder.py:33-110``), and
``MergeDataset`` split bookkeeping (``base.py:179-409``). Here the same
contract maps onto Ray Data:

- :class:`DatasetCard` — plain metadata record with JSON round-trip;
- :class:`CustomDataset` — ``build(split=..., max_datapoints=...,
  shuffle=...)`` returns a Dataset in the CANONICAL row schema
  ``(image_id, file_name, split, width, height,
  annotations: list<struct{category, x0, top, x1, bottom, score}>)``;
- two concrete builders: :func:`coco_like_dataset` (COCO detection JSON —
  publaynet-style) and :func:`pubtabnet_like_dataset` (JSONL of table
  documents with cell tokens — pubtabnet-style);
- :func:`merge_datasets` — union with a ``dataset_name`` provenance column
  (the ``MergeDataset`` analog).

Builders are registered in the ``dataset`` registry for name-based lookup
(the ``get_dataset`` analog).
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field
from typing import Callable

import pyarrow as pa

import ray.data

ANNOTATION_TYPE = pa.list_(
    pa.struct(
        [
            ("category", pa.string()),
            ("x0", pa.float64()),
            ("top", pa.float64()),
            ("x1", pa.float64()),
            ("bottom", pa.float64()),
            ("score", pa.float64()),
        ]
    )
)

CANONICAL_SCHEMA = pa.schema(
    [
        ("image_id", pa.string()),
        ("file_name", pa.string()),
        ("split", pa.string()),
        ("width", pa.float64()),
        ("height", pa.float64()),
        ("annotations", ANNOTATION_TYPE),
    ]
)


@dataclass
class DatasetCard:
    """``dd_datasets/base.py:429`` analog: immutable dataset metadata."""

    name: str
    dataset_type: str
    location: str
    init_categories: list[str] = field(default_factory=list)
    annotation_files: dict[str, str] = field(default_factory=dict)
    description: str = ""

    def save(self, path: str) -> None:
        with open(path, "w") as fh:
            json.dump(asdict(self), fh, indent=2)

    @staticmethod
    def load(path: str) -> "DatasetCard":
        with open(path) as fh:
            return DatasetCard(**json.load(fh))


class CustomDataset:
    """Name + card + builder fn → canonical Ray Dataset per split."""

    def __init__(
        self,
        card: DatasetCard,
        builder: Callable[[DatasetCard, str], ray.data.Dataset],
    ) -> None:
        self.card = card
        self._builder = builder

    @property
    def name(self) -> str:
        return self.card.name

    def splits(self) -> list[str]:
        return sorted(self.card.annotation_files)

    def build(
        self,
        split: str = "train",
        max_datapoints: int | None = None,
        shuffle: bool = False,
        seed: int = 42,
    ) -> ray.data.Dataset:
        if split not in self.card.annotation_files:
            raise KeyError(f"{self.card.name} has no split {split!r}; have {self.splits()}")
        ds = self._builder(self.card, split)
        if shuffle:
            ds = ds.random_shuffle(seed=seed)
        return ds.limit(max_datapoints) if max_datapoints else ds


DATASET_REGISTRY: dict[str, Callable[..., CustomDataset]] = {}


def register_dataset(name: str):
    def deco(fn):
        DATASET_REGISTRY[name] = fn
        return fn

    return deco


def get_dataset(name: str, **kwargs) -> CustomDataset:
    """``dd_datasets`` registry lookup analog."""
    if name not in DATASET_REGISTRY:
        raise KeyError(f"unknown dataset {name!r}; registered: {sorted(DATASET_REGISTRY)}")
    return DATASET_REGISTRY[name](**kwargs)


def _canonical_table(rows: list[dict]) -> pa.Table:
    return pa.Table.from_pylist(rows, schema=CANONICAL_SCHEMA)


@register_dataset("coco_like")
def coco_like_dataset(location: str, annotation_files: dict[str, str] | None = None) -> CustomDataset:
    """COCO detection JSON → canonical rows (publaynet-style instance,
    ``dd_datasets/instances/publaynet.py`` shape): bbox xywh → xyxy, category
    ids resolved through the file's own categories table; images without
    annotations keep an empty list."""
    card = DatasetCard(
        name="coco_like",
        dataset_type="object_detection",
        location=location,
        annotation_files=annotation_files or {"train": "annotations.json"},
    )

    def builder(card: DatasetCard, split: str) -> ray.data.Dataset:
        path = os.path.join(card.location, card.annotation_files[split])
        with open(path) as fh:
            doc = json.load(fh)
        cats = {c["id"]: c["name"] for c in doc.get("categories", [])}
        by_image: dict = {img["id"]: [] for img in doc.get("images", [])}
        for ann in doc.get("annotations", []):
            x, y, w, h = ann.get("bbox", [0, 0, 0, 0])
            by_image.setdefault(ann["image_id"], []).append(
                {
                    "category": cats.get(ann.get("category_id"), "unknown"),
                    "x0": float(x),
                    "top": float(y),
                    "x1": float(x + w),
                    "bottom": float(y + h),
                    "score": float(ann.get("score", 1.0)),
                }
            )
        rows = [
            {
                "image_id": str(img["id"]),
                "file_name": img.get("file_name", ""),
                "split": split,
                "width": float(img.get("width", 0)),
                "height": float(img.get("height", 0)),
                "annotations": by_image.get(img["id"], []),
            }
            for img in doc.get("images", [])
        ]
        return ray.data.from_arrow(_canonical_table(rows))

    return CustomDataset(card, builder)


@register_dataset("pubtabnet_like")
def pubtabnet_like_dataset(location: str, annotation_files: dict[str, str] | None = None) -> CustomDataset:
    """PubTabNet-style JSONL → canonical rows
    (``dd_datasets/instances/pubtabnet.py`` shape): one JSON object per line
    with ``imgid``, ``filename``, ``split`` and ``html.cells`` carrying per-
    cell token bboxes; each cell becomes a ``cell`` annotation. The JSONL
    read and the per-record mapping both run distributed
    (``read_json`` → ``map_batches``)."""
    card = DatasetCard(
        name="pubtabnet_like",
        dataset_type="table_recognition",
        location=location,
        init_categories=["cell"],
        annotation_files=annotation_files or {"train": "examples.jsonl"},
    )

    def builder(card: DatasetCard, split: str) -> ray.data.Dataset:
        path = os.path.join(card.location, card.annotation_files[split])
        raw = ray.data.read_json(path)

        def to_canonical(batch: pa.Table) -> pa.Table:
            rows = []
            for rec in batch.to_pylist():
                if rec.get("split", split) != split:
                    continue
                cells = (rec.get("html") or {}).get("cells") or []
                anns = [
                    {
                        "category": "cell",
                        "x0": float(c["bbox"][0]),
                        "top": float(c["bbox"][1]),
                        "x1": float(c["bbox"][2]),
                        "bottom": float(c["bbox"][3]),
                        "score": 1.0,
                    }
                    for c in cells
                    if c.get("bbox")
                ]
                rows.append(
                    {
                        "image_id": str(rec.get("imgid", rec.get("filename", ""))),
                        "file_name": rec.get("filename", ""),
                        "split": split,
                        "width": float(rec.get("width", 0)),
                        "height": float(rec.get("height", 0)),
                        "annotations": anns,
                    }
                )
            return _canonical_table(rows)

        return raw.map_batches(to_canonical, batch_format="pyarrow")

    return CustomDataset(card, builder)


@register_dataset("funsd_like")
def funsd_like_dataset(location: str, annotation_files: dict[str, str] | None = None) -> CustomDataset:
    """FUNSD-style token-classification JSONL
    (``dd_datasets/instances/funsd.py`` shape): one JSON object per line with
    ``id``, ``width``, ``height`` and ``form`` entries carrying a semantic
    ``label`` (question/answer/header/other) plus per-word boxes. Each word
    becomes a ``word`` annotation whose category is the entity label — the
    exact input :class:`stages.layoutlm.LayoutLMFeaturizer` consumes for
    token classification."""
    card = DatasetCard(
        name="funsd_like",
        dataset_type="token_classification",
        location=location,
        init_categories=["question", "answer", "header", "other"],
        annotation_files=annotation_files or {"train": "annotations.jsonl"},
    )

    def builder(card: DatasetCard, split: str) -> ray.data.Dataset:
        path = os.path.join(card.location, card.annotation_files[split])
        raw = ray.data.read_json(path)

        def to_canonical(batch: pa.Table) -> pa.Table:
            rows = []
            for rec in batch.to_pylist():
                anns = []
                for entity in rec.get("form") or []:
                    label = entity.get("label", "other")
                    for w in entity.get("words") or []:
                        x0, y0, x1, y1 = w["box"]
                        anns.append(
                            {
                                "category": label,
                                "x0": float(x0),
                                "top": float(y0),
                                "x1": float(x1),
                                "bottom": float(y1),
                                "score": 1.0,
                            }
                        )
                rows.append(
                    {
                        "image_id": str(rec.get("id", "")),
                        "file_name": rec.get("file_name", f"{rec.get('id','')}.png"),
                        "split": split,
                        "width": float(rec.get("width", 0)),
                        "height": float(rec.get("height", 0)),
                        "annotations": anns,
                    }
                )
            return _canonical_table(rows)

        return raw.map_batches(to_canonical, batch_format="pyarrow")

    return CustomDataset(card, builder)


DOCLAYNET_CATEGORIES = [
    "caption", "footnote", "formula", "list", "page_footer", "page_header",
    "figure", "section_header", "table", "text", "title",
]
# DocLayNet id → PubLayNet-coarse id, verbatim the reference's coarse_mapping
# (dd_datasets/instances/doclaynet.py:185): {1:10,2:10,3:10,4:4,5:10,6:11,
# 7:7,8:11,9:9,10:10,11:11} — names resolved through the 11-category list.
DOCLAYNET_COARSE = {
    "caption": "text", "footnote": "text", "formula": "text", "list": "list",
    "page_footer": "text", "page_header": "title", "figure": "figure",
    "section_header": "title", "table": "table", "text": "text", "title": "title",
}


@register_dataset("doclaynet_like")
def doclaynet_like_dataset(
    location: str,
    annotation_files: dict[str, str] | None = None,
    coarse: bool = False,
) -> CustomDataset:
    """DocLayNet-shape COCO (``dd_datasets/instances/doclaynet.py``): the
    11-label layout-segmentation taxonomy; ``coarse=True`` remaps every
    annotation through the reference's DocLayNet→PubLayNet coarse mapping
    (its ``coarse_mapping``/``cat_to_sub_cat`` path) so models trained on
    the 5-label PubLayNet taxonomy consume it directly."""
    card = DatasetCard(
        name="doclaynet_like",
        dataset_type="object_detection",
        location=location,
        init_categories=list(DOCLAYNET_CATEGORIES),
        annotation_files=annotation_files
        or {"train": "COCO/train.json", "val": "COCO/val.json", "test": "COCO/test.json"},
    )

    def builder(card: DatasetCard, split: str) -> ray.data.Dataset:
        base = coco_like_dataset(card.location, card.annotation_files)
        ds = base.build(split=split)
        if not coarse:
            return ds

        def remap(batch: pa.Table) -> pa.Table:
            rows = batch.to_pylist()
            for r in rows:
                for a in r["annotations"]:
                    a["category"] = DOCLAYNET_COARSE.get(a["category"], a["category"])
            return _canonical_table(rows)

        return ds.map_batches(remap, batch_format="pyarrow")

    return CustomDataset(card, builder)


XFUND_LANGUAGES = ["de", "es", "fr", "it", "ja", "pt", "zh"]
_XFUND_TOKEN_CLASSES = {"other", "question", "answer", "header"}


@register_dataset("xfund_like")
def xfund_like_dataset(
    location: str,
    annotation_files: dict[str, list[str]] | None = None,
    languages: list[str] | str | None = None,
) -> CustomDataset:
    """XFUND-shape multilingual forms (``dd_datasets/instances/xfund.py`` +
    ``dd_core/mapper/xfundstruct.py``): per-language JSON files each holding
    ``{"documents": [{id, img:{fname,width,height}, document:[entities]}]}``;
    every entity word becomes a ``word`` annotation whose category is the
    BIO token TAG the reference derives (first word of a labeled entity →
    ``B-<class>``, rest → ``I-<class>``, 'other' entities → ``O``) — the
    exact training surface of the LayoutLM token-classification path.
    ``languages`` filters the per-language files like the reference kwarg."""
    if isinstance(languages, str):
        languages = [languages]
    langs = languages or XFUND_LANGUAGES
    bad = [l for l in langs if l not in XFUND_LANGUAGES]
    if bad:
        raise ValueError(f"unknown xfund languages {bad}; available: {XFUND_LANGUAGES}")
    card = DatasetCard(
        name="xfund_like",
        dataset_type="token_classification",
        location=location,
        init_categories=["word", "text"],
        annotation_files=annotation_files
        or {
            s: [f"{l}.{s}.json" for l in XFUND_LANGUAGES]
            for s in ("train", "val")
        },
    )

    def builder(card: DatasetCard, split: str) -> ray.data.Dataset:
        paths = [
            os.path.join(card.location, f)
            for f in card.annotation_files[split]
            if f.split(".")[0] in langs
        ]
        rows = []
        for path in paths:
            with open(path, encoding="utf-8") as fh:
                doc = json.load(fh)
            for dp in doc.get("documents", []):
                img = dp.get("img") or {}
                anns = []
                for entity in dp.get("document") or []:
                    label = entity.get("label", "other")
                    if label not in _XFUND_TOKEN_CLASSES:
                        label = "other"
                    for wi, w in enumerate(entity.get("words") or []):
                        x0, y0, x1, y1 = w["box"]
                        if label == "other":
                            tag = "O"
                        else:
                            tag = ("B-" if wi == 0 else "I-") + label
                        anns.append(
                            {
                                "category": tag,
                                "x0": float(x0),
                                "top": float(y0),
                                "x1": float(x1),
                                "bottom": float(y1),
                                "score": 1.0,
                            }
                        )
                rows.append(
                    {
                        "image_id": str(dp.get("id", "")),
                        "file_name": img.get("fname", ""),
                        "split": split,
                        "width": float(img.get("width", 0)),
                        "height": float(img.get("height", 0)),
                        "annotations": anns,
                    }
                )
        return ray.data.from_arrow(_canonical_table(rows))

    return CustomDataset(card, builder)


RVLCDIP_CATEGORIES = [
    "letter", "form", "email", "handwritten", "advertisement",
    "scientific_report", "scientific_publication", "specification",
    "file_folder", "news_article", "budget", "invoice", "presentation",
    "questionnaire", "resume", "memo",
]


@register_dataset("rvlcdip_like")
def rvlcdip_like_dataset(
    location: str, annotation_files: dict[str, str] | None = None
) -> CustomDataset:
    """RVL-CDIP-shape label file (``dd_datasets/instances/rvlcdip.py``):
    whitespace-separated ``relative/path.tif <label>`` lines with 0-based
    label ids over the fixed 16-class taxonomy. A classification dataset has
    no boxes: rows keep the canonical columns (empty ``annotations``) plus a
    ``document_type`` summary column — the ``image.summary`` /
    ``PageKey.DOCUMENT_TYPE`` analog. The label file is read distributed
    (``read_text`` → ``map_batches``)."""
    card = DatasetCard(
        name="rvlcdip_like",
        dataset_type="sequence_classification",
        location=location,
        init_categories=list(RVLCDIP_CATEGORIES),
        annotation_files=annotation_files
        or {"train": "labels/train.txt", "val": "labels/val.txt", "test": "labels/test.txt"},
    )

    def builder(card: DatasetCard, split: str) -> ray.data.Dataset:
        path = os.path.join(card.location, card.annotation_files[split])
        raw = ray.data.read_text(path)

        def to_rows(batch: pa.Table) -> pa.Table:
            rows = []
            for line in batch["text"].to_pylist():
                parts = line.split()
                if len(parts) < 2:
                    continue
                location, label = parts[0], int(parts[1])
                if not 0 <= label < len(RVLCDIP_CATEGORIES):
                    raise ValueError(f"rvlcdip label {label} out of range in {line!r}")
                rows.append(
                    {
                        "image_id": location,
                        "file_name": os.path.split(location)[1],
                        "split": split,
                        "width": 0.0,
                        "height": 0.0,
                        "annotations": [],
                        "document_type": RVLCDIP_CATEGORIES[label],
                    }
                )
            schema = pa.schema(
                list(CANONICAL_SCHEMA) + [pa.field("document_type", pa.string())]
            )
            return pa.Table.from_pylist(rows, schema=schema)

        return raw.map_batches(to_rows, batch_format="pyarrow")

    return CustomDataset(card, builder)


def merge_datasets(datasets: list[CustomDataset], split: str = "train", **build_kwargs) -> ray.data.Dataset:
    """``MergeDataset`` analog (``dd_datasets/base.py:179-409``): union the
    canonical builds and tag provenance in a ``dataset_name`` column so split
    bookkeeping survives the merge."""
    import pandas as pd

    parts = []
    for ds in datasets:
        built = ds.build(split=split, **build_kwargs)
        name = ds.name
        parts.append(
            built.map_batches(
                lambda df, _n=name: df.assign(dataset_name=_n), batch_format="pandas"
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out
