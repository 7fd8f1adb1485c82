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


def _parse_pascal_voc(xml_text: str) -> dict:
    """PASCAL-VOC annotation XML → plain dict. The reference routes VOC files
    through lxml+XSLT (``dd_datasets/instances/xsl/pascal_voc.xsl`` +
    ``dd_core/mapper/pascalstruct.py:35-100``); same output shape here via a
    stdlib ``xml.etree`` walk: ``{filename, width, height,
    objects: [{name, xmin, ymin, xmax, ymax}]}``."""
    import xml.etree.ElementTree as ET

    root = ET.fromstring(xml_text)
    size = root.find("size")

    def _num(el, tag, default=0.0):
        node = el.find(tag) if el is not None else None
        return float(node.text) if node is not None and node.text else default

    objects = []
    for obj in root.findall("object"):
        name_node = obj.find("name")
        box = obj.find("bndbox")
        objects.append(
            {
                "name": (name_node.text or "").strip() if name_node is not None else "",
                "xmin": _num(box, "xmin"),
                "ymin": _num(box, "ymin"),
                "xmax": _num(box, "xmax"),
                "ymax": _num(box, "ymax"),
            }
        )
    fname_node = root.find("filename")
    return {
        "filename": (fname_node.text or "").strip() if fname_node is not None else "",
        "width": _num(size, "width"),
        "height": _num(size, "height"),
        "objects": objects,
    }


def _pascal_voc_builder(
    card: DatasetCard,
    split: str,
    category_name_mapping: dict[str, str],
    image_suffix: str = ".jpg",
    filter_empty_image: bool = True,
) -> ray.data.Dataset:
    """Directory-of-VOC-XML → canonical rows, fully distributed: the file walk
    is a ``read_binary_files`` (the ``SerializerFiles.load`` analog) and the
    parse+map runs inside ``map_batches``. Mirrors the shared build path of
    ``Pubtables1MBuilder``/``IIITar13KBuilder``
    (``dd_datasets/instances/pubtables1m.py:120-196``, ``iiitar13k.py:120-190``):
    boxes clamped to the image frame, unmapped category names kept verbatim,
    empty images dropped when ``filter_empty_image``."""
    from .sources import read_files

    ann_dir = os.path.join(card.location, card.annotation_files[split])
    raw = read_files(ann_dir, file_extensions=["xml"])

    def to_canonical(batch: dict) -> pa.Table:
        rows = []
        for path, payload in zip(batch["path"], batch["bytes"]):
            rec = _parse_pascal_voc(bytes(payload).decode("utf-8"))
            width, height = rec["width"], rec["height"]
            anns = []
            for obj in rec["objects"]:
                x0 = min(max(obj["xmin"], 0.0), width) if width else obj["xmin"]
                y0 = min(max(obj["ymin"], 0.0), height) if height else obj["ymin"]
                x1 = min(max(obj["xmax"], 0.0), width) if width else obj["xmax"]
                y1 = min(max(obj["ymax"], 0.0), height) if height else obj["ymax"]
                anns.append(
                    {
                        "category": category_name_mapping.get(obj["name"], obj["name"]),
                        "x0": x0,
                        "top": y0,
                        "x1": x1,
                        "bottom": y1,
                        "score": 1.0,
                    }
                )
            if not anns and filter_empty_image:
                continue
            # Pubtables1M convention: image sits in a sibling `images/` dir
            # under the split root with the xml's stem + image_suffix
            # (pubtables1m.py:176-181).
            stem = os.path.splitext(os.path.basename(str(path)))[0]
            rows.append(
                {
                    "image_id": stem,
                    "file_name": (rec["filename"] or stem + image_suffix),
                    "split": split,
                    "width": width,
                    "height": height,
                    "annotations": anns,
                }
            )
        return _canonical_table(rows)

    return raw.map_batches(to_canonical, batch_format="numpy")


PUBTABLES1M_DET_CATEGORIES = ["table", "table_rotated"]
PUBTABLES1M_STRUCT_CATEGORIES = [
    "table", "row", "column", "spanning", "row_header", "column_header",
    "projected_row_header",
]
# VOC name → canonical category, verbatim the reference's mappings
# (pubtables1m.py:186-192 det; the struct variant's VOC names already match).
_PUBTABLES1M_DET_MAPPING = {"table": "table", "table rotated": "table_rotated"}
_PUBTABLES1M_STRUCT_MAPPING = {
    "table": "table",
    "table row": "row",
    "table column": "column",
    "table spanning cell": "spanning",
    "table row header": "row_header",
    "table column header": "column_header",
    "table projected row header": "projected_row_header",
}


@register_dataset("pubtables1m_like")
def pubtables1m_like_dataset(
    location: str,
    variant: str = "det",
    annotation_files: dict[str, str] | None = None,
) -> CustomDataset:
    """PubTables-1M-shape VOC-XML directories
    (``dd_datasets/instances/pubtables1m.py``): ``variant='det'`` is the
    2-label table-detection taxonomy (``pubtables1m_det``), ``'struct'`` the
    7-label structure-recognition taxonomy (``pubtables1m_struct``). One XML
    per page image; empty pages filtered (``filter_empty_image=True``)."""
    if variant == "det":
        cats, mapping = PUBTABLES1M_DET_CATEGORIES, _PUBTABLES1M_DET_MAPPING
        files = annotation_files or {
            s: f"PubTables1M-Detection-PASCAL-VOC/{s}" for s in ("train", "val", "test")
        }
    elif variant == "struct":
        cats, mapping = PUBTABLES1M_STRUCT_CATEGORIES, _PUBTABLES1M_STRUCT_MAPPING
        files = annotation_files or {
            "train": "PubTables-1M-Structure_Annotations_Train",
            "val": "PubTables-1M-Structure_Annotations_Val",
            "test": "PubTables-1M-Structure_Annotations_Test",
        }
    else:
        raise ValueError(f"pubtables1m variant must be 'det' or 'struct', got {variant!r}")
    card = DatasetCard(
        name=f"pubtables1m_{variant}_like",
        dataset_type="object_detection",
        location=location,
        init_categories=list(cats),
        annotation_files=files,
    )

    def builder(card: DatasetCard, split: str) -> ray.data.Dataset:
        return _pascal_voc_builder(card, split, mapping)

    return CustomDataset(card, builder)


IIITAR13K_CATEGORIES = ["table", "logo", "figure", "signature"]
# The reference's category_name_mapping maps BOTH natural_image AND table to
# figure (iiitar13k.py:180-187) — the table→figure row is kept verbatim for
# parity.
_IIITAR13K_MAPPING = {
    "natural_image": "figure",
    "figure": "figure",
    "logo": "logo",
    "signature": "signature",
    "table": "figure",
}


@register_dataset("iiitar13k_like")
def iiitar13k_like_dataset(
    location: str, annotation_files: dict[str, str] | None = None
) -> CustomDataset:
    """IIIT-AR-13K-shape VOC-XML directories
    (``dd_datasets/instances/iiitar13k.py``): graphical-object detection over
    annual reports; per-split ``*_xml`` directories; the reference's
    category mapping (incl. its table→figure remap) applied verbatim."""
    card = DatasetCard(
        name="iiitar13k_like",
        dataset_type="object_detection",
        location=location,
        init_categories=list(IIITAR13K_CATEGORIES),
        annotation_files=annotation_files
        or {"train": "training_xml", "val": "validation_xml", "test": "test_xml"},
    )

    def builder(card: DatasetCard, split: str) -> ray.data.Dataset:
        return _pascal_voc_builder(card, split, _IIITAR13K_MAPPING, image_suffix=".png")

    return CustomDataset(card, builder)


LAYOUTTEST_CATEGORIES = ["text", "title", "list", "table", "figure"]


@register_dataset("layouttest_like")
def layouttest_like_dataset(
    location: str, annotation_files: dict[str, str] | None = None
) -> CustomDataset:
    """LayoutTest-shape Prodigy JSONL (``dd_datasets/instances/layouttest.py``
    + ``dd_core/mapper/prodigystruct.py:34-145``): records carry an ``answer``
    moderation field (only ``accept`` survives, layouttest.py:126) and
    ``spans`` with 4-point quads; the quad's first and third points become the
    box corners, clamped to the image frame. File naming follows the
    reference's fallback chain meta.file → id → text → basename(path)."""
    card = DatasetCard(
        name="layouttest_like",
        dataset_type="object_detection",
        location=location,
        init_categories=list(LAYOUTTEST_CATEGORIES),
        annotation_files=annotation_files
        or {"test": "xrf_layout_test.jsonl", "predict": "xrf_layout_test_predict.jsonl"},
    )

    def builder(card: DatasetCard, split: str) -> ray.data.Dataset:
        path = os.path.join(card.location, card.annotation_files[split])
        raw = ray.data.read_json(path)

        def to_canonical(batch: pa.Table) -> pa.Table:
            rows = []
            for rec in batch.to_pylist():
                if rec.get("answer") != "accept":
                    continue
                file_name = (
                    (rec.get("meta") or {}).get("file")
                    or rec.get("id")
                    or rec.get("text")
                    or os.path.split(rec.get("path") or "")[1]
                    or ""
                )
                width = float(rec.get("width", 0))
                height = float(rec.get("height", 0))
                anns = []
                for span in rec.get("spans") or []:
                    pts = span.get("points") or []
                    if len(pts) < 3:
                        continue
                    ulx, uly = float(pts[0][0]), float(pts[0][1])
                    lrx, lry = float(pts[2][0]), float(pts[2][1])
                    if width:
                        ulx, lrx = min(max(ulx, 0.0), width), min(max(lrx, 0.0), width)
                    if height:
                        uly, lry = min(max(uly, 0.0), height), min(max(lry, 0.0), height)
                    anns.append(
                        {
                            "category": span.get("label", ""),
                            "x0": ulx,
                            "top": uly,
                            "x1": lrx,
                            "bottom": lry,
                            "score": float(span.get("score") or 1.0),
                        }
                    )
                rows.append(
                    {
                        "image_id": str(rec.get("image_id") or file_name),
                        "file_name": str(file_name),
                        "split": split,
                        "width": width,
                        "height": height,
                        "annotations": anns,
                    }
                )
            return _canonical_table(rows)

        return raw.map_batches(to_canonical, batch_format="pyarrow")

    return CustomDataset(card, builder)


FINTABNET_CELL_FIELDS = pa.list_(
    pa.struct(
        [
            ("row_number", pa.int64()),
            ("column_number", pa.int64()),
            ("row_span", pa.int64()),
            ("column_span", pa.int64()),
            ("header", pa.bool_()),
        ]
    )
)


def tile_html_table(tokens: list[str]) -> list[dict]:
    """PubTabNet/FinTabNet HTML structure tokens → per-cell grid placement.

    The token stream interleaves ``<thead>/<tbody>/<tr>`` structure tags with
    cells that are either a bare ``<td>`` or an attributed
    ``<td``/``colspan="n"``/``rowspan="n"``/``>`` run. Placement follows the
    HTML table model the reference implements with its fill-grid
    (``dd_core/mapper/pubstruct.py:71-160`` ``_cell_token`` / ``_item_spans``
    / ``tile_table`` / ``_end_of_header``): cells fill the first free column
    of their row left-to-right, row/col spans mark an rs×cs region occupied,
    and header cells are those before the last ``</thead>``. Returns one dict
    per cell in document order: ``{row_number, column_number, row_span,
    column_span, header}`` (1-based numbers)."""
    header_end = max((i for i, t in enumerate(tokens) if t == "</thead>"), default=-1)
    cells: list[dict] = []
    occupied: set[tuple[int, int]] = set()
    row = -1
    i = 0
    while i < len(tokens):
        tok = tokens[i]
        if tok == "<tr>":
            row += 1
            i += 1
            continue
        if tok == "<td>" or tok == ">":
            rs = cs = 1
            if tok == ">":  # attributed cell: scan back to the opening <td
                j = i - 1
                while j >= 0 and not tokens[j].lstrip().startswith("<td"):
                    # real PubTabNet/FinTabNet token streams carry the
                    # attribute with a LEADING SPACE (' colspan="2"') — strip
                    # before matching
                    attr = tokens[j].strip().replace('"', "")
                    if attr.startswith("rowspan="):
                        rs = int(attr[8:])
                    elif attr.startswith("colspan="):
                        cs = int(attr[8:])
                    j -= 1
            col = 0
            while (row, col) in occupied:
                col += 1
            for dr in range(rs):
                for dc in range(cs):
                    occupied.add((row + dr, col + dc))
            cells.append(
                {
                    "row_number": row + 1,
                    "column_number": col + 1,
                    "row_span": rs,
                    "column_span": cs,
                    "header": i < header_end,
                }
            )
        i += 1
    return cells


@register_dataset("fintabnet_like")
def fintabnet_like_dataset(
    location: str,
    annotation_files: dict[str, str] | None = None,
    build_mode: str = "",
    rows_and_cols: bool = True,
) -> CustomDataset:
    """FinTabNet-shape JSONL (``dd_datasets/instances/fintabnet.py`` +
    ``dd_core/mapper/pubstruct.py`` ``is_fintabnet=True`` path): one record
    per table with ``filename`` (a PDF under ``pdf/``), a table ``bbox`` and
    ``html.cells``/``html.structure.tokens``. FinTabNet boxes are PDF
    coordinates (origin bottom-left) — both the table box and every cell box
    are y-flipped against the page height (``pubstruct.py:49-61``
    ``_convert_boxes``; the reference takes the height from the rendered PDF,
    here it must be in the record). Emits per table:

    - a ``table`` annotation (``pubstruct.py:424-427``),
    - one ``column_header``/``body`` annotation per cell with a box — the
      reference's ``cat_to_sub_cat`` header split (``fintabnet.py:94-118``),
    - with ``rows_and_cols`` (``fintabnet.py:164``) synthetic ``row``/``column``
      items as grid-line unions of the cell boxes,
    - a ``cells`` column with the grid placement from the HTML structure
      (row/col numbers + spans + header flag, in cell document order).

    ``build_mode='table'`` re-frames everything to the table crop
    (``fintabnet.py:217-254``): boxes translate by the table origin and
    width/height become the table extent."""
    card = DatasetCard(
        name="fintabnet_like",
        dataset_type="table_recognition",
        location=location,
        init_categories=["table", "cell", "item"],
        annotation_files=annotation_files
        or {s: f"FinTabNet_1.0.0_table_{s}.jsonl" for s in ("train", "val", "test")},
    )

    def builder(card: DatasetCard, split: str) -> ray.data.Dataset:
        path = os.path.join(card.location, card.annotation_files[split])
        raw = ray.data.read_json(path)

        def to_canonical(batch: pa.Table) -> pa.Table:
            rows = []
            for rec in batch.to_pylist():
                html = rec.get("html") or {}
                structure = (html.get("structure") or {}).get("tokens") or []
                cell_recs = html.get("cells") or []
                width = float(rec.get("width", 0))
                height = float(rec.get("height", 0))

                def flip(box: list) -> list[float]:
                    x0, y0, x1, y1 = map(float, box)
                    return [x0, height - y1, x1, height - y0]

                table_box = flip(rec["bbox"]) if rec.get("bbox") else [0.0, 0.0, width, height]
                grid = tile_html_table(structure)
                # grid is per structure-cell in document order; cells without a
                # bbox (empty cells) keep their grid slot but emit no box ann
                # (pubstruct.py:434 "empty cells have no box").
                anns = []
                cells_out = []
                boxed = []
                for g, c in zip(grid, cell_recs):
                    if not c.get("bbox"):
                        continue
                    box = flip(c["bbox"])
                    anns.append(
                        {
                            "category": "column_header" if g["header"] else "body",
                            "x0": box[0],
                            "top": box[1],
                            "x1": box[2],
                            "bottom": box[3],
                            "score": 1.0,
                        }
                    )
                    cells_out.append(g)
                    boxed.append((g, box))
                if rows_and_cols and boxed:
                    n_rows = max(g["row_number"] + g["row_span"] - 1 for g, _ in boxed)
                    n_cols = max(g["column_number"] + g["column_span"] - 1 for g, _ in boxed)
                    for r in range(1, n_rows + 1):
                        covering = [
                            b for g, b in boxed
                            if g["row_number"] <= r < g["row_number"] + g["row_span"]
                        ]
                        if covering:
                            anns.append(
                                {
                                    "category": "row",
                                    "x0": min(b[0] for b in covering),
                                    "top": min(b[1] for b in covering),
                                    "x1": max(b[2] for b in covering),
                                    "bottom": max(b[3] for b in covering),
                                    "score": 1.0,
                                }
                            )
                    for col in range(1, n_cols + 1):
                        covering = [
                            b for g, b in boxed
                            if g["column_number"] <= col < g["column_number"] + g["column_span"]
                        ]
                        if covering:
                            anns.append(
                                {
                                    "category": "column",
                                    "x0": min(b[0] for b in covering),
                                    "top": min(b[1] for b in covering),
                                    "x1": max(b[2] for b in covering),
                                    "bottom": max(b[3] for b in covering),
                                    "score": 1.0,
                                }
                            )
                out_w, out_h = width, height
                if build_mode == "table":
                    ox, oy = table_box[0], table_box[1]
                    out_w = table_box[2] - table_box[0]
                    out_h = table_box[3] - table_box[1]
                    for a in anns:
                        a["x0"] -= ox
                        a["x1"] -= ox
                        a["top"] -= oy
                        a["bottom"] -= oy
                else:
                    anns.insert(
                        0,
                        {
                            "category": "table",
                            "x0": table_box[0],
                            "top": table_box[1],
                            "x1": table_box[2],
                            "bottom": table_box[3],
                            "score": 1.0,
                        },
                    )
                filename = os.path.join("pdf", rec.get("filename", ""))
                rows.append(
                    {
                        "image_id": str(rec.get("table_id", rec.get("imgid", filename))),
                        "file_name": filename,
                        "split": split,
                        "width": out_w,
                        "height": out_h,
                        "annotations": anns,
                        "cells": cells_out,
                    }
                )
            schema = pa.schema(list(CANONICAL_SCHEMA) + [pa.field("cells", FINTABNET_CELL_FIELDS)])
            return pa.Table.from_pylist(rows, schema=schema)

        return raw.map_batches(to_canonical, batch_format="pyarrow")

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
