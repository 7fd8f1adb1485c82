"""Dataset-builder surface (datasets.py): canonical schema, registry,
merge bookkeeping — CustomDataset/DatasetCard/MergeDataset analogs
(dd_datasets/base.py:179-520, dataflow_builder.py:33-110)."""

from __future__ import annotations

import json
import os

import pytest


@pytest.fixture(scope="module")
def coco_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("coco")
    doc = {
        "images": [
            {"id": 1, "file_name": "a.png", "width": 100, "height": 80},
            {"id": 2, "file_name": "b.png", "width": 100, "height": 80},
            {"id": 3, "file_name": "empty.png", "width": 50, "height": 50},
        ],
        "annotations": [
            {"id": 10, "image_id": 1, "category_id": 7, "bbox": [10, 20, 30, 40]},
            {"id": 11, "image_id": 1, "category_id": 8, "bbox": [0, 0, 5, 5]},
            {"id": 12, "image_id": 2, "category_id": 7, "bbox": [1, 1, 2, 2]},
        ],
        "categories": [{"id": 7, "name": "text"}, {"id": 8, "name": "table"}],
    }
    with open(d / "annotations.json", "w") as fh:
        json.dump(doc, fh)
    return str(d)


@pytest.fixture(scope="module")
def pubtabnet_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("ptn")
    recs = [
        {
            "imgid": 1, "filename": "t1.png", "split": "train", "width": 200, "height": 100,
            "html": {"cells": [{"tokens": ["a"], "bbox": [0, 0, 50, 30]},
                               {"tokens": ["b"], "bbox": [50, 0, 100, 30]}]},
        },
        {
            "imgid": 2, "filename": "t2.png", "split": "val", "width": 200, "height": 100,
            "html": {"cells": [{"tokens": ["c"], "bbox": [0, 0, 40, 20]}]},
        },
    ]
    with open(d / "examples.jsonl", "w") as fh:
        for r in recs:
            fh.write(json.dumps(r) + "\n")
    return str(d)


def test_coco_like_builds_canonical(ray_session, coco_dir):
    from deepdoctection_ray.datasets import get_dataset

    ds = get_dataset("coco_like", location=coco_dir)
    df = ds.build("train").to_pandas().sort_values("image_id").reset_index(drop=True)
    assert list(df.columns) == ["image_id", "file_name", "split", "width", "height", "annotations"]
    assert len(df) == 3  # zero-annotation image kept
    anns1 = df.iloc[0]["annotations"]
    assert {a["category"] for a in anns1} == {"text", "table"}
    a = [x for x in anns1 if x["category"] == "text"][0]
    assert (a["x0"], a["top"], a["x1"], a["bottom"]) == (10.0, 20.0, 40.0, 60.0)  # xywh→xyxy
    assert list(df.iloc[2]["annotations"]) == []


def test_build_split_guard_and_limit(ray_session, coco_dir):
    from deepdoctection_ray.datasets import get_dataset

    ds = get_dataset("coco_like", location=coco_dir)
    with pytest.raises(KeyError, match="no split"):
        ds.build("test")
    assert ds.build("train", max_datapoints=2).count() == 2


def test_pubtabnet_like_split_filter(ray_session, pubtabnet_dir):
    from deepdoctection_ray.datasets import get_dataset

    ds = get_dataset(
        "pubtabnet_like",
        location=pubtabnet_dir,
        annotation_files={"train": "examples.jsonl", "val": "examples.jsonl"},
    )
    train = ds.build("train").to_pandas()
    val = ds.build("val").to_pandas()
    assert len(train) == 1 and train.iloc[0]["file_name"] == "t1.png"
    assert len(val) == 1 and val.iloc[0]["file_name"] == "t2.png"
    assert [a["category"] for a in train.iloc[0]["annotations"]] == ["cell", "cell"]


def test_merge_datasets_provenance(ray_session, coco_dir, pubtabnet_dir):
    from deepdoctection_ray.datasets import get_dataset, merge_datasets

    merged = merge_datasets(
        [
            get_dataset("coco_like", location=coco_dir),
            get_dataset("pubtabnet_like", location=pubtabnet_dir),
        ]
    ).to_pandas()
    assert len(merged) == 4
    assert set(merged["dataset_name"]) == {"coco_like", "pubtabnet_like"}


def test_dataset_card_roundtrip(tmp_path):
    from deepdoctection_ray.datasets import DatasetCard

    card = DatasetCard(name="x", dataset_type="d", location="/x", init_categories=["a"])
    p = os.path.join(tmp_path, "card.json")
    card.save(p)
    assert DatasetCard.load(p) == card


def test_funsd_like_token_labels(ray_session, tmp_path_factory):
    import json

    from deepdoctection_ray.datasets import get_dataset

    d = tmp_path_factory.mktemp("funsd")
    recs = [
        {
            "id": 7, "width": 100, "height": 100,
            "form": [
                {"label": "question", "words": [
                    {"text": "Name:", "box": [5, 5, 30, 12]}]},
                {"label": "answer", "words": [
                    {"text": "Ada", "box": [35, 5, 50, 12]},
                    {"text": "L.", "box": [52, 5, 60, 12]}]},
            ],
        }
    ]
    with open(d / "annotations.jsonl", "w") as fh:
        for r in recs:
            fh.write(json.dumps(r) + "\n")
    ds = get_dataset("funsd_like", location=str(d))
    df = ds.build("train").to_pandas()
    assert len(df) == 1
    anns = df.iloc[0]["annotations"]
    assert [a["category"] for a in anns] == ["question", "answer", "answer"]
    assert anns[1]["x0"] == 35.0 and anns[1]["bottom"] == 12.0


@pytest.fixture(scope="module")
def doclaynet_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("dln")
    os.makedirs(d / "COCO", exist_ok=True)
    doc = {
        "images": [{"id": 1, "file_name": "p.png", "width": 100, "height": 80}],
        "annotations": [
            {"id": 1, "image_id": 1, "category_id": 6, "bbox": [0, 0, 10, 10]},
            {"id": 2, "image_id": 1, "category_id": 9, "bbox": [5, 5, 10, 10]},
            {"id": 3, "image_id": 1, "category_id": 1, "bbox": [1, 1, 2, 2]},
        ],
        "categories": [
            {"id": i + 1, "name": n}
            for i, n in enumerate(
                ["caption", "footnote", "formula", "list", "page_footer",
                 "page_header", "figure", "section_header", "table", "text", "title"]
            )
        ],
    }
    with open(d / "COCO" / "val.json", "w") as fh:
        json.dump(doc, fh)
    return str(d)


def test_doclaynet_like_fine_and_coarse(ray_session, doclaynet_dir):
    from deepdoctection_ray.datasets import get_dataset

    fine = get_dataset("doclaynet_like", location=doclaynet_dir).build("val").to_pandas()
    cats = [a["category"] for a in fine.iloc[0]["annotations"]]
    assert cats == ["page_header", "table", "caption"]
    coarse = (
        get_dataset("doclaynet_like", location=doclaynet_dir, coarse=True)
        .build("val").to_pandas()
    )
    # reference coarse_mapping: page_header→title, table→table, caption→text
    assert [a["category"] for a in coarse.iloc[0]["annotations"]] == ["title", "table", "text"]


@pytest.fixture(scope="module")
def xfund_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("xfund")
    def doc(lang, split):
        return {
            "documents": [
                {
                    "id": f"{lang}_{split}_0",
                    "img": {"fname": f"{lang}_{split}_0.jpg", "width": 200, "height": 100},
                    "document": [
                        {
                            "label": "question",
                            "words": [
                                {"box": [0, 0, 10, 10], "text": "Name"},
                                {"box": [12, 0, 22, 10], "text": ":"},
                            ],
                        },
                        {"label": "other", "words": [{"box": [0, 20, 30, 30], "text": "x"}]},
                    ],
                }
            ]
        }
    for lang in ("de", "fr"):
        for split in ("train", "val"):
            with open(d / f"{lang}.{split}.json", "w") as fh:
                json.dump(doc(lang, split), fh)
    # the default card lists all 7 languages; missing files are only opened
    # when their language is selected, so restrict annotation_files
    return str(d)


def test_xfund_like_bio_tags_and_language_filter(ray_session, xfund_dir):
    from deepdoctection_ray.datasets import get_dataset

    files = {s: [f"{l}.{s}.json" for l in ("de", "fr")] for s in ("train", "val")}
    ds = get_dataset("xfund_like", location=xfund_dir, annotation_files=files)
    df = ds.build("train").to_pandas()
    assert len(df) == 2  # one doc per language
    tags = [a["category"] for a in df.iloc[0]["annotations"]]
    assert tags == ["B-question", "I-question", "O"]
    only_de = get_dataset(
        "xfund_like", location=xfund_dir, annotation_files=files, languages="de"
    ).build("train").to_pandas()
    assert list(only_de["image_id"]) == ["de_train_0"]
    with pytest.raises(ValueError, match="unknown xfund languages"):
        get_dataset("xfund_like", location=xfund_dir, languages="xx")


@pytest.fixture(scope="module")
def rvlcdip_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("rvl")
    os.makedirs(d / "labels", exist_ok=True)
    with open(d / "labels" / "val.txt", "w") as fh:
        fh.write("imagesa/a/a.tif 0\nimagesb/b/b.tif 15\nimagesc/c/c.tif 11\n")
    return str(d)


def test_rvlcdip_like_document_type(ray_session, rvlcdip_dir):
    from deepdoctection_ray.datasets import get_dataset

    ds = get_dataset("rvlcdip_like", location=rvlcdip_dir)
    df = ds.build("val").to_pandas().sort_values("image_id").reset_index(drop=True)
    assert list(df["document_type"]) == ["letter", "memo", "invoice"]
    assert list(df["file_name"]) == ["a.tif", "b.tif", "c.tif"]
    assert all(len(a) == 0 for a in df["annotations"])
    assert ds.card.dataset_type == "sequence_classification"


@pytest.fixture(scope="module")
def voc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("voc")
    (d / "val").mkdir()

    def voc(filename, objs, w=600, h=400):
        parts = [f"<annotation><filename>{filename}</filename>",
                 f"<size><width>{w}</width><height>{h}</height></size>"]
        for name, x0, y0, x1, y1 in objs:
            parts.append(
                f"<object><name>{name}</name><bndbox><xmin>{x0}</xmin>"
                f"<ymin>{y0}</ymin><xmax>{x1}</xmax><ymax>{y1}</ymax>"
                f"</bndbox></object>"
            )
        parts.append("</annotation>")
        return "".join(parts)

    (d / "val" / "p1.xml").write_text(
        voc("p1.jpg", [("table", 10, 20, 200, 300), ("table rotated", -5, 0, 100, 500)])
    )
    (d / "val" / "p2.xml").write_text(voc("p2.jpg", []))  # empty → filtered
    return str(d)


def test_pubtables1m_like_det(ray_session, voc_dir):
    from deepdoctection_ray.datasets import get_dataset

    ds = get_dataset(
        "pubtables1m_like", location=voc_dir, variant="det",
        annotation_files={"val": "val"},
    )
    df = ds.build("val").to_pandas()
    assert len(df) == 1  # empty image filtered out
    anns = list(df.iloc[0]["annotations"])
    assert [a["category"] for a in anns] == ["table", "table_rotated"]
    rot = anns[1]
    assert (rot["x0"], rot["bottom"]) == (0.0, 400.0)  # clamped to frame
    assert df.iloc[0]["file_name"] == "p1.jpg"


def test_pubtables1m_variant_guard():
    from deepdoctection_ray.datasets import get_dataset

    with pytest.raises(ValueError, match="variant"):
        get_dataset("pubtables1m_like", location="/x", variant="bogus")


def test_iiitar13k_like_mapping(ray_session, tmp_path_factory):
    from deepdoctection_ray.datasets import get_dataset

    d = tmp_path_factory.mktemp("iiit")
    (d / "validation_xml").mkdir()
    (d / "validation_xml" / "r1.xml").write_text(
        "<annotation><filename>r1.png</filename>"
        "<size><width>100</width><height>100</height></size>"
        "<object><name>natural_image</name><bndbox><xmin>1</xmin><ymin>2</ymin>"
        "<xmax>30</xmax><ymax>40</ymax></bndbox></object>"
        "<object><name>table</name><bndbox><xmin>5</xmin><ymin>5</ymin>"
        "<xmax>50</xmax><ymax>50</ymax></bndbox></object>"
        "<object><name>signature</name><bndbox><xmin>0</xmin><ymin>0</ymin>"
        "<xmax>9</xmax><ymax>9</ymax></bndbox></object>"
        "</annotation>"
    )
    df = get_dataset("iiitar13k_like", location=str(d)).build("val").to_pandas()
    cats = [a["category"] for a in df.iloc[0]["annotations"]]
    # reference quirk kept verbatim: natural_image AND table both → figure
    assert cats == ["figure", "figure", "signature"]


def test_layouttest_like_prodigy(ray_session, tmp_path_factory):
    import json as _json

    from deepdoctection_ray.datasets import get_dataset

    d = tmp_path_factory.mktemp("prodigy")
    recs = [
        {
            "answer": "accept",
            "meta": {"file": "page1.png"},
            "width": 100,
            "height": 80,
            "spans": [
                {"label": "title", "points": [[10, 5], [90, 5], [90, 20], [10, 20]]},
                {"label": "text", "points": [[-3, 30], [50, 30], [50, 200], [-3, 200]]},
            ],
        },
        {"answer": "reject", "meta": {"file": "page2.png"}, "width": 100, "height": 80, "spans": []},
    ]
    with open(d / "xrf_layout_test.jsonl", "w") as fh:
        for r in recs:
            fh.write(_json.dumps(r) + "\n")
    df = get_dataset("layouttest_like", location=str(d)).build("test").to_pandas()
    assert len(df) == 1  # reject filtered
    anns = list(df.iloc[0]["annotations"])
    assert anns[0]["category"] == "title"
    assert (anns[0]["x0"], anns[0]["top"], anns[0]["x1"], anns[0]["bottom"]) == (10.0, 5.0, 90.0, 20.0)
    # clamped to frame
    assert (anns[1]["x0"], anns[1]["bottom"]) == (0.0, 80.0)
    assert df.iloc[0]["file_name"] == "page1.png"


def test_tile_html_table_spans():
    from deepdoctection_ray.datasets import tile_html_table

    # 3x3 grid: header row with a colspan-2 cell; body has a rowspan-2 cell.
    tokens = [
        "<thead>", "<tr>", "<td", 'colspan="2"', ">", "<td>", "</tr>", "</thead>",
        "<tbody>", "<tr>", "<td", 'rowspan="2"', ">", "<td>", "<td>", "</tr>",
        "<tr>", "<td>", "<td>", "</tr>", "</tbody>",
    ]
    cells = tile_html_table(tokens)
    assert [
        (c["row_number"], c["column_number"], c["row_span"], c["column_span"], c["header"])
        for c in cells
    ] == [
        (1, 1, 1, 2, True),
        (1, 3, 1, 1, True),
        (2, 1, 2, 1, False),
        (2, 2, 1, 1, False),
        (2, 3, 1, 1, False),
        (3, 2, 1, 1, False),  # col 1 occupied by the rowspan cell
        (3, 3, 1, 1, False),
    ]


@pytest.fixture(scope="module")
def fintabnet_dir(tmp_path_factory):
    import json as _json

    d = tmp_path_factory.mktemp("ftn")
    rec = {
        "filename": "A/2003/page_1.pdf",
        "table_id": "t1",
        "width": 612,
        "height": 792,
        # PDF coords: origin bottom-left. Table occupies y [92, 692] from the
        # bottom → image coords top=792-692=100, bottom=792-92=700.
        "bbox": [50, 92, 550, 692],
        "html": {
            "structure": {"tokens": [
                "<thead>", "<tr>", "<td>", "<td>", "</tr>", "</thead>",
                "<tbody>", "<tr>", "<td>", "<td>", "</tr>", "</tbody>",
            ]},
            "cells": [
                {"tokens": ["h1"], "bbox": [60, 600, 290, 680]},
                {"tokens": ["h2"], "bbox": [310, 600, 540, 680]},
                {"tokens": ["a"], "bbox": [60, 100, 290, 580]},
                {"tokens": []},  # empty cell: no box annotation, keeps grid slot
            ],
        },
    }
    with open(d / "FinTabNet_1.0.0_table_val.jsonl", "w") as fh:
        fh.write(_json.dumps(rec) + "\n")
    return str(d)


def test_fintabnet_like_yflip_and_grid(ray_session, fintabnet_dir):
    from deepdoctection_ray.datasets import get_dataset

    df = get_dataset("fintabnet_like", location=fintabnet_dir).build("val").to_pandas()
    assert len(df) == 1
    row = df.iloc[0]
    anns = list(row["annotations"])
    table = anns[0]
    assert table["category"] == "table"
    assert (table["x0"], table["top"], table["x1"], table["bottom"]) == (50.0, 100.0, 550.0, 700.0)
    by_cat = {}
    for a in anns:
        by_cat.setdefault(a["category"], []).append(a)
    # header split: 2 column_header cells, 1 boxed body cell
    assert len(by_cat["column_header"]) == 2 and len(by_cat["body"]) == 1
    h1 = by_cat["column_header"][0]
    assert (h1["top"], h1["bottom"]) == (792.0 - 680.0, 792.0 - 600.0)  # y-flip
    # rows_and_cols: 2 row items + 2 column items
    assert len(by_cat["row"]) == 2 and len(by_cat["column"]) == 2
    # grid column aligned with boxed cells only (empty cell dropped)
    cells = list(row["cells"])
    assert [(c["row_number"], c["column_number"], c["header"]) for c in cells] == [
        (1, 1, True), (1, 2, True), (2, 1, False),
    ]
    assert row["file_name"] == "pdf/A/2003/page_1.pdf"


def test_fintabnet_like_table_crop(ray_session, fintabnet_dir):
    from deepdoctection_ray.datasets import get_dataset

    df = (
        get_dataset("fintabnet_like", location=fintabnet_dir, build_mode="table", rows_and_cols=False)
        .build("val")
        .to_pandas()
    )
    row = df.iloc[0]
    assert (row["width"], row["height"]) == (500.0, 600.0)
    cats = [a["category"] for a in row["annotations"]]
    assert "table" not in cats and "row" not in cats
    h1 = row["annotations"][0]
    # translated into the table frame: (60-50, 112-100)
    assert (h1["x0"], h1["top"]) == (10.0, 12.0)


def test_tile_html_table_real_token_vocabulary():
    """PubTabNet/FinTabNet emit attribute tokens with a LEADING SPACE
    (' colspan=\"2\"') — the tiler must parse that shape, not only the
    space-less test vocabulary."""
    from deepdoctection_ray.datasets import tile_html_table

    tokens = [
        "<thead>", "<tr>", "<td", ' colspan="2"', ">", "<td>", "</tr>", "</thead>",
        "<tbody>", "<tr>", "<td", ' rowspan="2"', ">", "<td>", "<td>", "</tr>",
        "<tr>", "<td>", "<td>", "</tr>", "</tbody>",
    ]
    cells = tile_html_table(tokens)
    assert [(c["row_number"], c["column_number"], c["row_span"], c["column_span"]) for c in cells] == [
        (1, 1, 1, 2), (1, 3, 1, 1),
        (2, 1, 2, 1), (2, 2, 1, 1), (2, 3, 1, 1),
        (3, 2, 1, 1), (3, 3, 1, 1),
    ]
