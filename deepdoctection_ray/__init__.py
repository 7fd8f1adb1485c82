"""deepdoctection_ray — a Ray-Data-native main-content extraction engine.

Rebuilds the *semantics* of deepdoctection (layout-region detection →
parent/child matching → reading-order sort → per-region text assembly →
plain-text normalization) as idiomatic ``ray.data.Dataset`` pipelines over
Parquet transcript tables ``(conv_id, turn_idx, role, text, tool, ts)``.

Layout:
    kernels/    pure numpy/python kernels (no Ray): boxes, reading order,
                text-line synthesis, ioa matching, NMS, HTML boilerplate
                stripping, pdf-layout parsing, assembly, normalization.
    stages/     Ray Data stage wrappers: actor-pool extraction, dedup,
                similarity search, text analysis, multimodal plumbing.
    pipelines/  end-to-end pipelines: extraction with checkpoint/lineage,
                conversation ordering, relational demos.
    functions/  DataFlow-combinator parity (map/flatten/concat/zip/...)
                expressed as Dataset operations.
    sources.py  readers/writers (jsonl, tabsep, files, coco-join, parquet).
    synth.py    deterministic synthetic transcript generator + pure-python
                oracle (golden fixtures).

Reference: deepdoctection/deepdoctection (read-only at /root/reference).
Citations in docstrings are file:line into that tree. No code is copied;
the execution engine here is Ray Data (streaming blocks, actor pools,
hash-partitioned shuffles), not the reference's single-record DataFlow.
"""

__version__ = "0.3.0"


def get_analyzer(config_overwrite=None):
    """Lazy re-export of :func:`deepdoctection_ray.analyzer.get_analyzer`."""
    from .analyzer import get_analyzer as _g

    return _g(config_overwrite)


def __getattr__(name):
    # lazy attribute access keeps `import deepdoctection_ray` Ray-free
    if name == "Page":
        from .view import Page

        return Page
    raise AttributeError(name)
