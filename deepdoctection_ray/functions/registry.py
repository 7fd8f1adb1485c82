"""Stage and category registries — the user-extension surface.

Parity with the reference's ``pipeline_component_registry``
(``pipe/registry.py:29``), ``object_types_registry`` + runtime enum
registration (``object_types.py:60-126``, ``:307-331``): users plug in new
extraction stages (callable classes for actor pools) and new block-category
vocabularies without touching engine code.
"""

from __future__ import annotations

from typing import Callable


class Registry:
    """Name → object registry with a decorator interface."""

    def __init__(self, kind: str) -> None:
        self._kind = kind
        self._items: dict[str, object] = {}

    def register(self, name: str, obj: object | None = None):
        if obj is not None:
            self._items[name] = obj
            return obj

        def deco(target):
            self._items[name] = target
            return target

        return deco

    def get(self, name: str):
        if name not in self._items:
            raise KeyError(f"unknown {self._kind}: {name!r}; known: {sorted(self._items)}")
        return self._items[name]

    def names(self) -> list[str]:
        return sorted(self._items)


stage_registry = Registry("stage")
category_registry = Registry("category-set")

# built-in category vocabularies (object_types.py:482-546 LayoutLabel subset)
category_registry.register(
    "layout",
    frozenset(
        {
            "text", "title", "list", "list_item", "table", "figure", "cell",
            "caption", "page_header", "page_footer", "page_number", "mark",
            "key_value_area", "line", "word",
        }
    ),
)


def register_categories(name: str, labels: list[str]) -> frozenset:
    """``register_string_categories_from_list`` analog (``object_types.py:307``)."""
    fs = frozenset(labels)
    category_registry.register(name, fs)
    return fs


def _register_builtin_stages() -> None:
    from ..stages.classify import SequenceClassifier, TokenClassifier
    from ..stages.extract import TurnExtractor
    from ..stages.text_stats import LanguageId

    stage_registry.register("turn_extractor", TurnExtractor)
    stage_registry.register("language_id", LanguageId)
    stage_registry.register("token_classifier", TokenClassifier)
    stage_registry.register("sequence_classifier", SequenceClassifier)


_register_builtin_stages()

metric_registry = Registry("metric")


def _register_builtin_metrics() -> None:
    """``eval/registry.py`` analog: the metric catalogue the Evaluator looks
    up by name (``metric_registry.register``; instances ``accmetric.py:81-226``,
    ``cocometric.py``, ``tedsmetric.py:110-233``)."""
    from .eval_extras import coco_map, teds
    from .metrics import accuracy, confusion_matrix, precision_recall_f1

    metric_registry.register("accuracy", accuracy)
    metric_registry.register("confusion", confusion_matrix)
    metric_registry.register("precision_recall_f1", precision_recall_f1)
    metric_registry.register("coco_map", coco_map)
    metric_registry.register("teds", teds)


_register_builtin_metrics()


def build_stage(name: str, **kwargs) -> Callable:
    """Instantiate a registered stage class (for config-driven pipelines —
    the ``ServiceFactory.build_*`` analog, ``analyzer/factory.py:90-1807``)."""
    return stage_registry.get(name)(**kwargs)
