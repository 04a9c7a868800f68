"""Operator library. Importing ``load_all`` registers every query."""

from __future__ import annotations

_MODULES = (
    "relational",
    "metrics",
    "cv",
    "permutation",
    "distance",
    "text",
    "dedup",
    "similarity",
    "importance",
    "tuning",
    "reduction",
    "multimodal",
    "udf_surface",
    "tpch",
    "temporal",
    "pipeline",
    "retrieval",
    "tokenizer",
    "graph",
    "layout",
)


def load_all() -> None:
    import importlib

    for m in _MODULES:
        try:
            importlib.import_module(f".{m}", __package__)
        except ModuleNotFoundError as e:
            # modules land incrementally during the build; only swallow
            # the "not written yet" case, never real import errors
            if e.name and e.name.endswith(f".{m}"):
                continue
            raise
