"""Aggregated query catalog: every implemented operator from SURVEY §2.

``__spark_entry__.py`` (the driver contract) is a thin adapter over this.
"""

from __future__ import annotations

from .registry import QuerySpec


def all_specs() -> dict[str, QuerySpec]:
    from . import pipeline, relational

    specs: dict[str, QuerySpec] = {}
    for module in (pipeline, relational):
        overlap = specs.keys() & module.SPECS.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {sorted(overlap)}")
        specs.update(module.SPECS)
    for module_name in (
        "similarity",
        "textanalysis",
        "streaming_queries",
        "multimodal",
        "advanced",
        "analytics",
        "mllib_lsh",
        "tpch",
        "traindata",
        "olap",
        "vectorops",
        "scale_queries",
        "formats",
    ):
        try:
            import importlib

            m = importlib.import_module(f".{module_name}", __package__)
        except ImportError:
            continue
        specs.update(m.SPECS)
    return specs
