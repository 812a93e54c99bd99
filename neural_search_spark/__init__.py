"""PySpark-native inverted-index + BM25 engine with training-data pipeline ops.

Public surface (lazy imports — a bare ``import neural_search_spark`` stays
cheap and never touches the JVM):

    from neural_search_spark import build_index, load_index, bm25_topk_wand
    from neural_search_spark import add_documents, remove_documents
    from neural_search_spark import SearchEngine
"""

from __future__ import annotations

__version__ = "0.1.0"

_EXPORTS = {
    "get_spark": "neural_search_spark.session",
    "build_index": "neural_search_spark.index.build",
    "load_index": "neural_search_spark.index.build",
    "add_documents": "neural_search_spark.index.maintenance",
    "remove_documents": "neural_search_spark.index.maintenance",
    "build_logical_index": "neural_search_spark.index.stats",
    "bm25_topk": "neural_search_spark.query.bm25_dataframe",
    "bm25_topk_single": "neural_search_spark.query.bm25_dataframe",
    "bm25_topk_wand": "neural_search_spark.query.bm25_wand",
    "SearchEngine": "neural_search_spark.plans.engine",
    "hybrid_fuse": "neural_search_spark.operators.fusion",
    "rrf_fuse": "neural_search_spark.operators.fusion",
    "compile_filters": "neural_search_spark.operators.filters",
}

__all__ = sorted(_EXPORTS)


def __getattr__(name: str):
    if name in _EXPORTS:
        import importlib

        return getattr(importlib.import_module(_EXPORTS[name]), name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
