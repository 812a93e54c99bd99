"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash). Implementations live in ``neural_search_spark/plans/driver_entry.py``
(and sibling modules); this file only routes.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from neural_search_spark.plans import driver_entry, pipeline_entry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: batch BM25 match-mode top-k over the sf0.001 documents table.

    (Match mode because the driver corpus's degenerate vocabulary floors every
    idf negative; the reference-parity score>0 variant — which is then empty on
    this corpus, exactly like the reference engine — is ``queries()['bm25_topk']``.)
    """
    return driver_entry.q_bm25_topk_all(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {**driver_entry.base_queries(), **pipeline_entry.pipeline_queries()}


def oracle_sql() -> dict[str, str]:
    return {**driver_entry.base_oracles(), **pipeline_entry.pipeline_oracles()}
