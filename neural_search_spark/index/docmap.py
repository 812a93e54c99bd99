"""Deterministic dense doc-id assignment at scale.

The reference's doc ids are list positions in insertion order
(``/root/reference/src/neural_search/core/hybrid.py:65-66,86-88``). The
distributed stand-in (SURVEY.md §7.3.6) is a deterministic total order by
``url``. A naive ``row_number() OVER (ORDER BY url)`` collapses to a single
partition — a non-starter at 10^12 rows — so we use the TeraSort pattern:

  1. range-partition by url + sort within partitions (scalable global sort),
  2. tiny job counting rows per partition -> driver-side offsets,
  3. mapInPandas assigning ``offset[pid] + local_position``.

The partitioned DataFrame is persisted between passes so both see identical
partitioning.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark import StorageLevel, TaskContext
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def find_doc_id_col(df: DataFrame) -> str | None:
    """The column of ``df`` that resolves as ``doc_id`` under the session's
    column-resolution rules, or None.

    Spark resolves column references case-insensitively by default, so a
    ``DOC_ID`` column collides with an appended ``doc_id`` just as surely as
    an exact-case one — UNLESS the session runs with
    ``spark.sql.caseSensitive=true``, where only the exact-case name
    collides. One shared resolver for ``assign_doc_ids``' clash guard and
    the pack CLI's use-existing-column check, so the two sites cannot drift.
    """
    exact = next((c for c in df.columns if c == "doc_id"), None)
    if exact is not None:
        return exact
    case_sensitive = (
        str(df.sparkSession.conf.get("spark.sql.caseSensitive", "false")).lower()
        == "true"
    )
    if case_sensitive:
        return None
    return next((c for c in df.columns if c.lower() == "doc_id"), None)


def assign_doc_ids(
    corpus: DataFrame,
    order_col: str = "url",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append ``doc_id`` = dense rank of ``order_col`` (0-based, no gaps)."""
    clash = find_doc_id_col(corpus)
    if clash is not None:
        # appending a second doc_id column would only surface much later as
        # an AMBIGUOUS_REFERENCE inside whatever consumes the frame — fail
        # here, at the call that caused it
        raise ValueError(
            f"corpus already has a doc_id column ({clash!r}); pass "
            "id_col='doc_id' to build_index (or drop/rename the column) "
            "instead of re-assigning"
        )
    spark = corpus.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    parts = corpus.repartitionByRange(n, F.col(order_col)).sortWithinPartitions(order_col)
    parts.persist(StorageLevel.MEMORY_AND_DISK)

    counts = (
        parts.select(F.spark_partition_id().alias("pid"))
        .groupBy("pid")
        .count()
        .collect()
    )
    by_pid = {r["pid"]: r["count"] for r in counts}
    offsets: dict[int, int] = {}
    acc = 0
    for pid in range(max(by_pid, default=-1) + 1):
        offsets[pid] = acc
        acc += by_pid.get(pid, 0)
    boff = spark.sparkContext.broadcast(offsets)

    out_schema = T.StructType(
        [T.StructField("doc_id", T.LongType(), False)] + list(parts.schema.fields)
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ctx = TaskContext.get()
        pos = boff.value.get(ctx.partitionId(), 0)
        for pdf in batches:
            ids = range(pos, pos + len(pdf))
            pos += len(pdf)
            out = pdf.copy()
            out.insert(0, "doc_id", pd.Series(list(ids), dtype="int64"))
            yield out

    return parts.mapInPandas(kernel, schema=out_schema)
