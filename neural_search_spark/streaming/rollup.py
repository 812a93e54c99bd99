"""Continuous rollup: an incrementally-maintained hourly aggregate table
(the hypertable "continuous aggregate" pattern) over the events stream.

Each micro-batch folds its partial aggregates into the rollup table by
merging on (hour, event_type): only the hours TOUCHED by the batch are
rewritten (dynamic partition replacement keyed by day), so maintaining the
rollup costs O(batch), not O(history). Downstream queries (daily/weekly
stats, dashboards) read the rollup — hours-of-events per row instead of raw
events — which is the point at 10^12-event scale.

Only MERGEABLE aggregates live in the rollup (count, sum, min, max):
partials from any batch split combine associatively, so the rollup equals
the from-raw aggregate exactly (tested). Non-mergeable measures (exact
distinct users) intentionally stay out — at scale you'd store an HLL/theta
sketch per row; the exact variant lives in the batch entry
(pipeline_entry.q_events_windowed).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ROLLUP_COLS = ["day", "hour", "event_type", "n_events", "sum_value", "min_value", "max_value"]


def _hourly_partials(events: DataFrame) -> DataFrame:
    return (
        events.groupBy(
            F.date_trunc("hour", "ts").alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
        .withColumn("day", F.to_date("hour"))
    )


def _merge_into_rollup(spark: SparkSession, rollup_dir: str, partials: DataFrame) -> None:
    """Fold batch partials into the rollup, rewriting only the touched days.

    Staged read-before-delete swap (the parquet stand-in for Iceberg MERGE
    snapshot isolation, same pattern as index/maintenance.py).
    """
    partials = partials.localCheckpoint(eager=True)
    touched_days = [r["day"] for r in partials.select("day").distinct().collect()]
    if not touched_days:
        return
    exists = os.path.exists(os.path.join(rollup_dir, "_SUCCESS")) or any(
        d.startswith("day=") for d in (os.listdir(rollup_dir) if os.path.exists(rollup_dir) else [])
    )
    if exists:
        current = spark.read.parquet(rollup_dir).where(F.col("day").isin(touched_days))
        combined = current.unionByName(partials.select(*ROLLUP_COLS))
    else:
        combined = partials.select(*ROLLUP_COLS)
    merged = combined.groupBy("day", "hour", "event_type").agg(
        F.sum("n_events").alias("n_events"),
        F.sum("sum_value").alias("sum_value"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    ).select(*ROLLUP_COLS)

    staging = rollup_dir + "__staging"
    shutil.rmtree(staging, ignore_errors=True)
    merged.write.mode("overwrite").partitionBy("day").parquet(staging)
    for d in touched_days:
        shutil.rmtree(os.path.join(rollup_dir, f"day={d}"), ignore_errors=True)
    spark.read.parquet(staging).write.mode("append").partitionBy("day").parquet(rollup_dir)
    shutil.rmtree(staging, ignore_errors=True)


def rollup_events_stream(
    events_stream: DataFrame,
    rollup_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """writeStream: fold each micro-batch into the hourly rollup table."""
    spark = events_stream.sparkSession

    def commit(batch_df: DataFrame, batch_id: int) -> None:
        _merge_into_rollup(spark, rollup_dir, _hourly_partials(batch_df))

    writer = (
        events_stream.writeStream.foreachBatch(commit)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def daily_from_rollup(spark: SparkSession, rollup_dir: str) -> DataFrame:
    """Daily stats computed FROM the hourly rollup — never re-reads raw
    events; at scale this scans hours-of-events-sized rows."""
    return (
        spark.read.parquet(rollup_dir)
        .groupBy("day", "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    )
