"""Continuous rollup: an incrementally-maintained hourly aggregate table
(the hypertable "continuous aggregate" pattern) over the events stream.

Each micro-batch folds its partial aggregates into the rollup table by
merging on (hour, event_type): only the hours TOUCHED by the batch are
rewritten (dynamic partition replacement keyed by day), so maintaining the
rollup costs O(batch), not O(history). Downstream queries (daily/weekly
stats, dashboards) read the rollup — hours-of-events per row instead of raw
events — which is the point at 10^12-event scale.

Only MERGEABLE aggregates live in the rollup (count, sum, min, max, and the
HLL register map for distinct users): partials from any batch split combine
associatively, so the rollup equals the from-raw aggregate exactly (tested).
Exact distinct counts are NOT mergeable and stay out; the sketch column
(``user_regs``, a <= 2^p-entry map per row merged register-wise) gives the
distinct-users estimate at any granularity — per hour, per day, per week —
without ever re-reading raw events, which is the point of a continuous
aggregate at 10^12-event scale.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sketches import (
    hll_estimate_from_map,
    hll_merge_maps_col,
    hll_register_rho,
)

ROLLUP_COLS = [
    "day", "hour", "event_type",
    "n_events", "sum_value", "min_value", "max_value", "user_regs",
]


def _hourly_partials(events: DataFrame) -> DataFrame:
    # ONE scan: every metric is mergeable, so aggregating at the finer
    # (hour, event_type, register) grain first and re-aggregating to
    # (hour, event_type) computes metrics + the register map without a
    # second pass or a join (registers partition the events, so the metric
    # re-aggregation is exact).
    reg, rho = hll_register_rho(F.col("user_id"))
    fine = (
        events.select(
            F.date_trunc("hour", "ts").alias("hour"),
            "event_type",
            reg.cast("int").alias("reg"),
            rho.cast("int").alias("rho"),
            "value",
        )
        .groupBy("hour", "event_type", "reg")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.max("rho").alias("mreg"),
        )
    )
    return (
        fine.groupBy("hour", "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("sum_value").alias("sum_value"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
            F.map_from_entries(
                F.collect_list(F.struct(F.col("reg"), F.col("mreg")))
            ).alias("user_regs"),
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
        hll_merge_maps_col(F.collect_list("user_regs")).alias("user_regs"),
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


def distinct_users_from_rollup(
    spark: SparkSession, rollup_dir: str, by: str = "day"
) -> DataFrame:
    """(day|hour, event_type, est_users): HLL distinct-user estimates at any
    rollup granularity, from the stored register maps alone — merging hour
    sketches register-wise IS the sketch of the union, so the daily estimate
    equals a from-raw daily sketch exactly (tested) while reading
    hours-of-events-sized rows."""
    grp = ["day", "event_type"] if by == "day" else ["hour", "event_type"]
    merged = (
        spark.read.parquet(rollup_dir)
        .groupBy(*grp)
        .agg(hll_merge_maps_col(F.collect_list("user_regs")).alias("regs"))
    )
    return merged.select(*grp, hll_estimate_from_map(F.col("regs")).alias("est_users"))
