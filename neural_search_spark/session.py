"""SparkSession factory tuned for the index-build / query workloads.

Local mode stands in for a multi-executor cluster; every setting here is the
one we'd ship on a real 1000-executor deployment (AQE on, Arrow on, sane
shuffle sizing). Nothing below depends on local mode.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from .config import default_parallelism


def get_spark(
    app_name: str = "neural-search-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cores = default_parallelism()
    master = master or os.environ.get("SPARK_MASTER", f"local[{cores}]")
    shuffle = shuffle_partitions or cores
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # only effective for the first session in a process (the JVM is
        # reused after spark.stop()); benchmark runs use one process per
        # parallelism level so this always applies there
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.default.parallelism", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    return builder.getOrCreate()
