"""Structured Streaming ingest: continuous corpus indexing + event analytics.

Two streaming surfaces:

1. **Streaming corpus ingest → incremental index** (``stream_index_corpus``):
   a file-source stream over a corpus directory (new parquet files = new
   ingest batches, exactly how a Common-Crawl dump lands on object storage),
   with ``foreachBatch`` committing each micro-batch through the incremental
   maintenance path (index/maintenance.py). Exactly-once story: Structured
   Streaming's checkpoint tracks which source files are committed, and the
   index build's own shard manifest makes the per-batch commit idempotent —
   a batch replayed after a crash rebuilds the same shards to the same bytes
   (dedup on url inside the batch handles at-least-once file delivery).

2. **Windowed event analytics with late data** (``windowed_event_counts``):
   event-time tumbling windows + watermark over the ``events`` stream shape
   (driver testdata events.parquet), the standard aggregation the reference's
   Prometheus counters approximate (SURVEY.md §2.8 C2 — theirs are
   process-local and lossy; these are event-time-correct with bounded state).

At scale both run unchanged: the file source lists new objects per trigger,
maxFilesPerTrigger bounds batch size, and state for the windowed agg is
bounded by the watermark horizon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORPUS_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def stream_corpus(
    spark: SparkSession, path: str, max_files_per_trigger: int = 4
) -> DataFrame:
    """File-source stream over a corpus directory of parquet files."""
    return (
        spark.readStream.schema(CORPUS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def stream_index_corpus(
    corpus_stream: DataFrame,
    corpus_path: str,
    index_dir: str,
    checkpoint_dir: str,
    layout=None,
    n_buckets: int = 16,
    available_now: bool = True,
):
    """writeStream: each micro-batch of new corpus files is appended to the
    index via incremental maintenance (or a first full build).

    Returns the StreamingQuery. With ``available_now`` the stream drains all
    currently-available files then stops — the batch-backfill trigger; a
    deployment would use a processingTime trigger instead.
    """
    import os

    from ..config import DEFAULT_LAYOUT
    from ..index.build import build_index
    from ..index.maintenance import add_documents

    layout = layout or DEFAULT_LAYOUT
    spark = corpus_stream.sparkSession

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        # at-least-once file delivery -> drop urls already in the index
        new_docs = batch_df.dropDuplicates(["url"])
        if not os.path.exists(os.path.join(index_dir, "_checkpoint.json")):
            build_index(new_docs, index_dir, layout=layout, n_buckets=n_buckets)
            return
        full = spark.read.parquet(corpus_path)
        # add_documents itself anti-joins already-indexed urls (idempotent
        # under replays), so the batch goes in as-is
        add_documents(full, index_dir, new_docs)

    writer = (
        corpus_stream.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_events(
    spark: SparkSession, path: str, max_files_per_trigger: int = 8
) -> DataFrame:
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time tumbling-window counts/sums per event_type, late-data-safe.

    The watermark bounds state: windows older than (max event time seen -
    watermark) are finalized and evicted; later-arriving events for them are
    dropped by contract. Works identically on a static DataFrame (tests
    compare against the batch result).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_duration).alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
            F.approx_count_distinct("user_id").alias("approx_users"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
            "approx_users",
        )
    )


def run_windowed_events_to_memory(
    spark: SparkSession,
    events_path: str,
    checkpoint_dir: str,
    table_name: str = "windowed_events",
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
):
    """Drive the windowed agg as a real stream into a memory sink (complete
    mode), draining available files; returns the StreamingQuery."""
    ev = stream_events(spark, events_path)
    agg = windowed_event_counts(ev, window_duration, watermark)
    return (
        agg.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def windowed_hll_partial(
    events: DataFrame,
    value_col: str = "user_id",
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    p: int = 8,
) -> DataFrame:
    """Per-(window, event_type) HLL register rows — the STREAMING stage of a
    windowed distinct-count (the ES ``cardinality`` agg with bounded state):
    one stateful aggregation whose state per group is at most 2^p register
    rows (``max(rho)`` merges incrementally), vs the unbounded distinct set
    an exact count would hold. The sink stores the registers (the durable,
    mergeable sketch); :func:`finish_windowed_hll` turns them into estimates
    at read time — the classic two-stage sketch pipeline, which also keeps
    the streaming plan to a single stateful operator."""
    from ..operators.sketches import hll_register_rho

    reg, rho = hll_register_rho(F.col(value_col), p=p)
    return (
        events.withWatermark("ts", watermark)
        .select(
            F.window("ts", window_duration).alias("win"),
            "event_type",
            reg.alias("reg"),
            rho.alias("rho"),
        )
        .groupBy("win", "event_type", "reg")
        .agg(F.max("rho").alias("mreg"))
    )


def finish_windowed_hll(partials: DataFrame, p: int = 8) -> DataFrame:
    """(window_start, event_type, est_distinct) from stored register rows."""
    from ..operators.sketches import hll_estimate

    est = hll_estimate(partials, ["win", "event_type"], p=p)
    return est.select(
        F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "est_distinct",
    )


def windowed_distinct_hll(
    events: DataFrame,
    value_col: str = "user_id",
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    p: int = 8,
) -> DataFrame:
    """Batch composition of partial + finish (the driver-entry form; the
    estimate is the same md5-derived register arithmetic in batch, stream,
    and the SQL oracle, so all three agree bit-for-bit on the same rows)."""
    return finish_windowed_hll(
        windowed_hll_partial(events, value_col, window_duration, watermark, p=p),
        p=p,
    )


def windowed_cms_partial(
    events: DataFrame,
    value_col: str = "user_id",
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    d: int = 4,
    w: int = 1024,
) -> DataFrame:
    """Per-(window, event_type) Count-Min counter rows — the STREAMING stage
    of a windowed heavy-hitter count (the frequency twin of
    :func:`windowed_hll_partial`): ONE stateful aggregation whose state per
    group is at most d*w counter rows (``sum`` merges incrementally), vs the
    unbounded per-value map an exact frequency count holds. The sink stores
    the counters (durable, mergeable by addition across windows/slices);
    :func:`finish_windowed_cms` ranks candidates at read time. A single
    stateful operator, same as the HLL form — a chained agg would trip
    Structured Streaming's statefulOperator.checkCorrectness."""
    from ..operators.cms import cms_partial

    src = events.withWatermark("ts", watermark).select(
        F.window("ts", window_duration).alias("win"),
        "event_type",
        F.col(value_col).cast("string").alias("val"),
    )
    # the batch operator IS the streaming partial (one groupBy = one
    # stateful agg); a single bucket-derivation site keeps streaming
    # partials, batch sketches, and the SQL oracle in lockstep
    return cms_partial(src, "val", group_cols=["win", "event_type"], d=d, w=w)


def finish_windowed_cms(
    partials: DataFrame,
    candidates: DataFrame,
    value_col: str = "val",
    k: int = 5,
    d: int = 4,
    w: int = 1024,
) -> DataFrame:
    """(window_start, event_type, rank, val, est_count): top-k candidates per
    (window, event_type) from stored counter rows — grouped min-over-depth
    estimation, then a group-bounded ranking window (ties: val asc on the
    exact integer estimates)."""
    from pyspark.sql import Window

    from ..operators.cms import cms_estimate_grouped

    est = cms_estimate_grouped(
        partials, candidates, ["win", "event_type"], value_col=value_col, d=d, w=w
    )
    rank_w = Window.partitionBy("win", "event_type").orderBy(
        F.desc("est_count"), F.asc("val")
    )
    # rank only candidates the sketch actually saw: cms_estimate_grouped
    # returns the full (group x candidate) domain with zeros, and a "heavy
    # hitter" with estimate 0 is a contradiction — zeros would pad top-k
    # with arbitrary val-ordered absentees (oracle applies the same cut)
    return (
        est.where(F.col("est_count") > 0)
        .withColumn("rank", F.row_number().over(rank_w))
        .where(F.col("rank") <= k)
        .select(
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            F.col("rank").cast("long").alias("rank"),
            "val",
            "est_count",
        )
    )


def windowed_heavy_hitters_cms(
    events: DataFrame,
    candidates: DataFrame,
    value_col: str = "user_id",
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    k: int = 5,
    d: int = 4,
    w: int = 1024,
) -> DataFrame:
    """Batch composition of partial + finish (the driver-entry form; the
    counter arithmetic is identical in batch, stream, and the SQL oracle)."""
    return finish_windowed_cms(
        windowed_cms_partial(events, value_col, window_duration, watermark, d=d, w=w),
        candidates,
        k=k,
        d=d,
        w=w,
    )


def windowed_hist_partial(
    events: DataFrame,
    bounds: tuple[float, float],
    value_col: str = "value",
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    nbins: int = 64,
) -> DataFrame:
    """Per-(window, event_type) histogram bin counts — the distribution
    member of the streaming sketch trio (distinct=HLL, frequency=CMS,
    distribution=this): ONE stateful aggregation with <= nbins counter rows
    of state per group. The [lo, hi] frame MUST be pinned up front — a
    derived min/max frame needs the whole stream before any bin is known,
    so streaming histograms are always built against fixed bounds (which is
    also what makes per-window partials mergeable into daily rollups)."""
    from ..operators.histogram import hist_partial

    src = events.withWatermark("ts", watermark).select(
        F.window("ts", window_duration).alias("win"),
        "event_type",
        F.col(value_col).alias("val"),
    )
    # the batch operator IS the streaming partial (one groupBy = one
    # stateful agg); the pinned bounds keep the frame derivation out of the
    # plan, which is what makes this legal under streaming at all
    return hist_partial(
        src, "val", group_cols=["win", "event_type"], nbins=nbins, bounds=bounds
    )


def finish_windowed_hist(
    partials: DataFrame, qs: list[float], nbins: int = 64, rounding: int = 4
) -> DataFrame:
    """(window_start, event_type, q, est) from stored bin counts — the same
    exact-integer rank location + interpolation as the batch sketch."""
    from ..operators.histogram import hist_quantiles

    est = hist_quantiles(
        partials, qs, ["win", "event_type"], nbins=nbins, rounding=rounding
    )
    return est.select(
        F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        "event_type",
        "q",
        "est",
    )


def windowed_quantiles_hist(
    events: DataFrame,
    bounds: tuple[float, float],
    qs: list[float],
    value_col: str = "value",
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
    nbins: int = 64,
    rounding: int = 4,
) -> DataFrame:
    """Batch composition of partial + finish (the driver-entry form)."""
    return finish_windowed_hist(
        windowed_hist_partial(
            events, bounds, value_col, window_duration, watermark, nbins=nbins
        ),
        qs,
        nbins=nbins,
        rounding=rounding,
    )
