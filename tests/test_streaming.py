"""Structured Streaming: incremental index ingest and windowed event aggs.

Both streams run with trigger(availableNow) so tests are deterministic:
drain everything currently on disk, then compare to the batch answer.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neural_search_spark.config import IndexLayout
from neural_search_spark.corpus import corpus_df, queries_df
from neural_search_spark.index.build import build_index, load_index
from neural_search_spark.query.bm25_wand import bm25_topk_wand
from neural_search_spark.streaming.ingest import (
    run_windowed_events_to_memory,
    stream_corpus,
    stream_index_corpus,
    windowed_event_counts,
)

LAYOUT = IndexLayout(docs_per_shard=64, block_size=16)


def _topk_by_url(spark, idx):
    res = bm25_topk_wand(idx, queries_df(spark), positive_only=False)
    with_url = res.join(idx.docmap.select("doc_id", "url"), "doc_id")
    out: dict = {}
    for r in with_url.collect():
        out.setdefault(r["query_id"], set()).add((r["url"], round(r["score"], 9)))
    return out


def test_streaming_ingest_matches_batch_build(spark, tmp_path):
    corpus_path = str(tmp_path / "corpus")
    # 8 files -> with maxFilesPerTrigger=3 the stream commits 3 micro-batches
    corpus_df(spark, n_docs=150, seed=42).repartition(8).write.parquet(corpus_path)

    index_dir = str(tmp_path / "index")
    q = stream_index_corpus(
        stream_corpus(spark, corpus_path, max_files_per_trigger=3),
        corpus_path,
        index_dir,
        checkpoint_dir=str(tmp_path / "ckpt"),
        layout=LAYOUT,
        n_buckets=8,
    )
    q.awaitTermination(300)

    streamed = load_index(spark, index_dir)
    fresh = build_index(
        spark.read.parquet(corpus_path),
        str(tmp_path / "fresh"),
        layout=LAYOUT,
        n_buckets=8,
    )
    assert streamed.stats.n_docs == 150 == fresh.stats.n_docs
    assert streamed.stats.avgdl == pytest.approx(fresh.stats.avgdl, rel=1e-12)
    assert streamed.stats.average_idf == pytest.approx(fresh.stats.average_idf, rel=1e-12)
    assert _topk_by_url(spark, streamed) == _topk_by_url(spark, fresh)


def test_windowed_events_stream_matches_batch(spark, tmp_path):
    # the file-stream source needs a directory of files, not a single file
    events_path = str(tmp_path / "events")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").repartition(
        4
    ).write.parquet(events_path)
    q = run_windowed_events_to_memory(
        spark, events_path, str(tmp_path / "ckpt"), table_name="we_test"
    )
    q.awaitTermination(300)
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 6))
        for r in spark.sql("SELECT * FROM we_test").collect()
    }
    batch = windowed_event_counts(spark.read.parquet(events_path))
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 6))
        for r in batch.collect()
    }
    assert got == want
    assert len(want) > 10


def test_stateful_sessionize_single_batch_matches_session_window(spark, tmp_path):
    """applyInPandasWithState sessionization: drained in one micro-batch it
    must produce exactly the CLOSED sessions; the built-in session_window on
    the same data is the oracle (open sessions — each user's last — stay in
    state, so they are the expected difference)."""
    from pyspark.sql import functions as F

    from neural_search_spark.streaming.ingest import EVENTS_SCHEMA
    from neural_search_spark.streaming.stateful import sessionize_stream

    events_path = str(tmp_path / "events")
    batch = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    batch.repartition(2).write.parquet(events_path)

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "100")  # everything in one batch
        .parquet(events_path)
    )
    q = (
        sessionize_stream(stream, gap="30 minutes", idle_flush=False)
        .writeStream.format("memory")
        .queryName("sessions_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["user_id"], r["session_start"]): (r["n_events"], round(r["sum_value"], 6))
        for r in spark.sql("SELECT * FROM sessions_test").collect()
    }

    oracle = (
        batch.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv"))
        .select("user_id", F.col("w.start").alias("session_start"), "n", "sv")
    )
    want_all = {
        (r["user_id"], r["session_start"]): (r["n"], round(r["sv"], 6))
        for r in oracle.collect()
    }
    # last session per user stays open in state
    last_start = {}
    for (u, s) in want_all:
        if u not in last_start or s > last_start[u]:
            last_start[u] = s
    want_closed = {k: v for k, v in want_all.items() if k[1] != last_start[k[0]]}

    assert got == want_closed
    assert len(want_all) > len(want_closed) > 0


def test_continuous_rollup_matches_raw(spark, tmp_path):
    """Streaming the events in micro-batches through the incremental rollup
    must yield exactly the aggregates computed from raw in one batch —
    mergeable partials are associative, so batch boundaries can't matter."""
    from neural_search_spark.streaming.ingest import EVENTS_SCHEMA
    from neural_search_spark.streaming.rollup import (
        daily_from_rollup,
        rollup_events_stream,
    )

    events_path = str(tmp_path / "events")
    raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    raw.repartition(6).write.parquet(events_path)

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "2")  # 3 incremental merges
        .parquet(events_path)
    )
    rollup_dir = str(tmp_path / "rollup")
    q = rollup_events_stream(stream, rollup_dir, str(tmp_path / "ckpt"))
    q.awaitTermination(300)

    # hourly rollup == raw hourly aggregate
    got_h = {
        (r["hour"], r["event_type"]): (r["n_events"], round(r["sum_value"], 6))
        for r in spark.read.parquet(rollup_dir).collect()
    }
    want_h = {
        (r["hour"], r["event_type"]): (r["n"], round(r["sv"], 6))
        for r in raw.groupBy(
            F.date_trunc("hour", "ts").alias("hour"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv"))
        .collect()
    }
    assert got_h == want_h

    # daily stats from the rollup == daily stats from raw
    got_d = {
        (r["day"], r["event_type"]): (r["n_events"], round(r["sum_value"], 6),
                                      round(r["min_value"], 6), round(r["max_value"], 6))
        for r in daily_from_rollup(spark, rollup_dir).collect()
    }
    want_d = {
        (r["day"], r["event_type"]): (r["n"], round(r["sv"], 6),
                                      round(r["mn"], 6), round(r["mx"], 6))
        for r in raw.groupBy(F.to_date("ts").alias("day"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv"),
             F.min("value").alias("mn"), F.max("value").alias("mx"))
        .collect()
    }
    assert got_d == want_d


def test_streaming_percolation_matches_batch(spark, tmp_path):
    """Saved-search alerting: a doc file-stream through the stateless
    percolator (append mode, no state store) emits exactly the batch
    matches. url stands in for doc identity."""
    from neural_search_spark.query.percolate import (
        percolate_stateless,
        registered_clause_arrays,
    )
    from neural_search_spark.streaming.ingest import CORPUS_SCHEMA, stream_corpus

    corpus_path = str(tmp_path / "corpus")
    corpus_df(spark, n_docs=120, seed=7).repartition(4).write.parquet(corpus_path)
    queries = [
        (0, "+w0005 w0010"),
        (1, "w0003 -w0001"),
        (2, "+w0000 +w0002"),
        (3, "+nosuchterm"),
    ]
    reg = registered_clause_arrays(spark, queries)
    matched = percolate_stateless(
        stream_corpus(spark, corpus_path, max_files_per_trigger=2),
        reg,
        id_col="url",
    )
    q = (
        matched.writeStream.format("memory")
        .queryName("percolate_alerts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["doc_id"], r["query_id"])
        for r in spark.sql("SELECT * FROM percolate_alerts").collect()
    }
    want = {
        (r["doc_id"], r["query_id"])
        for r in percolate_stateless(
            spark.read.parquet(corpus_path), reg, id_col="url"
        ).collect()
    }
    assert got == want
    assert len(want) > 0
    assert not any(qid == 3 for _, qid in want)


def test_windowed_distinct_hll_stream_matches_batch(spark, tmp_path):
    """The HLL windowed distinct runs as a streaming aggregation with
    bounded state (<= 2^p register rows per window) and, fully drained,
    emits exactly the batch estimates."""
    from neural_search_spark.streaming.ingest import (
        EVENTS_SCHEMA,
        finish_windowed_hll,
        windowed_distinct_hll,
        windowed_hll_partial,
    )

    events_path = str(tmp_path / "events")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").repartition(
        4
    ).write.parquet(events_path)
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "2")
        .parquet(events_path)
    )
    q = (
        windowed_hll_partial(stream)
        .writeStream.format("memory")
        .queryName("hll_test")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["window_start"], r["event_type"]): r["est_distinct"]
        for r in finish_windowed_hll(spark.sql("SELECT * FROM hll_test")).collect()
    }
    want = {
        (r["window_start"], r["event_type"]): r["est_distinct"]
        for r in windowed_distinct_hll(spark.read.parquet(events_path)).collect()
    }
    assert got == want
    assert len(want) > 10


def test_rollup_sketch_daily_distinct_matches_raw(spark, tmp_path):
    """The rollup's HLL register maps, merged across hours, give EXACTLY the
    estimate a from-raw daily sketch gives — distinct users at any rollup
    granularity without re-reading events."""
    from neural_search_spark.operators.sketches import hll_estimate, hll_partial
    from neural_search_spark.streaming.ingest import EVENTS_SCHEMA
    from neural_search_spark.streaming.rollup import (
        distinct_users_from_rollup,
        rollup_events_stream,
    )

    events_path = str(tmp_path / "events")
    raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    raw.repartition(6).write.parquet(events_path)
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "2")
        .parquet(events_path)
    )
    rollup_dir = str(tmp_path / "rollup")
    q = rollup_events_stream(stream, rollup_dir, str(tmp_path / "ckpt"))
    q.awaitTermination(300)

    got = {
        (str(r["day"]), r["event_type"]): r["est_users"]
        for r in distinct_users_from_rollup(spark, rollup_dir).collect()
    }
    daily_raw = raw.withColumn("day", F.to_date("ts"))
    want = {
        (str(r["day"]), r["event_type"]): r["est_distinct"]
        for r in hll_estimate(
            hll_partial(daily_raw, "user_id", ["day", "event_type"]),
            ["day", "event_type"],
        ).collect()
    }
    assert got == want
    assert len(want) >= 5


def test_windowed_heavy_hitters_cms_stream_matches_batch(spark, tmp_path):
    """The Count-Min windowed heavy hitters runs as ONE streaming stateful
    aggregation with bounded state (<= d*w counter rows per (window, type))
    and, fully drained, ranks exactly the batch candidates."""
    from neural_search_spark.streaming.ingest import (
        EVENTS_SCHEMA,
        finish_windowed_cms,
        windowed_cms_partial,
        windowed_heavy_hitters_cms,
    )

    events_path = str(tmp_path / "events")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").repartition(
        4
    ).write.parquet(events_path)
    batch_events = spark.read.parquet(events_path)
    cands = batch_events.select(
        F.col("user_id").cast("string").alias("val")
    ).distinct()
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "2")
        .parquet(events_path)
    )
    q = (
        windowed_cms_partial(stream, d=3, w=32)
        .writeStream.format("memory")
        .queryName("cms_test")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_cms"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    partials = spark.sql("SELECT * FROM cms_test")
    # bounded state: at most d*w counter rows per (window, event_type)
    per_group = (
        partials.groupBy("win", "event_type").count().agg(F.max("count")).collect()
    )
    assert per_group[0][0] <= 3 * 32
    got = [
        tuple(r)
        for r in finish_windowed_cms(partials, cands, k=3, d=3, w=32).collect()
    ]
    want = [
        tuple(r)
        for r in windowed_heavy_hitters_cms(
            batch_events, cands, k=3, d=3, w=32
        ).collect()
    ]
    assert sorted(got) == sorted(want)
    assert len(want) > 10


def test_windowed_quantiles_hist_stream_matches_batch(spark, tmp_path):
    """The histogram windowed quantiles runs as ONE streaming stateful
    aggregation with bounded state (<= nbins counter rows per (window,
    type)) against a pinned frame and, fully drained, estimates exactly the
    batch quantiles."""
    from neural_search_spark.streaming.ingest import (
        EVENTS_SCHEMA,
        finish_windowed_hist,
        windowed_hist_partial,
        windowed_quantiles_hist,
    )

    events_path = str(tmp_path / "events")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").repartition(
        4
    ).write.parquet(events_path)
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "2")
        .parquet(events_path)
    )
    q = (
        windowed_hist_partial(stream, (0.0, 512.0), nbins=32)
        .writeStream.format("memory")
        .queryName("hist_test")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_hist"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    partials = spark.sql("SELECT * FROM hist_test")
    per_group = (
        partials.groupBy("win", "event_type").count().agg(F.max("count")).collect()
    )
    assert per_group[0][0] <= 32
    got = sorted(
        tuple(r)
        for r in finish_windowed_hist(partials, [0.5, 0.9], nbins=32).collect()
    )
    want = sorted(
        tuple(r)
        for r in windowed_quantiles_hist(
            spark.read.parquet(events_path), (0.0, 512.0), [0.5, 0.9], nbins=32
        ).collect()
    )
    assert got == want
    assert len(want) > 10
