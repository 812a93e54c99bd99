"""Corpus sources and table maintenance (SURVEY.md §2.1 S1-S7).

The reference ingests via REST (≤1000 docs/request, uuid ids,
/root/reference/src/neural_search/api/documents.py:31-80) and via a Celery
JSON/JSONL file task (workers/tasks.py:185-197); storage is an append-only
in-memory dict with tombstone deletes (faiss_store.py:113-192). The Spark
equivalents are table operations:

  S1/S2  read_jsonl / read_json_array / normalize_docs  — file → corpus rows
  S3/S4  upsert_corpus                                  — latest-wins merge
  S5     point_lookup                                   — url equality scan
         (predicate pushdown; Iceberg would add bloom/partition pruning)
  S6     delete_docs                                    — anti-join rewrite
         (the compacted form of the reference's tombstones)
  S7     list/exists/stats                              — catalog-ish helpers

Parquet directories stand in for Iceberg tables (same as the index builder);
``upsert_corpus``/``delete_docs`` write a NEW snapshot directory and return
its path — an explicit, atomic-rename-able snapshot chain, the same shape a
MERGE INTO / DELETE FROM commit would take.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

CORPUS_COLS = ["url", "warc_ts", "html", "text", "lang"]


def normalize_docs(
    docs: DataFrame,
    id_col: str | None = None,
    content_col: str = "content",
) -> DataFrame:
    """Reference DocumentInput → corpus row: assign deterministic ids for
    missing ones, map content→text, default metadata columns.

    The reference assigns ``uuid4`` for missing ids (api/documents.py:49) —
    nondeterministic and unreproducible; here a missing id becomes an md5 of
    the content (content-addressed, deterministic), satisfying the same
    "every doc gets a unique id" contract reproducibly.
    """
    content = F.col(content_col)
    if id_col is None:
        # content-addressed id JVM-side (md5 built-in, no Python): same
        # uniqueness contract as the reference's uuid4, but reproducible
        url = F.concat(F.lit("urn:doc:md5:"), F.md5(F.encode(content, "utf-8")))
    else:
        url = F.col(id_col).cast("string")
    default_ts = F.lit("2024-01-01 00:00:00").cast("timestamp")
    cols = [
        url.alias("url"),
        (
            F.coalesce(F.col("warc_ts"), default_ts)
            if "warc_ts" in docs.columns
            else default_ts
        ).alias("warc_ts"),
        (
            F.coalesce(F.col("html"), F.encode(content, "utf-8"))
            if "html" in docs.columns
            else F.encode(content, "utf-8")
        ).alias("html"),
        content.alias("text"),
        (
            F.coalesce(F.col("lang"), F.lit("und"))
            if "lang" in docs.columns
            else F.lit("und")
        ).alias("lang"),
    ]
    return docs.select(*cols)


def read_jsonl(spark: SparkSession, path: str, **normalize_kwargs) -> DataFrame:
    """S2: line-delimited JSON → corpus rows (reference workers/tasks.py:190-193).

    ``spark.read.json`` is already splittable/parallel per line — the
    reference loads the whole file into one process's memory.
    """
    return normalize_docs(spark.read.json(path), **normalize_kwargs)


def read_json_array(spark: SparkSession, path: str, **normalize_kwargs) -> DataFrame:
    """S2: whole-file JSON array (reference tasks.py:194-197). multiLine
    parsing is NOT splittable — one task per file — fine for small batch
    files, wrong for bulk data (use JSONL), same trade the reference makes."""
    return normalize_docs(
        spark.read.option("multiLine", "true").json(path), **normalize_kwargs
    )


def upsert_corpus(corpus: DataFrame, updates: DataFrame, out_dir: str) -> str:
    """S3: latest-wins upsert by url → new snapshot dir; returns its path.

    The reference's "upsert" silently keeps the stale vector and appends
    (faiss_store.py:132-137 admits this); this is a true upsert: one row per
    url, updates shadowing existing rows. Executes as a union + per-url
    row_number window — at scale this is the standard MERGE shuffle on the
    join key; Iceberg MERGE INTO would prune untouched files.
    """
    tagged = corpus.select(*CORPUS_COLS, F.lit(0).alias("_pri")).unionByName(
        updates.select(*CORPUS_COLS, F.lit(1).alias("_pri"))
    )
    w = Window.partitionBy("url").orderBy(F.desc("_pri"))
    merged = (
        tagged.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(*CORPUS_COLS)
    )
    snap = _next_snapshot(out_dir)
    merged.write.mode("overwrite").parquet(snap)
    return snap


def delete_docs(corpus: DataFrame, urls: list[str], out_dir: str) -> str:
    """S6: delete by url → new snapshot dir (compacted tombstones)."""
    spark = corpus.sparkSession
    victims = spark.createDataFrame([(u,) for u in urls], "url string")
    remaining = corpus.join(F.broadcast(victims), "url", "left_anti")
    snap = _next_snapshot(out_dir)
    remaining.select(*CORPUS_COLS).write.mode("overwrite").parquet(snap)
    return snap


def point_lookup(corpus: DataFrame, url: str) -> DataFrame:
    """S5: get-by-id. The equality predicate reaches the parquet scan
    (PushedFilters); Iceberg adds file-level bloom skipping."""
    return corpus.where(F.col("url") == F.lit(url))


def _next_snapshot(out_dir: str) -> str:
    os.makedirs(out_dir, exist_ok=True)
    existing = [
        int(d.split("-")[1])
        for d in os.listdir(out_dir)
        if d.startswith("snap-") and d.split("-")[1].isdigit()
    ]
    return os.path.join(out_dir, f"snap-{(max(existing, default=-1) + 1):06d}")


def corpus_stats(corpus: DataFrame) -> dict:
    """S7: collection stats (count + schema), reference get_collection_stats."""
    return {
        "num_documents": corpus.count(),
        "columns": corpus.columns,
    }
