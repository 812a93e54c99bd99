"""IR evaluation metrics as DataFrame aggregations (SURVEY.md §2.6 A8).

The reference computes MRR, Recall@k and NDCG@k in a driver-side Python loop
over one query at a time (/root/reference/benchmarks/search_accuracy.py:27-83).
Here each metric is a groupBy over a (query_id, rank, doc_id) results table
joined with a (query_id, doc_id, relevance) judgments table — one shuffle
evaluates a million-query run.

Semantics (matching the reference implementation):
  * MRR        — 1/rank of the FIRST relevant result (relevance > 0), 0 if
                 none retrieved;
  * Recall@k   — |relevant ∩ top-k| / |relevant|;
  * NDCG@k     — DCG@k / IDCG@k with gain = relevance (linear, as the
                 reference uses), discount = 1/log2(rank+1); 0 when IDCG=0.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def mrr(results: DataFrame, judgments: DataFrame) -> DataFrame:
    """(query_id, mrr): reciprocal rank of the first relevant hit."""
    rel = judgments.where(F.col("relevance") > 0).select("query_id", "doc_id")
    hits = results.join(rel, ["query_id", "doc_id"])
    first = hits.groupBy("query_id").agg(F.min("rank").alias("first_rank"))
    all_q = judgments.select("query_id").distinct()
    return all_q.join(first, "query_id", "left").select(
        "query_id",
        F.coalesce(1.0 / F.col("first_rank"), F.lit(0.0)).alias("mrr"),
    )


def recall_at_k(results: DataFrame, judgments: DataFrame, k: int) -> DataFrame:
    """(query_id, recall): fraction of relevant docs present in the top-k."""
    rel = judgments.where(F.col("relevance") > 0).select("query_id", "doc_id")
    n_rel = rel.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_rel"))
    hit = (
        results.where(F.col("rank") <= k)
        .join(rel, ["query_id", "doc_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return n_rel.join(hit, "query_id", "left").select(
        "query_id",
        (F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_rel")).alias("recall"),
    )


def ndcg_at_k(results: DataFrame, judgments: DataFrame, k: int) -> DataFrame:
    """(query_id, ndcg): linear-gain NDCG@k."""
    topk = results.where(F.col("rank") <= k)
    gains = topk.join(judgments, ["query_id", "doc_id"], "left").select(
        "query_id",
        "rank",
        F.coalesce(F.col("relevance"), F.lit(0.0)).alias("relevance"),
    )
    dcg = gains.groupBy("query_id").agg(
        F.sum(F.col("relevance") / F.log2(F.col("rank") + 1.0)).alias("dcg")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("relevance"), F.asc("doc_id")
    )
    ideal = (
        judgments.withColumn("irank", F.row_number().over(w))
        .where(F.col("irank") <= k)
        .groupBy("query_id")
        .agg(F.sum(F.col("relevance") / F.log2(F.col("irank") + 1.0)).alias("idcg"))
    )
    all_q = judgments.select("query_id").distinct()
    return (
        all_q.join(dcg, "query_id", "left")
        .join(ideal, "query_id", "left")
        .select(
            "query_id",
            F.when(
                F.coalesce(F.col("idcg"), F.lit(0.0)) > 0,
                F.coalesce(F.col("dcg"), F.lit(0.0)) / F.col("idcg"),
            )
            .otherwise(F.lit(0.0))
            .alias("ndcg"),
        )
    )


def evaluate(results: DataFrame, judgments: DataFrame, k: int = 10) -> DataFrame:
    """(query_id, mrr, recall, ndcg) — one row per judged query."""
    return (
        mrr(results, judgments)
        .join(recall_at_k(results, judgments, k), "query_id")
        .join(ndcg_at_k(results, judgments, k), "query_id")
    )
