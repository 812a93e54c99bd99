"""Score explanation: per-term BM25 contribution breakdown for top hits.

The reference returns only the final fused score per hit
(``/root/reference/src/neural_search/api/search.py:21-135`` — result rows
carry ``score`` and payload, nothing else); users debugging relevance have no
way to see WHY a document ranked. Classic fulltext engines expose this as an
explain API (Elasticsearch ``_explain``, Lucene ``Explanation``): for each
(query, hit) pair, the per-term tf / df / idf / length-normalized
contribution that summed into the score.

Spark-first shape: the per-(query, doc, term) contribution rows already
exist as the pre-aggregation input of the batch BM25 plan
(``bm25_dataframe.bm25_scores``); explain simply keeps that relation instead
of throwing it away after the sum. Ranking the hits costs the same single
shuffle as ``bm25_topk``; the breakdown join-back is a broadcast of the tiny
(query_id, doc_id, rank) cut against the already-computed contribution rows
— no second shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import BM25Params, DEFAULT_PARAMS
from ..index.stats import BM25Index
from .bm25_dataframe import bm25_contrib_expr, query_terms


def bm25_explain(
    index: BM25Index,
    queries: DataFrame,
    explain_k: int = 3,
    params: BM25Params = DEFAULT_PARAMS,
    positive_only: bool = True,
    score_rounding: int = 4,
) -> DataFrame:
    """Per-term score breakdown for each query's top ``explain_k`` hits.

    Returns (query_id, doc_id, rank, term, tf, doc_len, df, qtf, idf,
    contrib): one row per (query term x explained hit), where
    ``sum(contrib) over (query_id, doc_id)`` reproduces the hit's BM25 score
    (before rounding). Ranks are decided on the ``score_rounding``-rounded
    score with doc_id tie-break — identical to the ``bm25_topk`` contract, so
    an explain row's ``rank`` always matches the search result it explains.
    """
    qt = query_terms(queries)
    q_idf = qt.join(index.terms.select("term", "df", "idf"), "term", "inner")
    contrib = (
        index.doc_terms.join(F.broadcast(q_idf), "term")
        .select(
            "query_id",
            "doc_id",
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("doc_len").cast("long").alias("doc_len"),
            F.col("df").cast("long").alias("df"),
            F.col("qtf").cast("long").alias("qtf"),
            "idf",
            bm25_contrib_expr(params.k1, params.b, index.stats.avgdl).alias(
                "contrib"
            ),
        )
        .persist()
    )
    per_doc = contrib.groupBy("query_id", "doc_id").agg(
        F.sum("contrib").alias("score")
    )
    if positive_only:
        per_doc = per_doc.where(F.col("score") > 0)
    rounded = per_doc.withColumn("score", F.round("score", score_rounding))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    cut = (
        rounded.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= explain_k)
        .select("query_id", "doc_id", F.col("rank").cast("long").alias("rank"))
    )
    return contrib.join(F.broadcast(cut), ["query_id", "doc_id"]).select(
        "query_id",
        F.col("doc_id").cast("long").alias("doc_id"),
        "rank",
        "term",
        "tf",
        "doc_len",
        "df",
        "qtf",
        F.round("idf", 6).alias("idf"),
        F.round("contrib", 4).alias("contrib"),
    )
