"""BM25 top-k as a pure declarative DataFrame plan (the M1 path).

Semantics are reference-identical (``/root/reference/src/neural_search/core/
hybrid.py:119-147`` driving the published rank-bm25 ``get_scores``), but the
execution shape is the scalable batch form the reference lacks (its Q10 batch
search is a sequential Python loop, ``api/search.py:89-135``):

    queries -> tokenize -> (query_id, term, qtf)        [tiny]
    BROADCAST join with term_stats (idf) and again with doc_terms on term
    groupBy(query_id, doc_id).sum(contrib)              [the one real shuffle]
    per-query window top-k                              [partial TakeOrdered]

One shuffle scores the entire query batch. Catalyst handles pushdown/pruning;
the broadcast keeps the postings-side join shuffle-free. Tie-break is
deterministic: (score desc, doc_id asc) — the oracle compares ties as sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import BM25Params, DEFAULT_PARAMS
from ..functions.tokenize import tokenize_udf
from .stats_types import resolve_stats


def query_terms(queries: DataFrame) -> DataFrame:
    """(query_id, term, qtf, top_k): per-occurrence term counts.

    The reference scores each query-token *occurrence* separately
    (``get_scores`` loops over the raw token list), which is equivalent to
    weighting each distinct term's contribution by its occurrence count.
    """
    has_k = "top_k" in queries.columns
    base = queries.select(
        "query_id",
        (F.col("top_k") if has_k else F.lit(10)).alias("top_k"),
        F.explode(tokenize_udf(F.col("query_text"))).alias("term"),
    )
    return base.groupBy("query_id", "top_k", "term").agg(F.count(F.lit(1)).alias("qtf"))


def bm25_contrib_expr(k1: float, b: float, avgdl: float):
    """The Okapi BM25 per-(term, doc) contribution as a Column expression.

    Runs entirely in WholeStageCodegen — no Python in the scoring hot path.
    """
    tf = F.col("tf").cast("double")
    denom = tf + k1 * (1.0 - b + b * F.col("doc_len").cast("double") / F.lit(avgdl))
    return F.col("qtf").cast("double") * F.col("idf") * (tf * (k1 + 1.0) / denom)


def bm25_scores(
    doc_terms: DataFrame,
    terms: DataFrame,
    queries: DataFrame,
    avgdl: float | None = None,
    stats=None,
    params: BM25Params = DEFAULT_PARAMS,
    positive_only: bool = True,
) -> DataFrame:
    """Per-(query, doc) BM25 scores: (query_id, top_k, doc_id, score).

    * unknown query terms vanish at the inner join (contribute 0, matching
      ``idf.get(q) or 0``);
    * docs with no matching term never appear (score 0 -> dropped, matching
      the reference's ``scores[idx] > 0`` filter at hybrid.py:144);
    * with ``positive_only`` (the reference default), docs whose matched
      contributions sum to <= 0 are dropped likewise. ``positive_only=False``
      is our match-mode extension: every doc matching >=1 known query term is
      ranked, even when a degenerate corpus (every term in > half the docs,
      e.g. rank-bm25's all-negative-idf regime) floors all scores below zero.
    """
    avgdl = resolve_stats(avgdl, stats)
    qt = query_terms(queries)
    # `or 0` semantics: an exactly-zero idf contributes nothing either way.
    q_idf = qt.join(terms.select("term", "idf"), "term", "inner")

    scored = doc_terms.join(F.broadcast(q_idf), "term").select(
        "query_id",
        "top_k",
        "doc_id",
        bm25_contrib_expr(params.k1, params.b, avgdl).alias("contrib"),
    )
    per_doc = scored.groupBy("query_id", "top_k", "doc_id").agg(
        F.sum("contrib").alias("score")
    )
    return per_doc.where(F.col("score") > 0) if positive_only else per_doc


def rank_topk(per_doc: DataFrame, score_col: str = "score") -> DataFrame:
    """Deterministic per-query top-k cut: (query_id, rank, doc_id, score)."""
    w = Window.partitionBy("query_id").orderBy(F.desc(score_col), F.asc("doc_id"))
    return (
        per_doc.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= F.col("top_k"))
        .select("query_id", "rank", "doc_id", F.col(score_col).alias("score"))
    )


def bm25_topk(
    doc_terms: DataFrame,
    terms: DataFrame,
    queries: DataFrame,
    avgdl: float | None = None,
    stats=None,
    params: BM25Params = DEFAULT_PARAMS,
    positive_only: bool = True,
) -> DataFrame:
    """Per-query BM25 top-k: (query_id, rank, doc_id, score)."""
    per_doc = bm25_scores(
        doc_terms, terms, queries, avgdl=avgdl, stats=stats, params=params,
        positive_only=positive_only,
    )
    return rank_topk(per_doc)


def bm25_topk_single(
    doc_terms: DataFrame,
    terms: DataFrame,
    query_text: str,
    top_k: int = 10,
    avgdl: float | None = None,
    stats=None,
    params: BM25Params = DEFAULT_PARAMS,
) -> DataFrame:
    """Single-query convenience wrapper: (rank, doc_id, score)."""
    spark = doc_terms.sparkSession
    q = spark.createDataFrame([(0, query_text, top_k)], "query_id int, query_text string, top_k int")
    return bm25_topk(doc_terms, terms, q, avgdl=avgdl, stats=stats, params=params).select(
        "rank", "doc_id", "score"
    )
