"""Fuzzy full-text match — BM25 over typo-tolerant term expansion.

The reference engine has no spell tolerance: a misspelled query term
contributes nothing (``idf.get(term) or 0``,
``/root/reference/src/neural_search/core/hybrid.py:125``). This operator is
the standard fulltext-index remedy (the Elasticsearch ``match`` query with
``fuzziness``, Lucene FuzzyQuery): each query term expands to the
vocabulary terms within Levenshtein distance ``max_dist``, each expansion
scores as itself, down-weighted by how far it is from what the user typed.

Semantics (deterministic, oracle-checkable):

* expansion set V(q) = vocabulary terms with lev(q, v) <= max_dist
  (candidates via the SymSpell deletion-1 neighborhood of query/suggest.py —
  complete for max_dist <= 1 — then the exact distance verify);
* boost(q, v) = 1 - distance / min(len(q), len(v)) — Lucene's
  FuzzyTermsEnum similarity (an exact vocabulary hit keeps boost 1.0);
* per (query, doc, q_term): the BEST single expansion wins,
  max_v boost(q,v) * bm25(v, doc) — a doc containing both the typo'd and
  the correct form is not double-counted (dis-max over the expansion set,
  Lucene's blended-term behavior made order-free);
* score(query, doc) = sum over query terms of qtf * that max.

Plan shape at scale: the query side stays tiny (terms x variants,
broadcast); the expansion join runs against the vocabulary-bounded variant
table (|V| * avg_len rows, corpus-size independent — the artifact a cluster
persists bucketed by variant); the expanded term set then drives the SAME
one-shuffle batch-BM25 join as the exact path. No new shuffle grain: one
extra m-bounded aggregate (the per-q_term max) rides the same
(query, doc) exchange before the final sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import BM25Params, DEFAULT_PARAMS
from .bm25_dataframe import query_terms
from .stats_types import resolve_stats
from .suggest import deletion_variants


def fuzzy_expansions(
    terms: DataFrame, query_terms_df: DataFrame, max_dist: int = 1
) -> DataFrame:
    """(query_id, top_k, q_term, qtf, term, idf, boost): each query term's
    verified expansion set with its Lucene-style similarity boost.

    ``terms`` needs (term, idf); ``query_terms_df`` is the
    bm25_dataframe.query_terms grain (query_id, top_k, term, qtf).
    """
    if max_dist > 1:
        raise ValueError(
            "deletion-1 candidate generation is only complete for max_dist <= 1"
        )
    qv = query_terms_df.select(
        "query_id",
        "top_k",
        F.col("term").alias("q_term"),
        "qtf",
        F.explode(deletion_variants("term")).alias("variant"),
    )
    vocab_variants = terms.select(
        F.explode(deletion_variants("term")).alias("variant"), "term", "idf"
    )
    cand = (
        vocab_variants.join(F.broadcast(qv), "variant")
        .select("query_id", "top_k", "q_term", "qtf", "term", "idf")
        .distinct()
    )
    dist = F.levenshtein("q_term", "term")
    boost = F.lit(1.0) - dist.cast("double") / F.least(
        F.length("q_term"), F.length("term")
    ).cast("double")
    return cand.where(dist <= max_dist).withColumn("boost", boost)


def fuzzy_topk(
    doc_terms: DataFrame,
    terms: DataFrame,
    queries: DataFrame,
    avgdl: float | None = None,
    stats=None,
    params: BM25Params = DEFAULT_PARAMS,
    max_dist: int = 1,
    positive_only: bool = True,
    score_rounding: int | None = None,
) -> DataFrame:
    """Per-query fuzzy BM25 top-k: (query_id, rank, doc_id, score).

    With ``score_rounding`` every rank boundary is decided on the rounded
    score (the cross-engine reconciliation contract the physical paths use).
    """
    avgdl = resolve_stats(avgdl, stats)
    exp = fuzzy_expansions(terms, query_terms(queries), max_dist=max_dist)

    tf = F.col("tf").cast("double")
    k1, b = params.k1, params.b
    denom = tf + k1 * (1.0 - b + b * F.col("doc_len").cast("double") / F.lit(avgdl))
    term_score = F.col("boost") * F.col("idf") * (tf * (k1 + 1.0) / denom)

    matched = doc_terms.join(F.broadcast(exp), "term").select(
        "query_id", "top_k", "doc_id", "q_term", "qtf", term_score.alias("ts")
    )
    best = matched.groupBy("query_id", "top_k", "doc_id", "q_term", "qtf").agg(
        F.max("ts").alias("best")
    )
    per_doc = best.groupBy("query_id", "top_k", "doc_id").agg(
        F.sum(F.col("qtf").cast("double") * F.col("best")).alias("score")
    )
    if positive_only:
        per_doc = per_doc.where(F.col("score") > 0)
    if score_rounding is not None:
        per_doc = per_doc.withColumn("score", F.round("score", score_rounding))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        per_doc.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= F.col("top_k"))
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            F.col("doc_id").cast("long").alias("doc_id"),
            "score",
        )
    )
