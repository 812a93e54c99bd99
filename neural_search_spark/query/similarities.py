"""Pluggable alternative similarity: LM Dirichlet (query likelihood).

The reference hard-codes one lexical similarity (rank-bm25's Okapi variant,
``/root/reference/src/neural_search/core/hybrid.py:72,137``); production
fulltext indexes let a field choose its similarity (Lucene's ``similarity``
module — BM25, LM Dirichlet, DFR, ...). This adds the standard second member
of that family: the Dirichlet-smoothed query-likelihood model (Zhai &
Lafferty 2001; Lucene ``LMDirichletSimilarity``), in its sparse ranking
decomposition over matched terms:

    score(q, d) = sum_t  qtf_t * ln(1 + tf_td * T / (mu * cf_t))
                  + |q|_known * ln(mu / (dl_d + mu))

where cf_t is the term's collection frequency, T the corpus token total,
and |q|_known counts query-token occurrences whose term exists in the
collection (unknown terms carry no probability mass and vanish, mirroring
the BM25 path's inner join). Scores are log-probabilities (negative); docs
matching >= 1 known term are ranked — the match-mode contract.

Plan shape — identical to the BM25 batch path, one extra *vocabulary-sized*
aggregate for cf (re-using the same doc_terms relation, partial-agg
friendly): tiny query side broadcast into the posting join, one
(query, doc) shuffle, per-query window cut. The Dirichlet norm term
depends only on (dl, |q|) and rides the same aggregation grain (dl is
constant per doc, so ``max`` recovers it without a second join).

Cross-engine contract: tf/cf/T/dl/mu stay exact integers; each score is one
sum of ``ln`` terms over identical doubles, ranked on the 4dp-rounded value
with doc_id tie-break — the same reconciliation every scoring entry uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .bm25_dataframe import query_terms

DEFAULT_MU = 2000.0


def collection_frequencies(doc_terms: DataFrame) -> tuple[DataFrame, int]:
    """((term, cf), T): per-term collection frequency and the corpus token
    total — one partial-agg pass over the posting relation."""
    cf = doc_terms.groupBy("term").agg(F.sum("tf").alias("cf"))
    t_row = doc_terms.agg(F.sum("tf").alias("t")).collect()[0]
    return cf, int(t_row["t"] or 0)


def lm_dirichlet_topk(
    doc_terms: DataFrame,
    queries: DataFrame,
    mu: float = DEFAULT_MU,
    round_to: int = 4,
) -> DataFrame:
    """Per-query Dirichlet query-likelihood top-k:
    (query_id, rank, doc_id, score)."""
    cf, total = collection_frequencies(doc_terms)
    qt = query_terms(queries)
    q_cf = qt.join(cf, "term", "inner")
    q_len = q_cf.groupBy("query_id").agg(F.sum("qtf").alias("q_len"))

    tf = F.col("tf").cast("double")
    contrib = F.col("qtf").cast("double") * F.log(
        F.lit(1.0) + tf * F.lit(float(total)) / (F.lit(float(mu)) * F.col("cf").cast("double"))
    )
    per_doc = (
        doc_terms.join(F.broadcast(q_cf), "term")
        .select(
            "query_id", "top_k", "doc_id", "doc_len", contrib.alias("contrib")
        )
        .groupBy("query_id", "top_k", "doc_id")
        .agg(F.sum("contrib").alias("sum_contrib"), F.max("doc_len").alias("dl"))
    )
    norm = F.col("q_len").cast("double") * F.log(
        F.lit(float(mu)) / (F.col("dl").cast("double") + F.lit(float(mu)))
    )
    scored = per_doc.join(F.broadcast(q_len), "query_id").select(
        "query_id",
        "top_k",
        "doc_id",
        F.round(F.col("sum_contrib") + norm, round_to).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= F.col("top_k"))
        .select("query_id", "rank", "doc_id", "score")
    )
