"""More-like-this: document-as-query relevance feedback.

The reference engine only accepts free-text queries
(``/root/reference/src/neural_search/api/search.py:21-53``); "find documents
like this one" — the classic fulltext-index companion (Lucene
``MoreLikeThis``) — is a beyond-reference operator. Semantics:

1. *Term selection*: from the source document's term vector, keep the top-m
   terms by tf·idf (the Lucene MLT interestingness score), deterministic
   ties by term.
2. *Retrieval*: run those m terms as a BM25 bag-of-words query (each
   selected term once, i.e. qtf = 1), excluding the source document itself.

Scale shape (mirrors ``bm25_dataframe.bm25_topk``): the source set is
query-cardinality, so it is BROADCAST into the corpus-side joins — the
doc_terms table (the 100 TB side) never shuffles for selection, and the only
real shuffle is the per-(source, candidate) score aggregation. The per-source
top-k cut is a window partitioned by source, never a global sort.

Cross-engine determinism (see plans/driver_entry.py): every rank boundary —
term selection AND result ranking — is decided on ``round(x, 4)`` with a
lexical tie-break, so the DuckDB oracle reproduces both windows bit-for-bit
despite 1-ulp ``ln`` differences between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import BM25Params, DEFAULT_PARAMS
from ..index.stats import BM25Index
from .bm25_dataframe import bm25_contrib_expr


def mlt_select_terms(
    index: BM25Index,
    source_ids: DataFrame,
    m: int = 10,
) -> DataFrame:
    """Top-m query terms per source doc: (src_id, term, idf).

    ``source_ids`` needs a ``src_id`` column and is assumed tiny (it is the
    query side); it is broadcast into the doc_terms join so the corpus side
    stays shuffle-free. Interestingness is tf·idf rounded to 4 decimals,
    ties broken by term — fully deterministic and oracle-reproducible.
    """
    src_terms = index.doc_terms.join(
        F.broadcast(source_ids.select("src_id")),
        F.col("doc_id") == F.col("src_id"),
    ).select("src_id", "term", "tf")
    weighted = src_terms.join(index.terms.select("term", "idf"), "term").withColumn(
        "weight", F.round(F.col("tf").cast("double") * F.col("idf"), 4)
    )
    w = Window.partitionBy("src_id").orderBy(F.desc("weight"), F.asc("term"))
    return (
        weighted.withColumn("trank", F.row_number().over(w))
        .where(F.col("trank") <= m)
        .select("src_id", "term", "idf")
    )


def more_like_this(
    index: BM25Index,
    source_ids: DataFrame,
    m: int = 10,
    k: int = 10,
    params: BM25Params = DEFAULT_PARAMS,
    positive_only: bool = False,
) -> DataFrame:
    """Per-source BM25 top-k of similar docs: (src_id, rank, doc_id, score).

    The source document itself is excluded. ``positive_only`` applies the
    reference's score>0 cut; the default match-mode ranks every doc sharing
    a selected term (robust on degenerate all-negative-idf corpora).
    Scores are rounded to 4 decimals BEFORE ranking (doc_id ties ascending)
    so physical/oracle paths rank identically.
    """
    qsel = mlt_select_terms(index, source_ids, m=m)
    contrib = (
        index.doc_terms.join(F.broadcast(qsel), "term")
        .where(F.col("doc_id") != F.col("src_id"))
        .withColumn("qtf", F.lit(1))  # each selected term contributes once
        .select(
            "src_id",
            "doc_id",
            bm25_contrib_expr(params.k1, params.b, index.stats.avgdl).alias("contrib"),
        )
    )
    per_doc = contrib.groupBy("src_id", "doc_id").agg(F.sum("contrib").alias("score"))
    if positive_only:
        per_doc = per_doc.where(F.col("score") > 0)
    rounded = per_doc.withColumn("score", F.round("score", 4))
    w = Window.partitionBy("src_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        rounded.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "src_id",
            F.col("rank").cast("long").alias("rank"),
            F.col("doc_id").cast("long").alias("doc_id"),
            "score",
        )
    )
