"""Second-phase ranking shapes: field collapsing, function_score,
boosting (negative boost), and a rescore window.

The reference ranks with one flat BM25 pass and returns the raw top-k
(``/root/reference/src/neural_search/api/search.py:89-135``); these are the
classic fulltext-index result-shaping extensions (Elasticsearch field
collapsing / ``function_score`` / ``boosting`` query / ``rescore``) that a
webtext corpus needs: one result per site, freshness/length priors folded
into relevance, soft down-weighting instead of hard exclusion, and an
expensive secondary signal applied only inside a small top-N window.

Spark-first shapes — all four reuse the flat one-shuffle scoring plan
(``bm25_dataframe.bm25_scores``) and stay declarative:

* collapse: two stacked windows over the already-reduced (query, doc)
  score rows — both partition by query_id(+key), so AQE plans them off one
  exchange; never a global sort.
* function_score: the doc-attribute join keys on doc_id against the scored
  rows (which a top-k-sized broadcast would serve at low query counts, but
  is left to AQE: the scored side is post-aggregation and tiny relative to
  the corpus).
* boosting: the negative-match set is a (query, doc)-distinct semi-set,
  left-joined — matching ES semantics where negative docs are demoted, not
  removed.
* rescore: the window cut runs FIRST (rank <= window_size), so the
  secondary signal — here a per-occurrence phrase count over the raw text —
  is computed on query_count x window rows, never the corpus.

Determinism for the DuckDB oracle: every rank boundary is decided on
``round(score, round_to)`` with a doc_id ascending tie-break, the same
reconciliation every other entry uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import BM25Params, DEFAULT_PARAMS
from ..index.stats import BM25Index
from .bm25_dataframe import bm25_scores


def _ranked(per_doc: DataFrame, score_col: str, round_to: int | None):
    s = F.round(F.col(score_col), round_to) if round_to is not None else F.col(score_col)
    return per_doc.withColumn("_s", s)


def collapse_topk(
    index: BM25Index,
    queries: DataFrame,
    docs: DataFrame,
    collapse_col: str,
    per_key: int = 1,
    params: BM25Params = DEFAULT_PARAMS,
    positive_only: bool = True,
    round_to: int | None = None,
) -> DataFrame:
    """ES field collapsing: at most ``per_key`` results per ``collapse_col``
    value, then the usual per-query top-k. Returns
    (query_id, rank, doc_id, <collapse_col>, score).

    ``docs`` supplies (doc_id, collapse_col); the join keys on doc_id
    against the post-aggregation score rows. Two windows: rank within
    (query, key) keeps the best ``per_key`` docs of each key, then the
    global per-query rank cuts to top_k — the ES semantics where collapsed
    groups compete by their best member.
    """
    per_doc = bm25_scores(
        index.doc_terms, index.terms, queries,
        stats=index.stats, params=params, positive_only=positive_only,
    )
    joined = per_doc.join(docs.select("doc_id", collapse_col), "doc_id")
    joined = _ranked(joined, "score", round_to)
    w_key = Window.partitionBy("query_id", collapse_col).orderBy(
        F.desc("_s"), F.asc("doc_id")
    )
    best = joined.withColumn("_kr", F.row_number().over(w_key)).where(
        F.col("_kr") <= per_key
    )
    w_q = Window.partitionBy("query_id").orderBy(F.desc("_s"), F.asc("doc_id"))
    return (
        best.withColumn("rank", F.row_number().over(w_q))
        .where(F.col("rank") <= F.col("top_k"))
        .select("query_id", "rank", "doc_id", collapse_col, F.col("_s").alias("score"))
    )


def function_score_topk(
    index: BM25Index,
    queries: DataFrame,
    docs: DataFrame,
    factor_col: str,
    factor: float = 1.0,
    boost_mode: str = "multiply",
    params: BM25Params = DEFAULT_PARAMS,
    positive_only: bool = True,
    round_to: int | None = None,
) -> DataFrame:
    """ES ``function_score`` with a ``field_value_factor`` (modifier
    ``log1p``): final = bm25 <boost_mode> round(ln(1 + factor * field), 6).

    The field multiplier is rounded to 6dp BEFORE combining — ln of an
    integer-valued field agrees with any other engine at 6dp (1-ulp raw
    differences exist), so the combined score is cross-engine stable.
    Returns (query_id, rank, doc_id, score).
    """
    if boost_mode not in ("multiply", "sum"):
        raise ValueError(f"unsupported boost_mode: {boost_mode}")
    per_doc = bm25_scores(
        index.doc_terms, index.terms, queries,
        stats=index.stats, params=params, positive_only=positive_only,
    )
    fs = F.round(F.log(F.lit(1.0) + F.lit(factor) * F.col(factor_col).cast("double")), 6)
    joined = per_doc.join(docs.select("doc_id", factor_col), "doc_id")
    combined = (
        F.col("score") * fs if boost_mode == "multiply" else F.col("score") + fs
    )
    scored = joined.withColumn("final", combined)
    scored = _ranked(scored, "final", round_to)
    w = Window.partitionBy("query_id").orderBy(F.desc("_s"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= F.col("top_k"))
        .select("query_id", "rank", "doc_id", F.col("_s").alias("score"))
    )


def boosting_topk(
    index: BM25Index,
    pos_queries: DataFrame,
    neg_queries: DataFrame,
    negative_boost: float = 0.5,
    params: BM25Params = DEFAULT_PARAMS,
    positive_only: bool = True,
    round_to: int | None = None,
) -> DataFrame:
    """ES ``boosting`` query: docs matching the negative query keep their
    positive score times ``negative_boost`` instead of being excluded.

    ``neg_queries`` is (query_id, query_text); a doc "matches negative" if
    it contains ANY known negative term (Lucene: the negative clause is a
    pure filter, never scored). Returns (query_id, rank, doc_id, score).

    positive_only is applied on the PRE-demotion score (eligibility is the
    positive query's own match semantics; with a positive boost factor the
    demotion never flips a sign anyway).
    """
    from .bm25_dataframe import query_terms

    per_doc = bm25_scores(
        index.doc_terms, index.terms, pos_queries,
        stats=index.stats, params=params, positive_only=positive_only,
    )
    neg_terms = query_terms(neg_queries).select("query_id", "term")
    neg_match = (
        index.doc_terms.join(F.broadcast(neg_terms), "term")
        .select("query_id", "doc_id")
        .distinct()
        .withColumn("_neg", F.lit(True))
    )
    demoted = per_doc.join(neg_match, ["query_id", "doc_id"], "left").withColumn(
        "final",
        F.when(F.col("_neg"), F.col("score") * F.lit(negative_boost)).otherwise(
            F.col("score")
        ),
    )
    demoted = _ranked(demoted, "final", round_to)
    w = Window.partitionBy("query_id").orderBy(F.desc("_s"), F.asc("doc_id"))
    return (
        demoted.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= F.col("top_k"))
        .select("query_id", "rank", "doc_id", F.col("_s").alias("score"))
    )


def rescore_topk(
    index: BM25Index,
    queries: DataFrame,
    docs: DataFrame,
    phrases: DataFrame,
    window_size: int = 50,
    query_weight: float = 1.0,
    rescore_weight: float = 2.0,
    params: BM25Params = DEFAULT_PARAMS,
    positive_only: bool = True,
    round_to: int | None = None,
) -> DataFrame:
    """ES ``rescore``: re-rank only the top ``window_size`` BM25 hits with a
    secondary signal — here the non-overlapping occurrence count of an exact
    phrase in the raw text:

        final = query_weight * bm25 + rescore_weight * phrase_count

    ``phrases`` is (query_id, phrase). The window cut happens BEFORE the
    text join, so the string scan touches query_count x window rows, never
    the corpus — the entire point of the rescore shape. Docs outside the
    window keep their original order below the rescored ones (ES semantics);
    we return only the window, re-ranked and cut to top_k, which matches ES
    when top_k <= window_size (enforced). Returns
    (query_id, rank, doc_id, score).
    """
    per_doc = bm25_scores(
        index.doc_terms, index.terms, queries,
        stats=index.stats, params=params, positive_only=positive_only,
    )
    per_doc = _ranked(per_doc, "score", round_to)
    w = Window.partitionBy("query_id").orderBy(F.desc("_s"), F.asc("doc_id"))
    window = per_doc.withColumn("_r0", F.row_number().over(w)).where(
        F.col("_r0") <= window_size
    )
    hydrated = window.join(docs.select("doc_id", "text"), "doc_id").join(
        F.broadcast(phrases), "query_id"
    )
    # non-overlapping occurrence count via replace-length arithmetic: pure
    # codegen, identical in any engine
    n_occ = (
        (F.length("text") - F.length(F.replace(F.col("text"), F.col("phrase"))))
        / F.length("phrase")
    ).cast("double")
    rescored = hydrated.withColumn(
        "final",
        F.lit(query_weight) * F.col("_s") + F.lit(rescore_weight) * n_occ,
    )
    rescored = rescored.drop("_s")
    rescored = _ranked(rescored, "final", round_to)
    w2 = Window.partitionBy("query_id").orderBy(F.desc("_s"), F.asc("doc_id"))
    return (
        rescored.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= F.least(F.col("top_k"), F.lit(window_size)))
        .select("query_id", "rank", "doc_id", F.col("_s").alias("score"))
    )
