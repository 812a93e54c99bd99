"""Faceted aggregation over search results.

The reference returns flat hit lists (``SearchResult`` rows,
``/root/reference/src/neural_search/api/schemas.py:30-43``); facet counts —
"of my top-k hits, how many per language / per source?" — are the standard
fulltext-index companion aggregation. Semantics: for each query, join its
result doc_ids to the corpus metadata and count docs per (facet, value).

Scale shape: results are query-cardinality (q x k rows) while the corpus is
the 100 TB side, so the RESULT side is broadcast into the join — the corpus
is never shuffled — and the only shuffle is the final (query, facet, value)
count, whose cardinality is bounded by q x facets x values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def histogram_facet(
    results: DataFrame,
    docs: DataFrame,
    value_col: str,
    interval: float,
    query_col: str = "query_id",
    id_col: str = "doc_id",
) -> DataFrame:
    """(query_id, bucket_lo, n_docs): fixed-interval histogram of a numeric
    metadata column over each query's result set (the Elasticsearch
    ``histogram`` aggregation). Bucket key = floor(value / interval) *
    interval — unbounded, empty buckets absent.

    Same scale shape as ``facet_counts``: broadcast the q x k result side,
    never shuffle the corpus; output cardinality is bounded by q x buckets.
    """
    hits = results.select(query_col, id_col)
    joined = docs.select(id_col, value_col).join(F.broadcast(hits), id_col)
    bucket = (F.floor(F.col(value_col) / F.lit(interval)) * F.lit(interval)).cast(
        "long"
    )
    return joined.groupBy(query_col, bucket.alias("bucket_lo")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )


def stats_facet(
    results: DataFrame,
    docs: DataFrame,
    value_col: str,
    query_col: str = "query_id",
    id_col: str = "doc_id",
) -> DataFrame:
    """(query_id, n_docs, min_v, max_v, sum_v, avg_v): the Elasticsearch
    ``stats`` aggregation over each query's result set. One broadcast join +
    one bounded groupBy; avg is rounded by the caller if it crosses an
    engine boundary."""
    hits = results.select(query_col, id_col)
    joined = docs.select(id_col, value_col).join(F.broadcast(hits), id_col)
    v = F.col(value_col).cast("double")
    return joined.groupBy(query_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min(v).alias("min_v"),
        F.max(v).alias("max_v"),
        F.sum(v).alias("sum_v"),
        F.avg(v).alias("avg_v"),
    )


def range_facet(
    results: DataFrame,
    docs: DataFrame,
    value_col: str,
    ranges: list[tuple[float | None, float | None]],
    query_col: str = "query_id",
    id_col: str = "doc_id",
) -> DataFrame:
    """(query_id, range_key, n_docs): the Elasticsearch ``range`` aggregation
    over each query's result set — explicit [from, to) buckets (from
    inclusive, to exclusive, either side open with None; overlapping ranges
    count a doc in every bucket it falls in, as ES does). Keys render as
    ``"lo-hi"`` with ``*`` for an open side; empty buckets are absent (same
    convention as ``histogram_facet``).

    Same scale shape as the other result-set facets: broadcast the q x k
    hits, the corpus never shuffles, output bounded by q x |ranges|."""
    hits = results.select(query_col, id_col)
    joined = docs.select(id_col, value_col).join(F.broadcast(hits), id_col)
    v = F.col(value_col).cast("double")
    buckets = []
    for lo, hi in ranges:
        key = f"{'*' if lo is None else lo}-{'*' if hi is None else hi}"
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (v >= float(lo))
        if hi is not None:
            cond = cond & (v < float(hi))
        buckets.append(F.when(cond, F.lit(key)))
    return (
        joined.select(query_col, F.explode(F.array(*buckets)).alias("range_key"))
        .where(F.col("range_key").isNotNull())
        .groupBy(query_col, "range_key")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def percentiles_facet(
    results: DataFrame,
    docs: DataFrame,
    value_col: str,
    percents: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rounding: int = 6,
) -> DataFrame:
    """(query_id, pct, value): the Elasticsearch ``percentiles`` aggregation
    over each query's result set — exact linear-interpolation percentiles
    (``percentile`` / SQL ``quantile_cont`` semantics: value at rank
    p*(n-1), interpolated), rounded for cross-engine stability.

    Exactness is affordable here because the input is the q x k *result*
    set, not the corpus: same broadcast-results join as ``stats_facet``,
    then one bounded groupBy. (A corpus-wide percentile at 10^12 rows would
    instead use ``percentile_approx`` — t-digest — which trades the
    cross-engine bit-contract for a single pass; result-set aggs don't need
    to.)"""
    hits = results.select(query_col, id_col)
    joined = docs.select(id_col, value_col).join(F.broadcast(hits), id_col)
    v = F.col(value_col).cast("double")
    pcts = [float(p) for p in percents]
    agged = joined.groupBy(query_col).agg(
        F.percentile(v, F.lit(pcts)).alias("vals")
    )
    pct_arr = F.array(*[F.lit(p) for p in pcts])
    return agged.select(
        query_col, F.posexplode("vals").alias("i", "raw")
    ).select(
        query_col,
        F.element_at(pct_arr, F.col("i") + 1).alias("pct"),
        F.round("raw", rounding).alias("value"),
    )


def significant_terms(
    results: DataFrame,
    doc_terms: DataFrame,
    n_docs: int,
    m: int = 10,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rounding: int = 6,
) -> DataFrame:
    """(query_id, rank, term, fg_count, bg_count, score): terms statistically
    overrepresented in each query's result set vs the whole corpus — the
    Elasticsearch ``significant_terms`` aggregation with its JLH heuristic:

        score = (fg_pct - bg_pct) * (fg_pct / bg_pct)

    where fg_pct = (result docs containing the term) / (result set size) and
    bg_pct = df / N. High JLH = common in the hits, rare in the background —
    the "what is this result set about" facet.

    Scale shape: broadcast the q x k hit list into the posting-table join
    (the corpus-sized ``doc_terms`` never shuffles), one (query, term)
    count agg whose input is bounded by q x k x terms-per-doc, then a
    background-df join ON the aggregated (query-cardinality) side and a
    per-query top-m window. Ranks are decided on the ``rounding``-rounded
    score (term asc ties) so the order is reproducible across engines.
    """
    hits = results.select(query_col, id_col)
    set_sizes = hits.groupBy(query_col).agg(
        F.countDistinct(id_col).alias("set_size")
    )
    fg = (
        doc_terms.select(id_col, "term")
        .join(F.broadcast(hits), id_col)
        .groupBy(query_col, "term")
        .agg(F.count(F.lit(1)).alias("fg_count"))
    )
    bg = doc_terms.groupBy("term").agg(F.count(F.lit(1)).alias("bg_count"))
    scored = (
        fg.join(F.broadcast(set_sizes), query_col)
        .join(bg, "term")
        .select(
            query_col,
            "term",
            "fg_count",
            "bg_count",
            (
                (
                    F.col("fg_count") / F.col("set_size")
                    - F.col("bg_count") / F.lit(float(n_docs))
                )
                * (
                    (F.col("fg_count") / F.col("set_size"))
                    / (F.col("bg_count") / F.lit(float(n_docs)))
                )
            ).alias("raw_score"),
        )
        .withColumn("score", F.round("raw_score", rounding))
    )
    w = Window.partitionBy(query_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= m)
        .select(
            query_col,
            F.col("rank").cast("long").alias("rank"),
            "term",
            F.col("fg_count").cast("long").alias("fg_count"),
            F.col("bg_count").cast("long").alias("bg_count"),
            "score",
        )
    )


def facet_counts(
    results: DataFrame,
    docs: DataFrame,
    facet_cols: list[str],
    query_col: str = "query_id",
    id_col: str = "doc_id",
) -> DataFrame:
    """(query_id, facet, value, n_docs) over the result sets.

    ``results`` needs (query_col, id_col); ``docs`` needs (id_col,
    *facet_cols). Facet values are stringified so heterogeneous facet
    columns stack into one output column.
    """
    hits = results.select(query_col, id_col)
    joined = docs.select(id_col, *facet_cols).join(F.broadcast(hits), id_col)
    stacked = joined.select(
        query_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("facet"),
                        F.col(c).cast("string").alias("value"),
                    )
                    for c in facet_cols
                ]
            )
        ).alias("fv"),
    )
    return stacked.groupBy(
        query_col, F.col("fv.facet").alias("facet"), F.col("fv.value").alias("value")
    ).agg(F.count(F.lit(1)).alias("n_docs"))


def cardinality_facet(
    results: DataFrame,
    docs: DataFrame,
    value_col: str,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    p: int = 8,
    rounding: int = 4,
) -> DataFrame:
    """(query_id, est_distinct): the Elasticsearch ``cardinality``
    aggregation over each query's result set — "how many distinct
    ``value_col`` values did my hits touch" — via the deterministic
    HyperLogLog sketch (``operators/sketches.py``), so the answer costs one
    m-bounded aggregate instead of an exact COUNT(DISTINCT) shuffle of every
    distinct value. Same broadcast shape as the other facets: results are
    query-cardinality, the corpus side is never shuffled.
    """
    from .sketches import hll_cardinality

    hits = results.select(query_col, id_col)
    joined = docs.select(id_col, value_col).join(F.broadcast(hits), id_col)
    return hll_cardinality(joined, value_col, [query_col], p=p, rounding=rounding)
