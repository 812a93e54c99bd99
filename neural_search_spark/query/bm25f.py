"""BM25F: multi-field ranking with per-field weights and length norms.

The reference scores one flat ``content`` string per document
(``/root/reference/src/neural_search/api/schemas.py:14`` — documents carry a
single text field; rank-bm25 sees one token list). Real search engines rank
over *fields* (title, body, anchor...) where a title hit should outweigh a
body hit: Lucene/Elasticsearch do this with per-field indexes + boosts, and
the principled combination is BM25F (Robertson, Zaragoza & Taylor, CIKM 2004,
"Simple BM25 extension to multiple weighted fields"):

    tf~(t, d) = sum_f  w_f * tf_f(t, d) / B_f(d)
    B_f(d)    = 1 - b_f + b_f * len_f(d) / avg_len_f
    score     = sum_t qtf(t) * idf(t) * tf~ / (k1 + tf~)

i.e. field tfs are length-normalized *per field*, weighted, and summed into
one pseudo-frequency BEFORE saturation — a title hit saturates jointly with
body hits instead of getting an independent k1 curve (the known flaw of
naive per-field BM25 summation). idf stays document-level (a term's df is
the number of docs containing it in ANY field), so the epsilon-floored idf
machinery of the flat engine is reused unchanged.

Spark-first shape: fielded term frequencies come from one ``posexplode``
pass (position -> field label), aggregate (doc_id, field, term); the query
side is broadcast; the pseudo-frequency fold is a two-level aggregation on
the same (query, doc [, term]) grain as the flat plan — partial aggs
map-side, no extra wide shuffle vs the flat path.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import BM25Params, DEFAULT_PARAMS
from ..functions.tokenize import tokenize_udf
from ..index.stats import BM25Index
from .bm25_dataframe import query_terms


@dataclass(frozen=True)
class FieldSpec:
    """Per-field BM25F parameters: boost weight and length-norm slope."""

    weight: float = 1.0
    b: float = 0.75


@dataclass(frozen=True)
class BM25FParams:
    k1: float = DEFAULT_PARAMS.k1
    fields: dict[str, FieldSpec] = field(
        default_factory=lambda: {
            "title": FieldSpec(weight=3.0),
            "body": FieldSpec(weight=1.0),
        }
    )


DEFAULT_BM25F = BM25FParams()


def split_fielded_terms(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    title_tokens: int = 8,
) -> DataFrame:
    """(doc_id, field, term, tf): derive title/body fields from a flat text.

    The first ``title_tokens`` tokens are the 'title' field, the rest the
    'body' — a deterministic split both engines can derive when the corpus
    has no explicit field structure. A corpus with real per-field columns
    can skip this and union per-field ``doc_terms`` directly.
    """
    pos = F.posexplode(tokenize_udf(F.col(text_col)))
    toks = corpus.select(F.col(id_col).alias("doc_id"), pos.alias("pos", "term"))
    fielded = toks.select(
        "doc_id",
        F.when(F.col("pos") < title_tokens, F.lit("title"))
        .otherwise(F.lit("body"))
        .alias("field"),
        "term",
    )
    return fielded.groupBy("doc_id", "field", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )


def field_lengths(fielded_terms: DataFrame) -> DataFrame:
    """(doc_id, field, field_len) from the fielded tf table."""
    return fielded_terms.groupBy("doc_id", "field").agg(
        F.sum("tf").alias("field_len")
    )


def avg_field_lengths(fielded_terms: DataFrame, n_docs: int) -> dict[str, float]:
    """Per-field average length over ALL N docs (missing field counts as 0),
    collected driver-side (one tiny row per field) so the norm divisor is a
    literal in the scoring expression — same role as avgdl in the flat path.

    Aggregates ``fielded_terms`` directly (sum of tf per field) so no
    intermediate needs to be persisted for this eager stat: the lazy
    ``field_lengths`` relation is computed exactly once inside the final
    scoring plan, and this one-row-per-field agg is its own tiny job."""
    rows = fielded_terms.groupBy("field").agg(F.sum("tf").alias("total")).collect()
    return {r["field"]: float(r["total"]) / float(n_docs) for r in rows}


def _check_fields_covered(avgfl: dict[str, float], params: BM25FParams) -> None:
    """Rows whose field value has no FieldSpec would get a null weight and
    silently vanish from the aggregates; make that an error instead."""
    unknown = sorted(set(avgfl) - set(params.fields))
    if unknown:
        raise ValueError(
            f"fielded_terms contains fields {unknown} not covered by "
            f"params.fields {sorted(params.fields)}; rows in uncovered "
            "fields would be silently dropped from scoring"
        )


def bm25f_topk(
    index: BM25Index,
    fielded_terms: DataFrame,
    queries: DataFrame,
    params: BM25FParams = DEFAULT_BM25F,
    positive_only: bool = True,
    score_rounding: int | None = None,
) -> DataFrame:
    """Per-query BM25F top-k: (query_id, rank, doc_id, score).

    ``index`` supplies document-level idf (df over any field) and N; field
    norms come from ``fielded_terms``. Tie-break (score desc, doc_id asc);
    with ``score_rounding`` every rank boundary is decided on the rounded
    score (the oracle-reconciliation contract shared by the physical paths).
    """
    avgfl = avg_field_lengths(fielded_terms, index.stats.n_docs)
    _check_fields_covered(avgfl, params)
    flen = field_lengths(fielded_terms)

    qt = query_terms(queries)
    q_idf = qt.join(index.terms.select("term", "idf"), "term", "inner")

    # per-(query, doc, term, field): weighted length-normalized field tf
    norm = None
    for fname, spec in params.fields.items():
        denom = 1.0 - spec.b + spec.b * F.col("field_len").cast("double") / F.lit(
            avgfl.get(fname, 1.0)
        )
        val = F.lit(spec.weight) * F.col("tf").cast("double") / denom
        cond = F.col("field") == fname
        norm = F.when(cond, val) if norm is None else norm.when(cond, val)
    wtf_rows = (
        fielded_terms.join(flen, ["doc_id", "field"])
        .join(F.broadcast(q_idf), "term")
        .select("query_id", "top_k", "doc_id", "term", "qtf", "idf", norm.alias("wtf"))
    )
    # fold fields into the pseudo-frequency, then saturate once (the BM25F
    # distinction vs per-field BM25 summation)
    per_term = wtf_rows.groupBy(
        "query_id", "top_k", "doc_id", "term", "qtf", "idf"
    ).agg(F.sum("wtf").alias("tft"))
    k1 = params.k1
    contrib = per_term.select(
        "query_id",
        "top_k",
        "doc_id",
        (
            F.col("qtf").cast("double")
            * F.col("idf")
            * (F.col("tft") / (F.lit(k1) + F.col("tft")))
        ).alias("c"),
    )
    per_doc = contrib.groupBy("query_id", "top_k", "doc_id").agg(
        F.sum("c").alias("score")
    )
    if positive_only:
        per_doc = per_doc.where(F.col("score") > 0)
    if score_rounding is not None:
        per_doc = per_doc.withColumn("score", F.round("score", score_rounding))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        per_doc.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= F.col("top_k"))
        .select("query_id", "rank", "doc_id", "score")
    )


def dis_max_topk(
    index: BM25Index,
    fielded_terms: DataFrame,
    queries: DataFrame,
    params: BM25FParams = DEFAULT_BM25F,
    tie_breaker: float = 0.0,
    positive_only: bool = True,
    score_rounding: int | None = None,
) -> DataFrame:
    """Per-query dis_max top-k: (query_id, rank, doc_id, score) — the
    Elasticsearch ``dis_max`` / ``multi_match type=best_fields`` combiner,
    the OTHER multi-field philosophy vs BM25F:

        score(q, d) = max_f s_f  +  tie_breaker * (sum_f s_f - max_f s_f)

    where s_f is the field's own length-normalized Okapi BM25 score times
    its boost (``FieldSpec.weight``). Best-fields wins when query terms are
    expected to co-occur in ONE field (navigational "title matches"), where
    BM25F's cross-field tf pooling dilutes; tie_breaker > 0 re-admits the
    other fields' evidence softly. idf stays document-level (df over any
    field), as in ``bm25f_topk``.

    Plan shape: the same fielded posting relation; one (query, doc, field)
    aggregate then one (query, doc) aggregate — nested grains, both
    partial-agg friendly, no shuffle beyond the flat path's.
    """
    avgfl = avg_field_lengths(fielded_terms, index.stats.n_docs)
    _check_fields_covered(avgfl, params)
    flen = field_lengths(fielded_terms)

    qt = query_terms(queries)
    q_idf = qt.join(index.terms.select("term", "idf"), "term", "inner")

    k1 = params.k1
    denom = None
    for fname, spec in params.fields.items():
        d = (
            F.col("tf").cast("double")
            + k1
            * (
                1.0
                - spec.b
                + spec.b
                * F.col("field_len").cast("double")
                / F.lit(avgfl.get(fname, 1.0))
            )
        )
        cond = F.col("field") == fname
        denom = F.when(cond, d) if denom is None else denom.when(cond, d)
    contrib = (
        fielded_terms.join(flen, ["doc_id", "field"])
        .join(F.broadcast(q_idf), "term")
        .select(
            "query_id", "top_k", "doc_id", "field",
            (
                F.col("qtf").cast("double")
                * F.col("idf")
                * (F.col("tf").cast("double") * (k1 + 1.0) / denom)
            ).alias("c"),
        )
    )
    weight = None
    for fname, spec in params.fields.items():
        cond = F.col("field") == fname
        w = F.lit(float(spec.weight))
        weight = F.when(cond, w) if weight is None else weight.when(cond, w)
    per_field = contrib.groupBy("query_id", "top_k", "doc_id", "field").agg(
        F.sum("c").alias("raw_s")
    ).select(
        "query_id", "top_k", "doc_id", (weight * F.col("raw_s")).alias("s")
    )
    combined = per_field.groupBy("query_id", "top_k", "doc_id").agg(
        F.max("s").alias("mx"), F.sum("s").alias("sm")
    )
    score = F.col("mx") + F.lit(float(tie_breaker)) * (F.col("sm") - F.col("mx"))
    per_doc = combined.select("query_id", "top_k", "doc_id", score.alias("score"))
    if positive_only:
        per_doc = per_doc.where(F.col("score") > 0)
    if score_rounding is not None:
        per_doc = per_doc.withColumn("score", F.round("score", score_rounding))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        per_doc.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= F.col("top_k"))
        .select("query_id", "rank", "doc_id", "score")
    )
