"""Token-budget curation: pick the best documents that fit a token budget.

A training-data pipeline rarely takes "all docs above quality X" — it takes
"the best N billion tokens" (a data-mixing budget per source/epoch). The
reference has no notion of this (it indexes whatever it is given); the
operator is the selection primitive that policy needs.

Contract (deterministic, oracle-checkable):

* quality is quantized to ``precision`` decimal places (the bucket value is
  also what the operator reports back);
* docs are ordered by (quantized quality DESC, doc_id ASC);
* a doc is selected iff the cumulative token count up to and including it
  is <= ``budget_tokens`` (tokens are non-negative, so this filter equals
  the maximal selectable prefix).

Scale shape — the naive form is one global sort + a running-total window
over the entire corpus (a single-partition window: a non-starter at 100 TB).
This implementation is the classic two-pass histogram split:

  pass 1  one groupBy over the quantized quality -> per-bucket token sums
          (bounded by 10^precision * value-range buckets, collected to the
          driver: KBs);
  driver  walk buckets best-first to find the threshold bucket where the
          cumulative crosses the budget;
  pass 2  every doc strictly above the threshold is selected with NO sort
          at all (a filter); only the single threshold bucket needs the
          doc_id-ordered running total, and that window runs over one
          bucket (~corpus/n_buckets docs), not the corpus.

At any realistic precision the threshold bucket is a vanishing corpus
fraction, so the one remaining window is bounded; if a degenerate score
distribution concentrates mass in one bucket, raise ``precision``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def select_token_budget(
    docs: DataFrame,
    budget_tokens: int,
    quality_col: str = "quality",
    tokens_col: str = "n_tokens",
    precision: int = 3,
) -> DataFrame:
    """(doc_id, quality, n_tokens) of the docs selected under the budget.

    ``docs`` must carry (doc_id, quality_col, tokens_col); compose with
    ``functions/text_analysis.quality_score`` + ``token_profile`` for the
    standard webtext scorer.
    """
    q = F.round(F.col(quality_col), precision)
    base = docs.select(
        "doc_id", q.alias("_q"), F.col(tokens_col).cast("long").alias("_tok")
    )

    # pass 1: bucket histogram (driver-sized)
    hist = (
        base.groupBy("_q")
        .agg(F.sum("_tok").alias("toks"))
        .collect()
    )
    cum = 0
    threshold = None  # bucket where the cumulative crosses the budget
    remaining = budget_tokens
    for row in sorted(hist, key=lambda r: -r["_q"]):
        if cum + row["toks"] > budget_tokens:
            threshold = row["_q"]
            remaining = budget_tokens - cum
            break
        cum += row["toks"]

    sel_cols = [
        F.col("doc_id"),
        F.col("_q").alias(quality_col),
        F.col("_tok").alias(tokens_col),
    ]
    if threshold is None:
        # everything fits
        return base.select(*sel_cols)

    # pass 2: full buckets are a filter; only the threshold bucket sorts
    above = base.where(F.col("_q") > F.lit(threshold)).select(*sel_cols)
    w = Window.partitionBy("_q").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    edge = (
        base.where(F.col("_q") == F.lit(threshold))
        .withColumn("_cum", F.sum("_tok").over(w))
        .where(F.col("_cum") <= remaining)
        .select(*sel_cols)
    )
    return above.unionByName(edge)
