"""Cross-document duplicated-span removal (exact substring dedup).

The training-data cleanup from Lee et al. 2022, *Deduplicating Training Data
Makes Language Models Better* (ExactSubstr): any token span of length >= k
that occurs verbatim in more than one document is removed from every document
that carries it. Whole-doc dedup (``operators/dedup.py``) misses pages that
share a long quoted passage inside otherwise-unique text; line-level removal
(``functions/text_analysis.py:strip_boilerplate_lines``) misses spans that
cross line boundaries or sit mid-line. This operator is the span-granular
third member of the family. (The reference engine has no corpus-cleanup
surface at all — beyond-reference, like the rest of the dedup suite.)

Spark-first shape — the paper builds a monolithic suffix array, which does
not shard; the distributed equivalent is fingerprinted k-token windows:

* ``span_fingerprints`` — every k-token window hashed to ``md5`` of its
  space-joined tokens, all codegen (``transform`` over a ``sequence`` of
  starts + ``slice``/``concat_ws``/``md5``), one ``posexplode``. N·L rows,
  embarrassingly parallel, no Python.
* ``duplicated_span_starts`` — one fingerprint-keyed groupBy
  (``count(distinct doc_id) >= min_docs``) then a semi join back. The dup
  table is self-pruning (almost all windows are unique and drop at the
  HAVING), so the join's build side is small; at cluster scale both sides
  are hash-partitioned on ``fp`` — co-located, no skew (md5 keys).
* ``strip_duplicated_spans`` — union the covered positions (explode each
  dup window into its k positions, distinct), flag tokens by a left join on
  (doc_id, pos), and reassemble kept tokens in order with the same
  sort_array(collect_list(struct)) idiom as the line-level ops — linear,
  never a per-row quadratic array scan.

A k-gram window hash is exactly the paper's match predicate for spans of
length precisely k; spans longer than k are covered as k sliding windows,
so removal coverage is identical to ExactSubstr for every duplicated span
of length >= k (each of its positions lies inside some duplicated window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text_analysis import tokens_col


def span_fingerprints(
    corpus: DataFrame, k: int, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, start, fp): md5 of every k-token window, 1-based starts.

    Pure codegen; docs shorter than k tokens emit no windows.
    """
    arr = tokens_col(F.col(text_col))
    fps = F.when(
        F.size(arr) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(arr) - k + 1),
            lambda s: F.md5(F.concat_ws(" ", F.slice(arr, s, k))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return corpus.select(
        F.col(id_col).alias("doc_id"), F.posexplode(fps).alias("start0", "fp")
    ).select("doc_id", (F.col("start0") + 1).alias("start"), "fp")


def duplicated_span_starts(
    corpus: DataFrame,
    k: int,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, start): windows whose fingerprint occurs in >= min_docs docs."""
    wins = span_fingerprints(corpus, k, id_col=id_col, text_col=text_col)
    dup = (
        wins.groupBy("fp")
        .agg(F.countDistinct("doc_id").alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
        .select("fp")
    )
    return wins.join(dup, "fp", "left_semi").select("doc_id", "start")


def strip_duplicated_spans(
    corpus: DataFrame,
    k: int,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tokens, n_removed, clean_text): drop every token covered by
    a cross-document duplicated k-window; remaining tokens rejoin in order.

    Docs whose every token is covered still return a row (empty clean_text);
    docs shorter than k tokens pass through untouched.
    """
    src = corpus.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    starts = duplicated_span_starts(src, k, min_docs=min_docs)
    covered = starts.select(
        "doc_id", F.explode(F.sequence("start", F.col("start") + k - 1)).alias("pos")
    ).distinct()
    toks = src.select(
        "doc_id", F.posexplode(tokens_col(F.col("text"))).alias("pos0", "term")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "term")
    flagged = toks.join(
        covered.withColumn("is_cov", F.lit(True)), ["doc_id", "pos"], "left_outer"
    ).select("doc_id", "pos", "term", F.coalesce("is_cov", F.lit(False)).alias("is_cov"))
    kept_struct = F.sort_array(
        F.collect_list(F.when(~F.col("is_cov"), F.struct("pos", "term")))
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum(F.col("is_cov").cast("int")).cast("long").alias("n_removed"),
            F.concat_ws(
                " ", F.transform(kept_struct, lambda s: s["term"])
            ).alias("clean_text"),
        )
        .select("doc_id", "n_tokens", "n_removed", "clean_text")
    )
