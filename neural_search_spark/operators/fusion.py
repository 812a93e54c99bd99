"""Score fusion operators: min-max normalization, weighted hybrid, RRF.

Reference semantics reproduced exactly:
  * normalize_scores (``/root/reference/src/neural_search/core/hybrid.py:149-173``):
    (s - min) / (max - min); all-equal scores -> all 1.0; empty -> empty.
  * weighted hybrid (``hybrid.py:175-220``): normalize both lists, then
    combined[id] = alpha * dense_norm + (1 - alpha) * sparse_norm with a
    missing side contributing 0 (defaultdict); sort desc, cut top_k.
  * reciprocal rank fusion (``hybrid.py:222-251``): rrf[id] = Σ 1/(k + rank)
    over rankings, rank 1-based, k = 60.

The reference fuses Python dicts per query; here each fusion is a DataFrame
plan over *all* queries at once — window min/max per query, one full-outer
join, one groupBy — so a batch of thousands of queries fuses in one shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import HYBRID_ALPHA, RRF_K


def normalize_minmax(
    df: DataFrame,
    score_col: str = "score",
    out_col: str = "norm_score",
    by: list[str] | None = None,
) -> DataFrame:
    """Per-query min-max normalization with the all-equal -> 1.0 edge case."""
    by = by if by is not None else ["query_id"]
    w = Window.partitionBy(*by) if by else Window.partitionBy()
    mn, mx = F.min(score_col).over(w), F.max(score_col).over(w)
    norm = F.when(mx == mn, F.lit(1.0)).otherwise(
        (F.col(score_col) - mn) / (mx - mn)
    )
    return df.withColumn(out_col, norm)


def hybrid_fuse(
    dense: DataFrame,
    sparse: DataFrame,
    alpha: float = HYBRID_ALPHA,
    top_k: int | None = None,
    by: list[str] | None = None,
) -> DataFrame:
    """Weighted fusion of (query_id, doc_id, score) DataFrames.

    Returns (query_id, doc_id, dense_score, sparse_score, score, rank).
    """
    by = by if by is not None else ["query_id"]
    keys = [*by, "doc_id"]
    d = normalize_minmax(dense, "score", "dn", by).select(*keys, "dn")
    s = normalize_minmax(sparse, "score", "sn", by).select(*keys, "sn")
    joined = d.join(s, keys, "full_outer").select(
        *keys,
        F.coalesce("dn", F.lit(0.0)).alias("dense_score"),
        F.coalesce("sn", F.lit(0.0)).alias("sparse_score"),
    )
    fused = joined.withColumn(
        "score", F.lit(alpha) * F.col("dense_score") + F.lit(1.0 - alpha) * F.col("sparse_score")
    )
    w = Window.partitionBy(*by).orderBy(F.desc("score"), F.asc("doc_id"))
    fused = fused.withColumn("rank", F.row_number().over(w))
    if top_k is not None:
        fused = fused.where(F.col("rank") <= top_k)
    return fused


def rrf_fuse(
    rankings: DataFrame,
    k: int = RRF_K,
    top_k: int | None = None,
    by: list[str] | None = None,
) -> DataFrame:
    """Reciprocal rank fusion over (query_id, ranking_id, doc_id, rank) rows.

    ``rank`` is 1-based within each (query_id, ranking_id). If absent, it is
    derived from a ``score`` column (desc, doc_id asc tie-break).
    Returns (query_id, doc_id, score, rank).
    """
    by = by if by is not None else ["query_id"]
    if "rank" not in rankings.columns:
        w_in = Window.partitionBy(*by, "ranking_id").orderBy(
            F.desc("score"), F.asc("doc_id")
        )
        rankings = rankings.withColumn("rank", F.row_number().over(w_in))
    fused = rankings.groupBy(*by, "doc_id").agg(
        F.sum(1.0 / (F.lit(float(k)) + F.col("rank"))).alias("score")
    )
    w = Window.partitionBy(*by).orderBy(F.desc("score"), F.asc("doc_id"))
    fused = fused.withColumn("rank", F.row_number().over(w))
    if top_k is not None:
        fused = fused.where(F.col("rank") <= top_k)
    return fused
