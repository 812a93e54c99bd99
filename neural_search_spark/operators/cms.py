"""Count-Min Sketch frequency estimation — mergeable heavy-hitter counts.

The reference engine keeps no frequency statistics beyond the in-memory
rank-bm25 arrays (``/root/reference/src/neural_search/core/hybrid.py:69-72``);
production fulltext/analytics stacks ship a sketch-backed frequency surface
(Elasticsearch's term aggregations, Druid/Spark's approx counting) because an
exact ``GROUP BY value`` over 10^12 tokens shuffles every distinct value.
This is the from-scratch Count-Min Sketch (Cormode & Muthukrishnan 2005)
built — like ``operators/sketches.py`` — so that the whole sketch is
*reproducible integer arithmetic*: md5-derived bucket hashes and exact
integer counter sums make every estimate bit-identical across Spark and any
ANSI-SQL engine (the driver's DuckDB oracle recomputes it exactly).

Design (d depth rows, w buckets, all integers):

  bucket(i, v) = first-48-bits(md5(i || ':' || v)) mod w     i in [0, d)
  sketch       = sum of weights per (depth, bucket)          [<= d*w rows]
  est(v)       = min over i of counter[i][bucket(i, v)]      (0 if absent)

Guarantees (classic CMS): est >= true count always (no under-count), and
est <= true + eps * total_weight with probability 1 - delta for
w = ceil(e / eps), d = ceil(ln(1 / delta)) — e.g. d=4, w=2048 bounds the
overestimate by ~0.13% of the stream weight at 98% confidence, per query.

Scale shape: the per-row projection emits d (depth, bucket) pairs (a
constant-factor explode), map-side combine collapses each partition to at
most d*w rows before the single bounded shuffle, and the finished sketch is
a <= d*w-row table — the durable, broadcastable representation. Partials
built per slice (day, source, shard) merge by plain counter addition with NO
rescan (:func:`cms_merge`), and estimation joins the candidate set against
the broadcast sketch — the raw stream is never rescanned. That is the
100 TB shape: one tiny sketch per slice answers any union's frequency
queries. Candidate sets at scale come from a cheap pre-pass (per-partition
local top-k, a vocabulary table, or the query log), not from a global
distinct — the sketch's job is to make the *counting* pass cheap, and its
one-sided error keeps every true heavy hitter in the candidate union.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cms_bucket(value: Column, depth: int, w: int, hash_bits: int = 48) -> Column:
    """Bucket of ``value`` in depth row ``depth`` — md5-derived, portable.

    The 48-bit hash is non-negative in a 64-bit long on both engines, so
    ``%`` agrees; the per-depth salt is the decimal depth prefix, rendered
    identically by Spark's concat and SQL's ``::VARCHAR ||``.
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{depth}:"), value.cast("string"))),
            1,
            hash_bits // 4,
        ),
        16,
        10,
    ).cast("long")
    return h % F.lit(w)


def cms_partial(
    df: DataFrame,
    value_col: str,
    weight_col: str | None = None,
    group_cols: list[str] | None = None,
    d: int = 4,
    w: int = 2048,
) -> DataFrame:
    """(group_cols..., depth, bucket, cnt): the sketch itself — at most
    ``d * w`` counter rows per group, the durable/mergeable representation.
    ``weight_col`` (integer; default 1 per row) lets a pre-aggregated stream
    — e.g. (term, tf) pairs — count token occurrences without re-exploding.
    """
    if d < 1 or w < 2:
        raise ValueError(f"need d >= 1 and w >= 2, got d={d}, w={w}")
    group_cols = list(group_cols or [])
    wgt = (
        F.col(weight_col).cast("long") if weight_col is not None else F.lit(1).cast("long")
    )
    val = F.col(value_col)
    pairs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("depth"),
                    cms_bucket(val, i, w).alias("bucket"),
                )
                for i in range(d)
            ]
        )
    ).alias("db")
    return (
        df.select(*group_cols, pairs, wgt.alias("wgt"))
        .select(*group_cols, "db.depth", "db.bucket", "wgt")
        .groupBy(*group_cols, "depth", "bucket")
        .agg(F.sum("wgt").alias("cnt"))
    )


def cms_merge(partials: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Union sketches: counter-wise sum over any number of partials
    (re-grouped by ``group_cols``, which may collapse dimensions). The merge
    of per-slice sketches is EXACTLY the sketch of the concatenated stream —
    integer addition commutes — so estimates after :func:`cms_estimate` are
    identical (pinned in tests)."""
    group_cols = list(group_cols or [])
    return partials.groupBy(*group_cols, "depth", "bucket").agg(
        F.sum("cnt").alias("cnt")
    )


def cms_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    value_col: str = "val",
    d: int = 4,
    w: int = 2048,
) -> DataFrame:
    """(value_col, est_count): CMS frequency estimate for each candidate —
    min over depth rows of the matching counter (0 where the bucket row is
    absent, i.e. nothing ever hashed there). The sketch side is <= d*w rows
    and broadcast, so the candidate relation never shuffles."""
    cand = candidates.select(F.col(value_col).alias("val")).distinct()
    cb = cand.select(
        "val",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("depth"),
                        cms_bucket(F.col("val"), i, w).alias("bucket"),
                    )
                    for i in range(d)
                ]
            )
        ).alias("db"),
    ).select("val", "db.depth", "db.bucket")
    joined = cb.join(F.broadcast(sketch), ["depth", "bucket"], "left")
    return joined.groupBy("val").agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias("est_count")
    )


def cms_estimate_grouped(
    sketch: DataFrame,
    candidates: DataFrame,
    group_cols: list[str],
    value_col: str = "val",
    d: int = 4,
    w: int = 2048,
) -> DataFrame:
    """(group_cols..., value_col, est_count): estimate each candidate within
    every sketch group (e.g. per (window, event_type) partials). Inner-joins
    candidate buckets against the grouped counters, then a candidate missing
    ANY of its d depth rows in a group has a zero counter there — the
    estimate is 0, not the min of the rows that happened to exist (that
    would break the one-sided guarantee's tightness the other way: CMS's
    min must range over all d rows)."""
    cand = candidates.select(F.col(value_col).alias("val")).distinct()
    cb = cand.select(
        "val",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("depth"),
                        cms_bucket(F.col("val"), i, w).alias("bucket"),
                    )
                    for i in range(d)
                ]
            )
        ).alias("db"),
    ).select("val", "db.depth", "db.bucket")
    joined = sketch.join(F.broadcast(cb), ["depth", "bucket"])
    agg = joined.groupBy(*group_cols, "val").agg(
        F.min("cnt").alias("min_cnt"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    est = F.when(F.col("n_rows") < d, F.lit(0).cast("long")).otherwise(
        F.col("min_cnt")
    )
    hits = agg.select(*group_cols, "val", est.alias("est_count"))
    # every (group, candidate) pair gets a row — a candidate whose buckets
    # all miss a group's counters estimates 0, it does not vanish (parity
    # with the ungrouped cms_estimate's left-join-coalesce). Both sides of
    # the domain are bounded: distinct sketch groups x the candidate set.
    # The right side is re-projected under fresh names: domain and hits both
    # descend from `sketch`, and a name-list self-join on shared attribute
    # lineage fails resolution ("conflicting references").
    domain = sketch.select(*group_cols).distinct().crossJoin(F.broadcast(cand))
    keys = [*group_cols, "val"]
    h = hits.select(
        *[F.col(c).alias(f"__h_{c}") for c in keys], F.col("est_count")
    )
    cond = None
    for c in keys:
        eq = domain[c] == h[f"__h_{c}"]
        cond = eq if cond is None else (cond & eq)
    return domain.join(h, cond, "left").select(
        *keys,
        F.coalesce(F.col("est_count"), F.lit(0).cast("long")).alias("est_count"),
    )


def cms_topk(
    df: DataFrame,
    value_col: str,
    candidates: DataFrame,
    weight_col: str | None = None,
    k: int = 20,
    d: int = 4,
    w: int = 2048,
) -> DataFrame:
    """(rank, val, est_count): heavy hitters among ``candidates`` by CMS
    estimate over the ``df`` stream — build partial, estimate, rank
    (est desc, val asc). One bounded shuffle for the sketch, one broadcast
    join, one candidate-bounded window."""
    sketch = cms_partial(df, value_col, weight_col=weight_col, d=d, w=w)
    est = cms_estimate(sketch, candidates, value_col=value_col, d=d, w=w)
    from pyspark.sql import Window

    # orderBy().limit(k) compiles to TakeOrderedAndProject — a per-partition
    # top-k + driver merge, no single-partition sort — so the candidate set
    # (the whole vocabulary at web scale) never funnels through one task.
    # The row_number window then only ever sees the k survivors.
    top = est.orderBy(F.col("est_count").desc(), F.col("val").asc()).limit(k)
    win = Window.orderBy(F.col("est_count").desc(), F.col("val").asc())
    return (
        top.withColumn("rank", F.row_number().over(win))
        .select("rank", "val", "est_count")
    )


def cms_sql(
    value_expr: str,
    weight_expr: str,
    from_clause: str,
    candidate_clause: str,
    d: int = 4,
    w: int = 2048,
    k: int = 20,
) -> str:
    """The DuckDB/ANSI mirror of :func:`cms_topk` — same buckets, same
    integer counters, same min-over-depth and ranking (used by the driver
    oracle and as documentation of the cross-engine contract). The ranking
    window is candidate-bounded, fine for an oracle."""
    return f"""
stream AS (
  SELECT ({value_expr})::VARCHAR AS val, ({weight_expr})::BIGINT AS wgt
  FROM {from_clause}
),
depths AS (SELECT unnest(generate_series(0, {d - 1})) AS depth),
buck AS (
  SELECT d.depth,
         ('0x' || substr(md5(d.depth::VARCHAR || ':' || s.val), 1, 12))::BIGINT
           % {w} AS bucket,
         s.wgt
  FROM stream s, depths d
),
sketch AS (
  SELECT depth, bucket, sum(wgt)::BIGINT AS cnt FROM buck
  GROUP BY depth, bucket
),
cand AS (SELECT DISTINCT ({candidate_clause})::VARCHAR AS val FROM {from_clause}),
cb AS (
  SELECT c.val, d.depth,
         ('0x' || substr(md5(d.depth::VARCHAR || ':' || c.val), 1, 12))::BIGINT
           % {w} AS bucket
  FROM cand c, depths d
),
est AS (
  SELECT cb.val, min(coalesce(sk.cnt, 0))::BIGINT AS est_count
  FROM cb LEFT JOIN sketch sk USING (depth, bucket)
  GROUP BY cb.val
),
ranked AS (
  SELECT row_number() OVER (ORDER BY est_count DESC, val ASC) AS rank,
         val, est_count
  FROM est
)
SELECT rank, val, est_count FROM ranked WHERE rank <= {k}
"""
