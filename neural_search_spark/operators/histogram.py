"""Mergeable histogram sketch — approximate quantiles without a global sort.

Exact percentiles (``operators/facets.py:percentiles_facet``) sort every
value of the group; at 10^12 rows that is the shuffle a sketch exists to
avoid. This is the fixed-bin histogram sketch (the same family as Spark's
``approx_percentile`` / Druid's fixed-bucket histograms, simplified to stay
*reproducible arithmetic*): per-bin long counts are the durable partial,
partials merge by addition with NO rescan, and quantiles come from linear
interpolation inside the located bin. Every step is integer counting plus
one fixed-shape double expression rounded to 4dp — bit-identical across
Spark and the DuckDB oracle (same contract as ``operators/sketches.py``).

Design (nbins bins over [lo, hi], both taken from the data in one cheap
min/max agg or supplied by the caller):

  bin(x)  = clamp(floor((x - lo) * nbins / (hi - lo)), 0, nbins - 1)
  partial = count per (group, bin)                       [<= nbins rows/group]
  cum(b)  = running count through bin b  (window over <= nbins rows)
  q(t)    : first bin with cum >= ceil(t * total); estimate by linear
            interpolation of the target's position inside that bin's range.

Error bound: a quantile estimate is off by at most one bin width
(hi - lo) / nbins — for nbins = 256 under 0.4% of the value range —
and the count arithmetic is exact, so the located bin is never wrong.

Scale shape: one narrow projection, one map-side-combined groupBy bounded
at nbins rows per group, and windows/joins only over nbins-bounded
relations. Per-slice partials (day, source) union into any rollup via
:func:`hist_merge` — the identical two-level pattern as the HLL and CMS
sketches, and the reason this shape survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hist_bin(value: Column, lo: Column, hi: Column, nbins: int) -> Column:
    """Bin index of ``value`` over [lo, hi] — the one float expression,
    shaped identically in the SQL mirror (degenerate hi == lo -> bin 0)."""
    raw = F.floor((value - lo) * F.lit(nbins) / (hi - lo)).cast("long")
    clamped = F.least(F.greatest(raw, F.lit(0).cast("long")), F.lit(nbins - 1).cast("long"))
    return F.when(hi == lo, F.lit(0).cast("long")).otherwise(clamped)


def hist_partial(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    nbins: int = 256,
    bounds: tuple[float, float] | None = None,
) -> DataFrame:
    """(group_cols..., lo, hi, bin, cnt, nbins): the sketch — at most
    ``nbins`` counter rows per group plus the [lo, hi, nbins] frame they
    were binned over.
    ``bounds`` pins the frame explicitly (what a 100 TB pipeline does: fix
    the frame once, then every slice's partial is built against the same
    bins and merges exactly); by default one min/max agg over the input
    derives it (broadcast single row, no collect)."""
    if nbins < 2:
        raise ValueError(f"need nbins >= 2, got {nbins}")
    group_cols = list(group_cols or [])
    src = df.select(*group_cols, F.col(value_col).cast("double").alias("val")).where(
        F.col("val").isNotNull()
    )
    if bounds is not None:
        b_lo, b_hi = float(bounds[0]), float(bounds[1])
        framed = src.select(
            *group_cols, "val", F.lit(b_lo).alias("lo"), F.lit(b_hi).alias("hi")
        )
    elif group_cols:
        # derived frames are per group (mirrors hist_sql); the frame relation
        # is group-bounded and broadcast
        frame = src.groupBy(*group_cols).agg(
            F.min("val").alias("lo"), F.max("val").alias("hi")
        )
        framed = src.join(F.broadcast(frame), group_cols)
    else:
        frame = src.agg(F.min("val").alias("lo"), F.max("val").alias("hi"))
        framed = src.join(F.broadcast(frame))
    return (
        framed.select(
            *group_cols,
            "lo",
            "hi",
            hist_bin(F.col("val"), F.col("lo"), F.col("hi"), nbins).alias("bin"),
        )
        .groupBy(*group_cols, "lo", "hi", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
        # the bin count is part of the frame: a persisted partial finished or
        # merged later (CLI --merge-inputs) must be read back with the SAME
        # nbins or every estimate silently compresses/stretches — recording it
        # lets hist_quantiles use the build-time value and hist_merge reject
        # mixed-bin unions (projection after the agg: still one stateful agg
        # in the streaming reuse)
        .withColumn("nbins", F.lit(int(nbins)))
    )


def hist_merge(
    partials: DataFrame,
    group_cols: list[str] | None = None,
    validate: bool = True,
) -> DataFrame:
    """Union sketches built over the SAME [lo, hi] frame: bin-wise count
    addition (re-grouped by ``group_cols``, which may collapse dimensions).
    Merged partials are exactly the sketch of the concatenated data, so
    quantile estimates are identical (pinned in tests). Mixing frames is an
    error, not a silent misestimate.

    ``validate`` runs an eager mixed-frame check — one extra job over the
    partials' lineage, which a caller merging LAZY partials pays twice
    (check + consumption). Materialized sketch tables (the normal 100 TB
    shape: partials persisted per slice) pay only the tiny re-read; callers
    who built every partial against the same explicit ``bounds`` may pass
    ``validate=False`` to keep the merge plan-only."""
    group_cols = list(group_cols or [])
    # nbins is part of the frame when present (partials written before it was
    # recorded merge on [lo, hi] alone, the old behavior)
    legacy = "nbins" not in partials.columns
    frame_cols = ["lo", "hi"] + ([] if legacy else ["nbins"])
    if legacy:
        # legacy partials are accepted for backward compatibility, but the
        # frame check can no longer see a bin-count mix — say so loudly
        # rather than silently weakening the contract
        import warnings

        warnings.warn(
            "hist_merge: partials carry no recorded nbins (written before it "
            "was part of the frame); the mixed-frame check covers [lo, hi] "
            "only, so the merge is correct only if every slice was built "
            "with the same bin count — pass that build-time value to "
            "hist_quantiles(nbins=...) when finishing",
            stacklevel=2,
        )
    if validate:
        mixed = (
            partials.groupBy(*group_cols)
            .agg(F.count_distinct(F.struct(*frame_cols)).alias("nf"))
            .where(F.col("nf") > 1)
            .limit(1)
            .count()
        )
        if mixed:
            raise ValueError(
                "hist_merge: an output group unions partials with different "
                "[lo, hi] frames or bin counts; sketches are only mergeable "
                "against identical bins — build them with an explicit shared "
                "`bounds` and the same `nbins`"
            )
    return partials.groupBy(*group_cols, *frame_cols, "bin").agg(
        F.sum("cnt").alias("cnt")
    )


def _check_qs(qs: list[float]) -> None:
    """q = 0 (or anything outside (0, 1]) has no rank-1 target bin — the
    locate join would silently emit NO row for it, so reject up front."""
    if not qs or any(not 0.0 < float(q) <= 1.0 for q in qs):
        raise ValueError(f"quantiles must be in (0, 1], got {qs}")


def hist_quantiles(
    partials: DataFrame,
    qs: list[float],
    group_cols: list[str] | None = None,
    nbins: int = 256,
    rounding: int = 4,
) -> DataFrame:
    """(group_cols..., q, est): finish a sketch into quantile estimates.

    Target rank t = ceil(q * total) (1-based, the standard lower-quantile
    convention); the estimate interpolates the target's position within the
    located bin's value range. Every comparison is on exact longs; only the
    final position arithmetic is float, rounded to ``rounding``.

    The bin width comes from the ``nbins`` recorded in the partial when
    present; the ``nbins`` parameter is only the fallback for partials
    persisted before it was recorded.
    """
    _check_qs(qs)
    group_cols = list(group_cols or [])
    # prefer the bin count recorded in the partial at build time — trusting
    # the caller's nbins against a persisted sketch built with a different
    # --bins would scale every estimate by the ratio with no error
    frame_cols = ["lo", "hi"] + (["nbins"] if "nbins" in partials.columns else [])
    gwin = Window.partitionBy(*[F.col(g) for g in group_cols]).orderBy("bin")
    cum = partials.select(
        *group_cols,
        *frame_cols,
        "bin",
        "cnt",
        F.sum("cnt").over(gwin).alias("cum"),
        F.sum("cnt").over(
            Window.partitionBy(*[F.col(g) for g in group_cols])
        ).alias("total"),
    )
    qrows = partials.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    # candidate bins per q: the first whose cumulative count reaches the
    # target rank; both sides of this join are nbins- and |qs|-bounded
    tgt = F.ceil(F.col("q") * F.col("total")).cast("long")
    hit = (
        cum.join(F.broadcast(qrows))
        .where((F.col("cum") >= tgt) & (tgt >= F.col("cum") - F.col("cnt") + 1))
        .select(
            *group_cols,
            "q",
            *frame_cols,
            "bin",
            "cnt",
            "cum",
            tgt.alias("tgt"),
        )
    )
    nbins_col = F.col("nbins") if "nbins" in frame_cols else F.lit(nbins)
    width = (F.col("hi") - F.col("lo")) / nbins_col
    frac = (F.col("tgt") - (F.col("cum") - F.col("cnt"))).cast("double") / F.col(
        "cnt"
    ).cast("double")
    est = F.col("lo") + (F.col("bin").cast("double") + frac) * width
    return hit.select(
        *group_cols,
        "q",
        F.round(est, rounding).alias("est"),
    )


def hist_quantile_sketch(
    df: DataFrame,
    value_col: str,
    qs: list[float],
    group_cols: list[str] | None = None,
    nbins: int = 256,
    bounds: tuple[float, float] | None = None,
    rounding: int = 4,
) -> DataFrame:
    """(group_cols..., q, est): histogram-sketch quantiles of ``value_col``
    per group — ``hist_partial`` -> ``hist_quantiles`` in one call."""
    return hist_quantiles(
        hist_partial(df, value_col, group_cols, nbins=nbins, bounds=bounds),
        qs,
        group_cols,
        nbins=nbins,
        rounding=rounding,
    )


def hist_sql(
    value_expr: str,
    from_clause: str,
    qs: list[float],
    group_exprs: list[str] | None = None,
    nbins: int = 256,
    rounding: int = 4,
) -> str:
    """The DuckDB/ANSI mirror of :func:`hist_quantile_sketch` with derived
    bounds — same bins, same exact-integer ranks, same interpolation
    expression (used by the driver oracle; grouped form mirrors per-group
    min/max frames)."""
    _check_qs(qs)
    group_exprs = list(group_exprs or [])
    gsel = "".join(f"{g}, " for g in group_exprs)
    gby = ("GROUP BY " + ", ".join(group_exprs)) if group_exprs else ""
    part = ("PARTITION BY " + ", ".join(group_exprs)) if group_exprs else ""
    join_on = (
        " AND ".join(f"v.{g} = f.{g}" for g in group_exprs) if group_exprs else "1=1"
    )
    # explicit DOUBLE: a bare 0.5 literal is DECIMAL in DuckDB, which would
    # surface as decimal.Decimal rows instead of the floats Spark returns
    qvals = ", ".join(f"({float(q)})::DOUBLE" for q in qs)
    return f"""
vals AS (
  SELECT {gsel} ({value_expr})::DOUBLE AS val FROM {from_clause}
  WHERE ({value_expr}) IS NOT NULL
),
frame AS (SELECT {gsel} min(val) AS lo, max(val) AS hi FROM vals {gby}),
binned AS (
  SELECT {"".join(f"v.{g}, " for g in group_exprs)} f.lo, f.hi,
         CASE WHEN f.hi = f.lo THEN 0
              ELSE least(greatest(floor((v.val - f.lo) * {nbins} / (f.hi - f.lo))::BIGINT,
                                  0), {nbins - 1}) END AS bin
  FROM vals v JOIN frame f ON {join_on}
),
sketch AS (
  SELECT {gsel} lo, hi, bin, count(*)::BIGINT AS cnt FROM binned
  GROUP BY {gsel} lo, hi, bin
),
cum AS (
  SELECT {gsel} lo, hi, bin, cnt,
         sum(cnt) OVER ({part} ORDER BY bin)::BIGINT AS cum,
         sum(cnt) OVER ({part})::BIGINT AS total
  FROM sketch
),
qrows AS (SELECT unnest([{qvals}]) AS q),
hit AS (
  SELECT {gsel} q, lo, hi, bin, cnt, cum,
         ceil(q * total)::BIGINT AS tgt
  FROM cum, qrows
  WHERE cum >= ceil(q * total)::BIGINT
    AND ceil(q * total)::BIGINT >= cum - cnt + 1
)
SELECT {gsel} q,
       round(lo + (bin::DOUBLE + (tgt - (cum - cnt))::DOUBLE / cnt::DOUBLE)
                  * ((hi - lo) / {nbins}), {rounding}) AS est
FROM hit
"""
