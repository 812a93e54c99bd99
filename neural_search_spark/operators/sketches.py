"""Cardinality sketching (HyperLogLog) as a deterministic DataFrame plan.

The reference has no aggregation layer at all (its stats surface is the
handful of counters in ``/root/reference/src/neural_search/core/hybrid.py:
149-158``); production fulltext indexes ship an approximate distinct-count
aggregation (the Elasticsearch ``cardinality`` agg, backed by HyperLogLog++)
because exact ``COUNT(DISTINCT x)`` over 10^12 rows shuffles every distinct
value. This is the from-scratch HLL (Flajolet et al. 2007) built so that the
whole sketch is *reproducible arithmetic* — md5-derived hashes, integer
register math, and an exact-integer harmonic sum — making the estimate
bit-identical across Spark and any ANSI-SQL engine (the driver's DuckDB
oracle recomputes it exactly).

Design (m = 2^p registers, 48-bit hash):

  h     = first 12 hex chars of md5(value)          (48 bits, cross-engine)
  reg   = floor(h / 2^(48-p))                        (top p bits)
  w     = h mod 2^(48-p)                             (remaining bits)
  rho   = (48-p) - bitlen(w) + 1, or (48-p)+1 if w=0 (leading-zero run + 1)
  M_reg = max(rho) per register                      [shuffle 1: m-bounded]
  S     = sum over registers of 2^((48-p) - M_reg)   (integer — the harmonic
          sum scaled by 2^(48-p), so no float-order sensitivity; the one
          M_reg = (48-p)+1 case truncates its 0.5 term to 0 identically on
          both engines — see the note in finish_sketch)
  E_raw = alpha_m * m^2 * 2^(48-p) / S
  E     = m * ln(m / V) when E_raw <= 2.5m and V > 0  (linear counting,
          V = empty registers), else E_raw.

The only transcendental is one ``ln`` on a ratio of small exact integers,
rounded to 4dp — the same cross-engine contract the scoring paths use. The
64-bit large-range correction is unnecessary at 48 bits for any corpus this
engine targets (collisions bias < 0.01% below ~10^11 distincts per group;
raise the hash width before that regime).

Scale shape: one narrow projection per row, then a groupBy bounded by
(groups x m) rows, then a groups-bounded final agg — the classic two-level
partial-aggregation plan; map-side combine collapses each partition to at
most m rows before the shuffle regardless of input size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# alpha_m (Flajolet et al. 2007, fig. 3): tabulated for small m, the
# asymptotic formula for m >= 128. Rendered as a literal so the Spark
# expression and the SQL mirror parse the identical double; the explicit
# CAST keeps both engines out of DECIMAL arithmetic (a bare 0.673 parses as
# DECIMAL in DuckDB and overflows when multiplied by m^2 * 2^tail).
_ALPHA_SMALL = {
    16: "CAST(0.673 AS DOUBLE)",
    32: "CAST(0.697 AS DOUBLE)",
    64: "CAST(0.709 AS DOUBLE)",
}


def _alpha_expr(m: int) -> str:
    # The asymptotic branch needs the same CAST discipline as the table:
    # Spark's F.expr parses a bare 0.7213 as DECIMAL and the whole quotient
    # becomes DECIMAL(21,14) (0.71827262454208) while DuckDB computes DOUBLE
    # (0.7182725932495458) — a 4.4e-8 relative skew that flips 4dp rounding
    # on any estimate >= ~10^4.
    return _ALPHA_SMALL.get(
        m, f"CAST(0.7213 AS DOUBLE) / (1.0 + CAST(1.079 AS DOUBLE) / {m})"
    )


def hll_register_rho(value: Column, p: int = 8, hash_bits: int = 48) -> tuple[Column, Column]:
    """(register, rho) for one value — md5-derived, engine-portable.

    ``bitlen(w)`` via ``length(bin(w))`` (minimal-width binary string in both
    Spark and DuckDB) keeps the leading-zero count in exact integer space —
    no ``log2`` float boundary risk.
    """
    tail_bits = hash_bits - p
    h = F.conv(F.substring(F.md5(value.cast("string")), 1, hash_bits // 4), 16, 10).cast(
        "long"
    )
    reg = F.floor(h / F.lit(float(2**tail_bits))).cast("long")
    w = h % F.lit(2**tail_bits)
    rho = F.when(w == 0, F.lit(tail_bits + 1)).otherwise(
        F.lit(tail_bits) - F.length(F.bin(w)) + 1
    )
    return reg, rho.cast("long")


def hll_partial(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    p: int = 8,
) -> DataFrame:
    """(group_cols..., reg, mreg): the sketch itself — at most m register
    rows per group, the durable/mergeable representation. This is what a
    100 TB pipeline persists per day/partition/source: sketches union by
    ``hll_merge`` (register-wise max), so distinct counts over any
    combination of slices never rescan the data."""
    if not 4 <= p <= 14:
        raise ValueError(f"p must be in [4, 14], got {p}")
    group_cols = list(group_cols or [])
    reg, rho = hll_register_rho(F.col(value_col), p=p)
    return (
        df.select(*group_cols, reg.alias("reg"), rho.alias("rho"))
        .groupBy(*group_cols, "reg")
        .agg(F.max("rho").alias("mreg"))
    )


def hll_merge(partials: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Union sketches: register-wise max over any number of partials
    (re-grouped by ``group_cols``, which may be a subset of — or empty,
    collapsing — the dimensions the partials were built with). The merge of
    per-slice sketches is EXACTLY the sketch of the unioned data, so the
    estimate after :func:`hll_estimate` is identical — the property that
    makes the sketch distributable."""
    group_cols = list(group_cols or [])
    return partials.groupBy(*group_cols, "reg").agg(F.max("mreg").alias("mreg"))


def hll_estimate(
    partials: DataFrame,
    group_cols: list[str] | None = None,
    p: int = 8,
    rounding: int = 4,
) -> DataFrame:
    """(group_cols..., est_distinct): finish a sketch into the estimate
    (exact-integer harmonic sum + the linear-counting branch; module doc)."""
    group_cols = list(group_cols or [])
    m = 2**p
    tail_bits = 48 - p
    # Exact-integer harmonic sum: sum(2^(tail_bits - M)) <= m * 2^(tail_bits-1)
    # < 2^63 for every allowed p. pow(2.0, k) is exact for k <= 52.
    # One accepted approximation: a register can reach M = tail_bits + 1
    # (hash tail all zeros, probability ~2^-tail_bits), whose 2^-1 = 0.5
    # contribution truncates to 0 on the long cast. Spark's cast and DuckDB's
    # round-half-even cast both yield 0, so the engines stay bit-identical;
    # the estimate is infinitesimally biased high in that case, not "exact".
    folded = partials.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), F.lit(tail_bits) - F.col("mreg")).cast("long")).alias(
            "s_scaled"
        ),
        F.count(F.lit(1)).alias("n_regs"),
    )
    alpha = F.expr(_alpha_expr(m))
    e_raw = alpha * F.lit(float(m * m)) * F.lit(float(2**tail_bits)) / (
        # empty registers contribute 2^tail_bits each to the unscaled sum
        F.col("s_scaled") + (F.lit(m) - F.col("n_regs")) * F.lit(2**tail_bits)
    )
    v = F.lit(m) - F.col("n_regs")
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v),
    ).otherwise(e_raw)
    return folded.select(*group_cols, F.round(est, rounding).alias("est_distinct"))


def hll_cardinality(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    p: int = 8,
    rounding: int = 4,
) -> DataFrame:
    """(group_cols..., est_distinct): HyperLogLog distinct-count estimate of
    ``value_col`` per group. Deterministic: same input -> same estimate, on
    any engine that reproduces the register arithmetic (see module doc).
    ``hll_partial`` -> ``hll_estimate`` in one call."""
    return hll_estimate(
        hll_partial(df, value_col, group_cols, p=p),
        group_cols,
        p=p,
        rounding=rounding,
    )


def hll_sql(
    value_expr: str,
    from_clause: str,
    group_exprs: list[str] | None = None,
    p: int = 8,
    rounding: int = 4,
) -> str:
    """The DuckDB/ANSI mirror of :func:`hll_cardinality` — same registers,
    same exact-integer sum, same branch arithmetic (used by the driver
    oracle and usable as documentation of the contract)."""
    group_exprs = list(group_exprs or [])
    m = 2**p
    tail = 48 - p
    gsel = "".join(f"{g}, " for g in group_exprs)
    gby = ("GROUP BY " + ", ".join(group_exprs)) if group_exprs else ""
    gby_reg = "GROUP BY " + ", ".join([*group_exprs, "reg"])
    alpha = _alpha_expr(m)
    return f"""
hashed AS (
  SELECT {gsel}
         ('0x' || substr(md5(({value_expr})::VARCHAR), 1, 12))::BIGINT AS h
  FROM {from_clause}
),
regs AS (
  SELECT {gsel} floor(h / {float(2 ** tail)})::BIGINT AS reg,
         CASE WHEN h % {2 ** tail} = 0 THEN {tail + 1}
              ELSE {tail} - length(ltrim(bin(h % {2 ** tail}), '0')) + 1 END AS rho
  FROM hashed
),
mregs AS (SELECT {gsel} reg, max(rho) AS mreg FROM regs {gby_reg}),
folded AS (
  SELECT {gsel}
         sum((2.0 ^ ({tail} - mreg))::BIGINT)::BIGINT AS s_scaled,
         count(*) AS n_regs
  FROM mregs {gby}
),
est AS (
  SELECT {gsel}
         ({alpha}) * {float(m * m)} * {float(2 ** tail)}
           / (s_scaled + ({m} - n_regs) * {2 ** tail}) AS e_raw,
         {m} - n_regs AS v
  FROM folded
)
SELECT {gsel}
       round(CASE WHEN e_raw <= {2.5 * m} AND v > 0
                  THEN {float(m)} * ln({float(m)} / v)
                  ELSE e_raw END, {rounding}) AS est_distinct
FROM est
"""


def hll_merge_maps_col(maps: Column) -> Column:
    """Fold an array of register maps (``map<int,int>`` reg -> max rho) into
    one by register-wise max — the columnar sketch-merge for rows that carry
    their sketch as a map column (e.g. a rollup table's per-hour user
    sketch). Pure codegen: ``aggregate`` + ``map_zip_with``."""
    empty = F.map_from_arrays(
        F.array().cast("array<int>"), F.array().cast("array<int>")
    )
    return F.aggregate(
        maps,
        empty,
        lambda acc, m: F.map_zip_with(
            acc, m,
            lambda _k, a, b: F.greatest(F.coalesce(a, F.lit(0)), F.coalesce(b, F.lit(0))),
        ),
    )


def hll_estimate_from_map(regs: Column, p: int = 8, rounding: int = 4) -> Column:
    """Finish a map-column sketch into the distinct-count estimate — the
    same exact-integer harmonic sum + linear-counting arithmetic as
    :func:`hll_estimate`, as a single codegen expression over
    ``map<int,int>``."""
    m = 2**p
    tail = 48 - p
    s_scaled = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0).cast("long"),
        lambda acc, r: acc
        + F.pow(
            F.lit(2.0), F.lit(tail) - F.coalesce(F.element_at(regs, r), F.lit(0))
        ).cast("long"),
    )
    v = F.lit(m) - F.size(regs)
    alpha = F.expr(_alpha_expr(m))
    e_raw = alpha * F.lit(float(m * m)) * F.lit(float(2**tail)) / s_scaled
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v),
    ).otherwise(e_raw)
    return F.round(est, rounding)
