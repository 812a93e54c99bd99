"""Deterministic train/val/test splitting — the last gate before export.

A training-data pipeline needs document-level splits that are (a) stable
across runs and engines (re-running the pipeline, or auditing it in another
system, must reproduce the same membership), (b) row-local (no shuffle, no
global sort, no sampling state), and (c) leakage-safe under growth (a doc's
split never changes when the corpus grows — membership is a pure function
of the doc key, not of position or count). The standard construction is a
keyed hash bucket: ppm = md5(seed:key) mod 1e6, thresholded by cumulative
fractions — the same md5-ppm primitive as ``functions/urls.py``'s
deterministic domain sampling, reused so every selection decision in the
pipeline shares one auditable mechanism.

Scale shape: one projection, zero shuffles, whole-stage codegen (md5/conv
are JVM built-ins). At 100 TB this is a free rider on whatever scan already
touches the rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_FRACTIONS: dict[str, float] = {"train": 0.9, "val": 0.05, "test": 0.05}


def split_bucket(key: Column, seed: str) -> Column:
    """Deterministic ppm bucket in [0, 1e6) — md5 of ``seed:key``, first 8
    hex digits (32 bits, far above the 1e6 resolution), mod 1e6. Identical
    arithmetic is expressible in any SQL engine
    (``('0x' || substr(md5(...), 1, 8))::BIGINT % 1000000`` in DuckDB)."""
    h = F.md5(F.concat(F.lit(seed), F.lit(":"), key.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % 1_000_000


def split_train_eval(
    df: DataFrame,
    key_col: str = "doc_id",
    fractions: dict[str, float] | None = None,
    seed: str = "split-v1",
) -> DataFrame:
    """Input rows plus a ``split`` column assigning each to a named split.

    ``fractions`` maps split name -> fraction, in priority order (the first
    name owns buckets [0, f1*1e6), the second [f1*1e6, (f1+f2)*1e6), ...);
    they must sum to 1 within 1 ppm. Keying on a stable id (url, doc hash)
    rather than position makes membership immune to repartitioning and to
    corpus growth.
    """
    fr = dict(fractions or DEFAULT_FRACTIONS)
    if not fr:
        raise ValueError("fractions must be non-empty")
    total_ppm = sum(int(round(f * 1_000_000)) for f in fr.values())
    if abs(total_ppm - 1_000_000) > 1:
        raise ValueError(f"fractions must sum to 1 (got {total_ppm} ppm)")
    b = split_bucket(F.col(key_col), seed)
    expr = None
    acc = 0
    names = list(fr)
    for name in names[:-1]:
        acc += int(round(fr[name] * 1_000_000))
        expr = (
            F.when(b < acc, F.lit(name))
            if expr is None
            else expr.when(b < acc, F.lit(name))
        )
    last = F.lit(names[-1])
    return df.withColumn("split", last if expr is None else expr.otherwise(last))


def split_sql_case(key_expr: str, fractions: dict[str, float] | None = None,
                   seed: str = "split-v1") -> str:
    """The DuckDB/ANSI mirror of :func:`split_train_eval`'s assignment —
    generated from the same fractions so the two can never drift."""
    fr = dict(fractions or DEFAULT_FRACTIONS)
    bucket = (
        f"('0x' || substr(md5('{seed}:' || ({key_expr})::VARCHAR), 1, 8))::BIGINT"
        " % 1000000"
    )
    names = list(fr)
    if len(names) == 1:
        # zero WHEN clauses is invalid SQL ("CASE ELSE ... END"); a single
        # split is just its literal, same as split_train_eval's degenerate case
        return f"'{names[0]}'"
    acc = 0
    whens = []
    for name in names[:-1]:
        acc += int(round(fr[name] * 1_000_000))
        whens.append(f"WHEN {bucket} < {acc} THEN '{name}'")
    return "CASE " + " ".join(whens) + f" ELSE '{names[-1]}' END"
