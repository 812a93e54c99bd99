"""Unit gates for the HyperLogLog cardinality sketch and sequence packing.

The driver entries (`sketch_cardinality`, `pack_sequences`, `pack_chunks`)
pin cross-engine reproducibility against DuckDB; these tests pin the
*operator properties*: estimator accuracy on both branches, determinism,
and the packing layout invariants at multiple partition counts.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from neural_search_spark.operators.packing import chunk_manifest, pack_sequences
from neural_search_spark.operators.sketches import hll_cardinality


def _estimates(df, value_col, group_cols=None, **kw):
    rows = hll_cardinality(df, value_col, group_cols, **kw).collect()
    if not group_cols:
        return rows[0]["est_distinct"]
    return {tuple(r[g] for g in group_cols): r["est_distinct"] for r in rows}


def test_hll_raw_branch_accuracy_and_determinism(spark):
    # ~8000 distinct values (>> 2.5m for m=256): the raw HLL branch.
    df = spark.range(8000).select(F.concat(F.lit("v"), F.col("id")).alias("val"))
    est = _estimates(df, "val")
    assert abs(est - 8000) / 8000 < 0.20  # m=256 -> ~6.5% std error
    assert _estimates(df, "val") == est  # bit-deterministic


def test_hll_linear_counting_branch(spark):
    # 300 distincts (< 2.5m): linear counting, much tighter.
    df = spark.range(300).select(F.concat(F.lit("x"), F.col("id")).alias("val"))
    est = _estimates(df, "val")
    assert abs(est - 300) / 300 < 0.08


def test_hll_duplication_invariant(spark):
    # The sketch estimates DISTINCT values: replicating every row 7x is a no-op.
    base = spark.range(2000).select(F.concat(F.lit("d"), F.col("id")).alias("val"))
    dup = base.crossJoin(spark.range(7))
    assert _estimates(base, "val") == _estimates(dup.select("val"), "val")


def test_hll_groups_are_independent(spark):
    a = spark.range(500).select(
        F.lit("a").alias("grp"), F.concat(F.lit("a"), F.col("id")).alias("val")
    )
    b = spark.range(4000).select(
        F.lit("b").alias("grp"), F.concat(F.lit("b"), F.col("id")).alias("val")
    )
    merged = _estimates(a.unionByName(b), "val", ["grp"])
    assert merged[("a",)] == _estimates(a, "val", ["grp"])[("a",)]
    assert merged[("b",)] == _estimates(b, "val", ["grp"])[("b",)]


def test_hll_rejects_bad_precision(spark):
    df = spark.range(3).select(F.col("id").cast("string").alias("val"))
    with pytest.raises(ValueError):
        hll_cardinality(df, "val", p=2)


@pytest.fixture(scope="module")
def lens_df(spark):
    # Deterministic mixed lengths including zeros and a doc bigger than the
    # budget, in shuffled insertion order (packing must re-order by doc_id).
    rows = [(d, (d * 37) % 90 if d % 11 else 0) for d in range(200)]
    rows[13] = (13, 700)  # spans several 256-token chunks
    rows.reverse()
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def _reference_layout(rows, budget):
    out = {}
    pos = 0
    for d, n in sorted(rows):
        last = pos + n - 1 if n else pos
        out[d] = (n, pos, pos // budget, last // budget)
        pos += n
    return out


@pytest.mark.parametrize("num_partitions", [1, 5])
def test_pack_sequences_matches_reference(spark, lens_df, num_partitions):
    budget = 256
    got = {
        r["doc_id"]: (r["n_tokens"], r["tok_start"], r["chunk_start"], r["chunk_end"])
        for r in pack_sequences(lens_df, budget, num_partitions=num_partitions).collect()
    }
    rows = [(r["doc_id"], r["n_tokens"]) for r in lens_df.collect()]
    assert got == _reference_layout(rows, budget)


def test_chunk_manifest_conserves_tokens(spark, lens_df):
    budget = 256
    packed = pack_sequences(lens_df, budget, num_partitions=4)
    manifest = chunk_manifest(packed, budget).collect()
    total = sum(r["n_tokens"] for r in lens_df.collect())
    assert sum(r["n_tokens"] for r in manifest) == total
    by_chunk = {r["chunk_id"]: r["n_tokens"] for r in manifest}
    # every chunk except the last is exactly full
    last = max(by_chunk)
    assert all(v == budget for c, v in by_chunk.items() if c != last)
    assert 0 < by_chunk[last] <= budget
    # contiguous chunk ids from 0
    assert sorted(by_chunk) == list(range(last + 1))


def test_pack_sequences_rejects_bad_budget(spark, lens_df):
    with pytest.raises(ValueError):
        pack_sequences(lens_df, 0)


def test_hll_merge_of_slices_equals_whole(spark):
    """The distributable-sketch property: per-slice partial sketches merged
    register-wise give EXACTLY the whole-data sketch — estimates identical,
    including overlapping slices (union semantics, not addition)."""
    from neural_search_spark.operators.sketches import (
        hll_estimate,
        hll_merge,
        hll_partial,
    )

    df = spark.range(3000).select(
        (F.col("id") % 3).alias("day"), F.concat(F.lit("u"), (F.col("id") % 1100)).alias("val")
    )
    whole = _estimates(df, "val")
    per_day = hll_partial(df, "val", ["day"])
    merged = hll_estimate(hll_merge(per_day, []), []).collect()[0]["est_distinct"]
    assert merged == whole
    # per-day estimates still available from the same partials
    got = {r["day"]: r["est_distinct"] for r in hll_estimate(per_day, ["day"]).collect()}
    for d in (0, 1, 2):
        one = df.where(F.col("day") == d)
        assert got[d] == _estimates(one, "val")


def test_export_chunks_reconstructs_the_stream(spark):
    """Concatenating the exported chunks in order must reproduce EXACTLY the
    doc_id-ordered token stream — nothing lost, duplicated, or reordered at
    chunk boundaries (split docs included)."""
    from neural_search_spark.operators.packing import export_chunks

    rows = [(d, " ".join(f"d{d}t{i}" for i in range((d * 7) % 13 + (0 if d % 9 else 40))))
            for d in range(60)]
    rows[5] = (5, "")  # empty doc must not inject separators
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    toks = docs.select(
        "doc_id", F.split(F.col("text"), " ").alias("tokens")
    ).withColumn("tokens", F.filter("tokens", lambda x: x != ""))
    lens = toks.select("doc_id", F.size("tokens").alias("n_tokens"))
    budget = 16
    packed = pack_sequences(lens, budget, num_partitions=4)
    out = sorted(
        export_chunks(toks, packed, budget).collect(), key=lambda r: r["chunk_id"]
    )
    stream = " ".join(r["text"] for r in out).split()
    want = [t for _, text in sorted(rows) for t in text.split()]
    assert stream == want
    assert all(r["n_tokens"] == budget for r in out[:-1])
    assert 0 < out[-1]["n_tokens"] <= budget
    assert [r["chunk_id"] for r in out] == list(range(len(out)))


def test_cli_pack_export_roundtrip(spark, tmp_path, capsys):
    """`cli pack --export` writes materialized chunks whose totals match the
    manifest summary it prints."""
    import json

    from neural_search_spark.cli import main

    out = str(tmp_path / "packed")
    rc = main(["pack", "--input", "/root/testdata/sf0.001/documents.parquet",
               "--output", out, "--budget", "128", "--export"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    df = spark.read.parquet(out)
    assert summary["chunks"] == df.count()
    assert summary["tokens"] == sum(r["n_tokens"] for r in df.collect())
    assert df.where("n_tokens > 128").count() == 0
