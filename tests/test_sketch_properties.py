"""Differential property tests for the sketch arithmetic: random streams,
Spark vs the generated DuckDB mirror, compared bit-for-bit — the entry gate
checks one fixed corpus; these check the cross-engine contract holds across
the input space (collision patterns, weights, frames, group splits)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from neural_search_spark.operators.cms import cms_sql, cms_topk
from neural_search_spark.operators.histogram import hist_quantile_sketch, hist_sql
from neural_search_spark.operators.sketches import hll_cardinality, hll_sql

_VOCAB = [f"t{i:02d}" for i in range(24)]

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    vals=st.lists(st.sampled_from(_VOCAB), min_size=1, max_size=200),
    w=st.sampled_from([4, 16, 64]),
)
@settings(**_SETTINGS)
def test_cms_spark_matches_duckdb(spark, vals, w):
    sdf = spark.createDataFrame([(v,) for v in vals], "term string")
    got = sorted(
        (r["rank"], r["val"], r["est_count"])
        for r in cms_topk(
            sdf, "term", sdf.select("term").distinct(), k=50, d=3, w=w
        ).collect()
    )
    con = duckdb.connect()
    con.register("stream_pdf", pd.DataFrame({"term": vals}))
    con.execute("CREATE VIEW toks AS SELECT term FROM stream_pdf")
    sql = "WITH " + cms_sql("term", "1", "toks", "term", d=3, w=w, k=50).strip()
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == want


@given(
    vals=st.lists(
        st.floats(min_value=-1e4, max_value=1e4, allow_nan=False, width=32),
        min_size=1,
        max_size=200,
    ),
    nbins=st.sampled_from([8, 32, 128]),
)
@settings(**_SETTINGS)
def test_hist_quantiles_spark_matches_duckdb(spark, vals, nbins):
    qs = [0.5, 0.9, 0.99]
    sdf = spark.createDataFrame([(float(v),) for v in vals], "x double")
    got = sorted((r["q"], r["est"]) for r in
                 hist_quantile_sketch(sdf, "x", qs, nbins=nbins).collect())
    con = duckdb.connect()
    con.register("vals_pdf", pd.DataFrame({"x": [float(v) for v in vals]}))
    con.execute("CREATE VIEW vtab AS SELECT x FROM vals_pdf")
    sql = "WITH " + hist_sql("x", "vtab", qs, nbins=nbins).strip()
    want = sorted(tuple(r) for r in con.execute(sql).fetchall())
    assert got == pytest.approx(want)  # round(4) on both; approx guards -0.0


@given(
    vals=st.lists(
        st.integers(min_value=0, max_value=5000), min_size=1, max_size=300
    ),
    p=st.sampled_from([4, 6, 8]),
)
@settings(**_SETTINGS)
def test_hll_spark_matches_duckdb(spark, vals, p):
    sdf = spark.createDataFrame([(str(v),) for v in vals], "val string")
    [got] = hll_cardinality(sdf, "val", p=p).collect()
    con = duckdb.connect()
    con.register("vals_pdf", pd.DataFrame({"val": [str(v) for v in vals]}))
    sql = "WITH " + hll_sql("val", "vals_pdf", p=p).strip()
    [(want,)] = con.execute(sql).fetchall()
    assert got["est_distinct"] == pytest.approx(want)
