"""Fuzzy match (query/fuzzy.py), train/val/test splits (operators/splits.py),
and the cardinality facet (operators/facets.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neural_search_spark.index.stats import build_logical_index
from neural_search_spark.operators.splits import split_train_eval
from neural_search_spark.query.bm25_dataframe import bm25_topk
from neural_search_spark.query.fuzzy import fuzzy_expansions, fuzzy_topk, query_terms


@pytest.fixture(scope="module")
def tiny_idx(spark):
    rows = [
        (i, f"url{i}", " ".join(words))
        for i, words in enumerate(
            [
                ["spark", "window", "merge", "join"],
                ["spark", "spark", "table", "row"],
                ["window", "join", "join", "scan"],
                ["merge", "scan", "table", "row", "row"],
                ["table", "row", "scan", "batch"],
            ]
        )
    ]
    docs = spark.createDataFrame(rows, "doc_id long, url string, text string")
    return build_logical_index(docs, id_col="doc_id", persist=True)


def test_exact_terms_match_bm25(spark, tiny_idx):
    """Query terms with no <=1-distance vocabulary neighbor: fuzzy == exact
    BM25 (every expansion is the term itself at boost 1)."""
    q = spark.createDataFrame(
        [(0, "window batch", 5)], "query_id int, query_text string, top_k int"
    )
    exact = bm25_topk(
        tiny_idx.doc_terms, tiny_idx.terms, q, stats=tiny_idx.stats,
        positive_only=False,
    ).collect()
    fuzzy = fuzzy_topk(
        tiny_idx.doc_terms, tiny_idx.terms, q, stats=tiny_idx.stats,
        positive_only=False,
    ).collect()
    assert [(r["rank"], r["doc_id"]) for r in exact] == [
        (r["rank"], r["doc_id"]) for r in fuzzy
    ]
    for a, b in zip(exact, fuzzy):
        assert a["score"] == pytest.approx(b["score"], abs=1e-12)


def test_single_typo_scales_by_boost(spark, tiny_idx):
    """'sparc' expands only to 'spark' (distance 1): fuzzy scores equal
    boost * exact-BM25 scores of the corrected query, same doc order."""
    qt = spark.createDataFrame(
        [(0, "sparc", 5)], "query_id int, query_text string, top_k int"
    )
    qe = spark.createDataFrame(
        [(0, "spark", 5)], "query_id int, query_text string, top_k int"
    )
    boost = 1.0 - 1.0 / 5.0  # min(len('sparc'), len('spark')) = 5
    fuzzy = fuzzy_topk(
        tiny_idx.doc_terms, tiny_idx.terms, qt, stats=tiny_idx.stats,
        positive_only=False,
    ).collect()
    exact = bm25_topk(
        tiny_idx.doc_terms, tiny_idx.terms, qe, stats=tiny_idx.stats,
        positive_only=False,
    ).collect()
    assert [r["doc_id"] for r in fuzzy] == [r["doc_id"] for r in exact]
    for a, b in zip(fuzzy, exact):
        assert a["score"] == pytest.approx(boost * b["score"], rel=1e-12)


def test_expansion_set_complete_and_verified(spark, tiny_idx):
    """'joim' finds 'join' via the deletion neighborhood; a transposition
    ('jion', distance 2) is correctly NOT expanded at max_dist=1."""
    q = spark.createDataFrame(
        [(0, "joim", 5), (1, "jion", 5)], "query_id int, query_text string, top_k int"
    )
    exp = fuzzy_expansions(tiny_idx.terms, query_terms(q)).collect()
    got = {(r["query_id"], r["term"]) for r in exp}
    assert (0, "join") in got
    assert all(qid != 1 for qid, _ in got)


def test_no_expansion_query_vanishes(spark, tiny_idx):
    q = spark.createDataFrame(
        [(0, "zzzzzz", 5)], "query_id int, query_text string, top_k int"
    )
    assert (
        fuzzy_topk(
            tiny_idx.doc_terms, tiny_idx.terms, q, stats=tiny_idx.stats,
            positive_only=False,
        ).count()
        == 0
    )


def test_max_dist_over_one_rejected(spark, tiny_idx):
    q = spark.createDataFrame(
        [(0, "spark", 5)], "query_id int, query_text string, top_k int"
    )
    with pytest.raises(ValueError, match="max_dist"):
        fuzzy_topk(
            tiny_idx.doc_terms, tiny_idx.terms, q, stats=tiny_idx.stats, max_dist=2
        ).collect()


# --- splits -------------------------------------------------------------------


@pytest.fixture(scope="module")
def keyed(spark):
    return spark.range(0, 2000).withColumnRenamed("id", "doc_id")


def test_split_deterministic_and_complete(keyed):
    a = {r["doc_id"]: r["split"] for r in split_train_eval(keyed).collect()}
    b = {r["doc_id"]: r["split"] for r in split_train_eval(keyed).collect()}
    assert a == b and len(a) == 2000
    assert set(a.values()) == {"train", "val", "test"}


def test_split_proportions_near_fractions(keyed):
    counts = {
        r["split"]: r["n"]
        for r in split_train_eval(keyed)
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert abs(counts["train"] / 2000 - 0.9) < 0.03
    assert abs(counts["val"] / 2000 - 0.05) < 0.02
    assert abs(counts["test"] / 2000 - 0.05) < 0.02


def test_split_stable_under_growth(spark, keyed):
    """A doc's split is a pure function of its key: the assignment computed
    on a half-corpus equals the assignment on the full corpus."""
    half = keyed.where(F.col("doc_id") < 1000)
    full = {r["doc_id"]: r["split"] for r in split_train_eval(keyed).collect()}
    sub = {r["doc_id"]: r["split"] for r in split_train_eval(half).collect()}
    assert all(full[k] == v for k, v in sub.items())


def test_split_bad_fractions_rejected(keyed):
    with pytest.raises(ValueError, match="sum to 1"):
        split_train_eval(keyed, fractions={"train": 0.5, "val": 0.1})


# --- cardinality facet ----------------------------------------------------------


def test_cardinality_facet_near_exact(spark):
    """HLL estimate per query result set within the p=8 error envelope of the
    exact distinct count (~6.5% standard error; allow 4 sigma)."""
    from neural_search_spark.operators.facets import cardinality_facet

    docs = spark.range(0, 600).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("v"), F.col("id") % 300).alias("val")
    )
    results = spark.range(0, 600).select(
        (F.col("id") % 2).cast("int").alias("query_id"), F.col("id").alias("doc_id")
    )
    got = {
        r["query_id"]: r["est_distinct"]
        for r in cardinality_facet(results, docs, "val").collect()
    }
    # query 0 hits the even doc_ids -> even residues mod 300 (150 distinct
    # vals); query 1 the odd residues (150)
    for qid in (0, 1):
        assert abs(got[qid] - 150) / 150 < 0.26


def test_split_sql_case_single_fraction_is_valid_sql():
    import duckdb

    from neural_search_spark.operators.splits import split_sql_case

    expr = split_sql_case("x", {"all": 1.0})
    [(v,)] = duckdb.sql(f"SELECT {expr} FROM (SELECT 1 AS x)").fetchall()
    assert v == "all"
