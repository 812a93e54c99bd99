"""Orchestration parity: initial_k policy, hybrid flow, dense-survivor filter,
metadata filters, stats (search_engine.py:232-350, 116-131)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neural_search_spark.index.docmap import assign_doc_ids
from neural_search_spark.index.stats import build_logical_index
from neural_search_spark.plans.engine import SearchEngine, initial_k_policy


def test_initial_k_policy_matches_reference():
    # search_engine.py:271-276
    assert initial_k_policy(10, hybrid=False, rerank=False) == 10
    assert initial_k_policy(10, hybrid=False, rerank=True) == 50  # min(50, 50)
    assert initial_k_policy(3, hybrid=False, rerank=True) == 15  # min(50, 15)
    assert initial_k_policy(10, hybrid=True, rerank=False) == 20  # max(10, 20)
    assert initial_k_policy(30, hybrid=True, rerank=True) == 60  # max(min(50,150), 60)
    assert initial_k_policy(30, hybrid=False, rerank=True) == 50


@pytest.fixture(scope="module")
def engine(spark, corpus_small):
    with_ids = assign_doc_ids(corpus_small)
    idx = build_logical_index(with_ids)
    idx.doc_terms.persist().count()
    idx.terms.persist().count()
    meta = with_ids.select("doc_id", "lang", "warc_ts")
    meta.persist().count()
    return SearchEngine(doc_terms=idx.doc_terms, terms=idx.terms, stats=idx.stats, metadata=meta)


def _q(spark, text):
    return spark.createDataFrame([(0, text)], "query_id int, query_text string")


def test_sparse_search(spark, engine):
    rows = engine.search(_q(spark, "w0001 w0002"), top_k=5).collect()
    assert 0 < len(rows) <= 5
    assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == list(
        range(1, len(rows) + 1)
    )
    scores = [r["score"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert scores == sorted(scores, reverse=True)


def test_hybrid_only_dense_docs_survive(spark, engine):
    # dense set has two docs; fused output must never contain other docs
    dense = spark.createDataFrame(
        [(0, 3, 0.9), (0, 5, 0.7)], "query_id int, doc_id long, score double"
    )
    rows = engine.search(
        _q(spark, "w0001 w0002"), top_k=10, hybrid=True, alpha=0.5, dense_results=dense
    ).collect()
    ids = {r["doc_id"] for r in rows}
    assert ids <= {3, 5}
    assert len(rows) >= 1


def test_hybrid_alpha_sensitivity(spark, engine):
    dense = spark.createDataFrame(
        [(0, 3, 0.99), (0, 5, 0.01)], "query_id int, doc_id long, score double"
    )
    q = _q(spark, "w0001 w0002")
    hi = engine.search(q, top_k=2, hybrid=True, alpha=0.95, dense_results=dense).collect()
    top_hi = min(hi, key=lambda r: r["rank"])
    assert top_hi["doc_id"] == 3  # alpha~1 => dense order dominates


def test_metadata_filter_restricts_results(spark, engine):
    q = _q(spark, "w0000 w0001")
    # top_k=200 >= corpus size so the unfiltered list is the full candidate set
    unfiltered = engine.search(q, top_k=200).collect()
    filtered = engine.search(q, top_k=200, filters={"lang": {"$eq": "de"}}).collect()
    assert {r["doc_id"] for r in filtered} < {r["doc_id"] for r in unfiltered}
    # every surviving doc is actually lang=de
    de_ids = {
        r["doc_id"] for r in engine.metadata.where(F.col("lang") == "de").collect()
    }
    assert {r["doc_id"] for r in filtered} <= de_ids
    assert len(filtered) > 0


def test_filters_without_metadata_raise(spark, engine):
    bare = SearchEngine(
        doc_terms=engine.doc_terms, terms=engine.terms, stats=engine.stats, metadata=None
    )
    with pytest.raises(ValueError, match="metadata"):
        bare.search(_q(spark, "w0001"), filters={"lang": "en"}).collect()


def test_get_stats(engine):
    s = engine.get_stats()
    assert s["num_documents"] == 200
    assert s["has_index"] is True
    assert s["k1"] == 1.5 and s["b"] == 0.75 and s["alpha"] == 0.5


def test_rerank_hook_out_of_scope(spark, engine):
    with pytest.raises(NotImplementedError):
        engine.rerank_hook(None, None)
