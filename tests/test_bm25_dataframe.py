"""Rank-identity of the M1 DataFrame BM25 path vs the pure-Python oracle.

Runs the full reference query set (FIXTURES.md §2) over the 200-doc synthetic
corpus; asserts identical tie-class rankings and scores to rel=1e-9.
"""

from __future__ import annotations

import pytest

from neural_search_spark.corpus import REFERENCE_QUERIES, queries_df
from neural_search_spark.index.docmap import assign_doc_ids
from neural_search_spark.index.stats import build_logical_index
from neural_search_spark.oracle.bm25_oracle import (
    as_tie_classes,
    build_oracle_index,
    oracle_topk,
)


@pytest.fixture(scope="module")
def indexed(spark, corpus_small, corpus_pdf_small):
    with_ids = assign_doc_ids(corpus_small, order_col="url")
    idx = build_logical_index(with_ids)
    idx.doc_terms.persist().count()
    idx.terms.persist().count()

    ordered = corpus_pdf_small.sort_values("url").reset_index(drop=True)
    oracle = build_oracle_index(list(ordered["text"]), doc_ids=list(range(len(ordered))))
    return idx, oracle


def assert_rank_identical(spark_rows, oracle_res, qid):
    got = [(r["doc_id"], r["score"]) for r in spark_rows]
    assert len(got) == len(oracle_res), f"q{qid}: row count {len(got)} != {len(oracle_res)}"
    # equal-score equivalence classes must match in order and content
    assert as_tie_classes(got) == as_tie_classes(oracle_res), f"q{qid}: tie classes differ"
    for (gid, gs), (oid, os_) in zip(
        sorted(got, key=lambda x: (-x[1], x[0])), sorted(oracle_res, key=lambda x: (-x[1], x[0]))
    ):
        assert gs == pytest.approx(os_, rel=1e-9), f"q{qid}: score mismatch {gs} vs {os_}"


def test_stats_match_oracle(indexed):
    idx, oracle = indexed
    assert idx.stats.n_docs == oracle.corpus_size
    assert idx.stats.avgdl == pytest.approx(oracle.avgdl, rel=1e-12)
    assert idx.stats.average_idf == pytest.approx(oracle.average_idf, rel=1e-12)


def test_idf_match_oracle(indexed):
    idx, oracle = indexed
    got = {r["term"]: r["idf"] for r in idx.terms.collect()}
    assert set(got) == set(oracle.idf)
    for t, v in oracle.idf.items():
        assert got[t] == pytest.approx(v, rel=1e-12), t


def test_rank_identity_reference_query_set(spark, indexed):
    from neural_search_spark.query.bm25_dataframe import bm25_topk

    idx, oracle = indexed
    res = bm25_topk(idx.doc_terms, idx.terms, queries_df(spark), stats=idx.stats)
    rows = res.collect()
    by_q = {}
    for r in sorted(rows, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append(r)

    for qid, qtext, k in REFERENCE_QUERIES:
        want = oracle_topk(oracle, qtext, top_k=k)
        got = by_q.get(qid, [])
        assert_rank_identical(got, want, qid)


def test_single_query_wrapper(spark, indexed):
    from neural_search_spark.query.bm25_dataframe import bm25_topk_single

    idx, oracle = indexed
    got = bm25_topk_single(idx.doc_terms, idx.terms, "w0001 w0002", top_k=5, stats=idx.stats)
    rows = got.collect()
    want = oracle_topk(oracle, "w0001 w0002", top_k=5)
    assert_rank_identical(sorted(rows, key=lambda r: r["rank"]), want, "single")


def test_explain_contribs_sum_to_score(spark, indexed):
    """Explain invariant: per-hit sum(contrib) reproduces the bm25_topk score
    (to rounding), and (query_id, doc_id, rank) triples match the search
    result rows they explain."""
    from collections import defaultdict

    from neural_search_spark.query.bm25_dataframe import bm25_topk
    from neural_search_spark.query.explain import bm25_explain

    idx, _oracle = indexed
    k = 3
    # uniform top_k >= explain_k so the bm25_topk cut covers every explained hit
    # (explain_k is independent of the query's requested k, like ES _explain)
    qdf = spark.createDataFrame(
        [(qid, text, k) for qid, text, _k in REFERENCE_QUERIES],
        "query_id int, query_text string, top_k int",
    )
    exp_rows = bm25_explain(idx, qdf, explain_k=k, score_rounding=9).collect()
    assert exp_rows, "explain returned no rows"

    sums: dict[tuple, float] = defaultdict(float)
    ranks: dict[tuple, int] = {}
    for r in exp_rows:
        key = (r["query_id"], r["doc_id"])
        sums[key] += r["contrib"]
        ranks[key] = r["rank"]

    topk = bm25_topk(idx.doc_terms, idx.terms, qdf, stats=idx.stats).collect()
    want = {
        (r["query_id"], r["doc_id"]): (r["rank"], r["score"])
        for r in topk
        if r["rank"] <= k
    }
    assert set(ranks) == set(want)
    for key, (wrank, wscore) in want.items():
        assert ranks[key] == wrank, key
        # contribs are rounded to 4dp each; sums match to that granularity
        assert sums[key] == pytest.approx(wscore, abs=5e-4), key
