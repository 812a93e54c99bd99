"""Fusion operators vs a transcription of the reference's dict-based logic
(normalize: hybrid.py:149-173; weighted: :175-220; RRF: :222-251)."""

from __future__ import annotations

from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from neural_search_spark.operators.fusion import hybrid_fuse, normalize_minmax, rrf_fuse


# --- reference-semantics mirrors (pure python) --------------------------------

def ref_normalize(scores):
    if not scores:
        return []
    vals = [s for _, s in scores]
    mn, mx = min(vals), max(vals)
    if mx == mn:
        return [(i, 1.0) for i, _ in scores]
    return [(i, (s - mn) / (mx - mn)) for i, s in scores]


def ref_weighted(dense, sparse, alpha):
    combined = defaultdict(float)
    for i, s in ref_normalize(dense):
        combined[i] += alpha * s
    for i, s in ref_normalize(sparse):
        combined[i] += (1 - alpha) * s
    return sorted(combined.items(), key=lambda x: (-x[1], x[0]))


def ref_rrf(rankings, k=60):
    scores = defaultdict(float)
    for ranking in rankings:
        for rank, doc in enumerate(ranking, start=1):
            scores[doc] += 1.0 / (k + rank)
    return sorted(scores.items(), key=lambda x: (-x[1], x[0]))


# --- tests --------------------------------------------------------------------

def test_normalize_basic(spark):
    df = spark.createDataFrame(
        [(0, 1, 2.0), (0, 2, 4.0), (0, 3, 3.0)], "query_id int, doc_id int, score double"
    )
    got = {r["doc_id"]: r["norm_score"] for r in normalize_minmax(df).collect()}
    want = dict(ref_normalize([(1, 2.0), (2, 4.0), (3, 3.0)]))
    for d, v in want.items():
        assert got[d] == pytest.approx(v)


def test_normalize_all_equal_gives_one(spark):
    df = spark.createDataFrame(
        [(0, 1, 5.0), (0, 2, 5.0)], "query_id int, doc_id int, score double"
    )
    got = [r["norm_score"] for r in normalize_minmax(df).collect()]
    assert got == [1.0, 1.0]


def test_normalize_single_row(spark):
    df = spark.createDataFrame([(0, 1, 7.0)], "query_id int, doc_id int, score double")
    assert normalize_minmax(df).collect()[0]["norm_score"] == 1.0


def test_normalize_per_query_isolation(spark):
    df = spark.createDataFrame(
        [(0, 1, 0.0), (0, 2, 10.0), (1, 1, 100.0), (1, 2, 200.0)],
        "query_id int, doc_id int, score double",
    )
    got = {(r["query_id"], r["doc_id"]): r["norm_score"] for r in normalize_minmax(df).collect()}
    assert got[(0, 1)] == 0.0 and got[(0, 2)] == 1.0
    assert got[(1, 1)] == 0.0 and got[(1, 2)] == 1.0


@pytest.mark.parametrize("alpha", [0.1, 0.5, 0.9])
def test_weighted_fusion_matches_reference(spark, alpha):
    dense = [(101, 0.9), (102, 0.7), (103, 0.5)]
    sparse = [(102, 8.0), (104, 6.0), (101, 2.0)]
    ddf = spark.createDataFrame(
        [(0, d, s) for d, s in dense], "query_id int, doc_id int, score double"
    )
    sdf = spark.createDataFrame(
        [(0, d, s) for d, s in sparse], "query_id int, doc_id int, score double"
    )
    got = [
        (r["doc_id"], r["score"])
        for r in hybrid_fuse(ddf, sdf, alpha=alpha).orderBy("rank").collect()
    ]
    want = ref_weighted(dense, sparse, alpha)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-12)


def test_weighted_fusion_disjoint_sides(spark):
    ddf = spark.createDataFrame([(0, 1, 0.8)], "query_id int, doc_id int, score double")
    sdf = spark.createDataFrame([(0, 2, 3.0)], "query_id int, doc_id int, score double")
    got = {r["doc_id"]: r["score"] for r in hybrid_fuse(ddf, sdf, alpha=0.5).collect()}
    # single-element lists normalize to 1.0; missing side contributes 0
    assert got[1] == pytest.approx(0.5)
    assert got[2] == pytest.approx(0.5)


def test_rrf_matches_reference(spark):
    r1 = [101, 102, 103]
    r2 = [103, 101, 104]
    rows = [(0, 0, d, i + 1) for i, d in enumerate(r1)] + [
        (0, 1, d, i + 1) for i, d in enumerate(r2)
    ]
    df = spark.createDataFrame(rows, "query_id int, ranking_id int, doc_id int, rank int")
    got = [(r["doc_id"], r["score"]) for r in rrf_fuse(df).orderBy("rank").collect()]
    want = ref_rrf([r1, r2])
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, rel=1e-12)


def test_rrf_derives_rank_from_scores(spark):
    rows = [(0, 0, 101, 0.9), (0, 0, 102, 0.5), (0, 1, 102, 7.0), (0, 1, 101, 3.0)]
    df = spark.createDataFrame(rows, "query_id int, ranking_id int, doc_id int, score double")
    got = {r["doc_id"]: r["score"] for r in rrf_fuse(df).collect()}
    want = dict(ref_rrf([[101, 102], [102, 101]]))
    for d, v in want.items():
        assert got[d] == pytest.approx(v, rel=1e-12)


def test_rrf_topk_cut(spark):
    rows = [(0, 0, d, d) for d in range(1, 8)]
    df = spark.createDataFrame(rows, "query_id int, ranking_id int, doc_id int, rank int")
    assert rrf_fuse(df, top_k=3).count() == 3


def test_ir_metrics_hand_computed(spark):
    """MRR / Recall@k / NDCG@k against hand-computed values."""
    import math

    import pytest

    from neural_search_spark.operators.metrics import evaluate

    results = spark.createDataFrame(
        [(0, 1, 10), (0, 2, 11), (0, 3, 12), (1, 1, 20), (1, 2, 21)],
        "query_id int, rank int, doc_id int",
    )
    judgments = spark.createDataFrame(
        # q0: relevant {11 (rel 2), 12 (rel 1), 13 (rel 3, not retrieved)}
        # q1: relevant {21 (rel 1)}
        [(0, 11, 2.0), (0, 12, 1.0), (0, 13, 3.0), (1, 21, 1.0)],
        "query_id int, doc_id int, relevance double",
    )
    got = {r["query_id"]: r for r in evaluate(results, judgments, k=3).collect()}

    assert got[0]["mrr"] == pytest.approx(1 / 2)  # first relevant at rank 2
    assert got[1]["mrr"] == pytest.approx(1 / 2)
    assert got[0]["recall"] == pytest.approx(2 / 3)
    assert got[1]["recall"] == pytest.approx(1.0)
    dcg0 = 2.0 / math.log2(3) + 1.0 / math.log2(4)
    idcg0 = 3.0 / math.log2(2) + 2.0 / math.log2(3) + 1.0 / math.log2(4)
    assert got[0]["ndcg"] == pytest.approx(dcg0 / idcg0)
