"""Token-budget curation (operators/curation.py): contract = running-total
filter over the (quantized quality desc, doc_id asc) order; implementation
is the 2-pass histogram split. Every case is checked against a brute-force
prefix computation."""

from __future__ import annotations

import pytest

from neural_search_spark.operators.curation import select_token_budget


def _brute(rows, budget, precision=3):
    """rows = [(doc_id, quality, tokens)] -> selected doc_ids per contract."""
    ordered = sorted(
        ((d, round(q, precision), t) for d, q, t in rows),
        key=lambda x: (-x[1], x[0]),
    )
    out, cum = [], 0
    for d, q, t in ordered:
        cum += t
        if cum <= budget:
            out.append(d)
    return set(out)


def _run(spark, rows, budget, precision=3):
    df = spark.createDataFrame(rows, "doc_id long, quality double, n_tokens long")
    got = select_token_budget(df, budget, precision=precision).collect()
    return {r["doc_id"] for r in got}, got


CASES = [
    # mid-bucket crossing: budget lands inside the 0.5 bucket
    ([(0, 0.9, 10), (1, 0.5, 10), (2, 0.5, 10), (3, 0.5, 10), (4, 0.1, 10)], 35),
    # exact boundary: budget == cumulative at a bucket edge
    ([(0, 0.9, 10), (1, 0.5, 20), (2, 0.1, 5)], 30),
    # everything fits
    ([(0, 0.9, 10), (1, 0.5, 10)], 1000),
    # nothing fits (first doc alone exceeds)
    ([(0, 0.9, 100), (1, 0.5, 10)], 50),
    # zero-token docs never reopen a crossed budget
    ([(0, 0.9, 40), (1, 0.5, 40), (2, 0.4, 0), (3, 0.3, 5)], 60),
    # quantization merges 0.5004 and 0.5001 into one bucket; doc_id breaks it
    ([(0, 0.5004, 30), (1, 0.5001, 30), (2, 0.2, 10)], 40, 3),
]


@pytest.mark.parametrize("case", CASES)
def test_budget_selection_matches_bruteforce(spark, case):
    rows, budget = case[0], case[1]
    precision = case[2] if len(case) > 2 else 3
    got, _ = _run(spark, rows, budget, precision)
    assert got == _brute(rows, budget, precision), case


def test_budget_reports_quantized_quality_and_tokens(spark):
    rows = [(0, 0.87654, 10), (1, 0.1, 5)]
    _, got = _run(spark, rows, 100)
    by_id = {r["doc_id"]: r for r in got}
    assert by_id[0]["quality"] == pytest.approx(0.877)
    assert by_id[0]["n_tokens"] == 10


def test_budget_zero_selects_nothing(spark):
    got, _ = _run(spark, [(0, 0.9, 1)], 0)
    assert got == set()


def test_budget_no_global_sort_in_plan(spark):
    """Full buckets are a filter; the only window is over the threshold
    bucket (partitioned — never a partition-less global window)."""
    rows = [(i, (i % 7) / 10.0, 10) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, quality double, n_tokens long")
    plan = (
        select_token_budget(df, 500)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # a partition-less running-total window would show as
    # 'Window [...], [quality DESC ...]' with no partition spec — assert the
    # window we do run is partitioned by the bucket column
    assert "windowspecdefinition(_q" in plan or "Window [" not in plan
