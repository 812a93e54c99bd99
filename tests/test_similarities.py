"""LM Dirichlet similarity gates (query/similarities.py).

The driver entry pins cross-engine arithmetic vs DuckDB; these pin the
*model semantics* against an independent pure-Python computation and the
properties that make Dirichlet smoothing useful (tf monotonicity, length
normalization, unknown-term invariance)."""

from __future__ import annotations

import math

import pytest

from neural_search_spark.index.stats import build_logical_index
from neural_search_spark.query.similarities import lm_dirichlet_topk

MU = 2000.0

DOCS = [
    (0, "spark join hash join join"),
    (1, "spark join hash"),
    (2, "spark " + "filler " * 40 + "join"),
    (3, "vector scan window batch group"),
]


@pytest.fixture(scope="module")
def ranked(spark):
    corpus = spark.createDataFrame(DOCS, "doc_id long, text string")
    idx = build_logical_index(corpus, persist=True)
    q = spark.createDataFrame(
        [(0, "join spark", 10), (1, "join spark nosuchterm", 10)],
        "query_id int, query_text string, top_k int",
    )
    rows = lm_dirichlet_topk(idx.doc_terms, q, mu=MU, round_to=6).collect()
    return {
        qid: {r["doc_id"]: (r["rank"], r["score"]) for r in rows if r["query_id"] == qid}
        for qid in (0, 1)
    }


def _oracle_scores(query_terms):
    toks = {d: t.split() for d, t in DOCS}
    total = sum(len(t) for t in toks.values())
    cf = {}
    for t in toks.values():
        for w in t:
            cf[w] = cf.get(w, 0) + 1
    known = [t for t in query_terms if t in cf]
    out = {}
    for d, t in toks.items():
        matched = [w for w in known if w in t]
        if not matched:
            continue
        s = sum(math.log(1.0 + t.count(w) * total / (MU * cf[w])) for w in known if w in t)
        s += len(known) * math.log(MU / (len(t) + MU))
        out[d] = round(s, 6)
    return out


def test_matches_independent_python_model(ranked):
    expect = _oracle_scores(["join", "spark"])
    got = {d: s for d, (_, s) in ranked[0].items()}
    assert got == pytest.approx(expect, abs=1e-6)


def test_tf_monotonicity_and_length_norm(ranked):
    by_doc = ranked[0]
    # doc 0 (3x join) outranks doc 1 (1x join) at comparable length
    assert by_doc[0][0] < by_doc[1][0]
    # doc 2 matches both terms but is 8x longer: the Dirichlet norm places it
    # below the short full-match docs
    assert by_doc[2][0] > by_doc[1][0]
    # doc 3 shares no query term -> unranked (match-mode contract)
    assert 3 not in by_doc


def test_unknown_terms_are_noops(ranked):
    assert ranked[0] == ranked[1]
