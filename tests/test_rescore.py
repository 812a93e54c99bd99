"""Result-shaping ops (query/rescore.py) + percolation (query/percolate.py).

Small hand-built corpus with known term placement so every expectation is
derivable by hand; determinism and oracle reconciliation are exercised by
the driver entries.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from neural_search_spark.index.stats import build_logical_index
from neural_search_spark.query.bm25_dataframe import bm25_topk
from neural_search_spark.query.percolate import percolate, registered_queries_df
from neural_search_spark.query.rescore import (
    boosting_topk,
    collapse_topk,
    function_score_topk,
    rescore_topk,
)


@pytest.fixture(scope="module")
def shaped(spark):
    # sites: a={0,1,2}, b={3,4}, c={5}; zebra concentrated on site a
    rows = [
        (0, "a", "zebra zebra quark data", 40),
        (1, "a", "zebra quark data data", 80),
        (2, "a", "zebra data", 20),
        (3, "b", "zebra quark", 60),
        (4, "b", "data quark", 30),
        (5, "c", "zebra plain words here", 10),
        (6, "c", "filler filler filler", 5),
        (7, "d", "data data data", 15),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, site string, text string, n_chars long"
    )
    return docs, build_logical_index(docs, persist=True)


def _q(spark, text, k=10):
    return spark.createDataFrame(
        [(0, text, k)], "query_id int, query_text string, top_k int"
    )


def test_collapse_one_per_key(spark, shaped):
    docs, idx = shaped
    q = _q(spark, "zebra quark")
    flat = bm25_topk(
        idx.doc_terms, idx.terms, q, stats=idx.stats, positive_only=False
    ).collect()
    got = collapse_topk(
        idx, q, docs, "site", per_key=1, positive_only=False
    ).orderBy("rank").collect()
    # one doc per site, sites ordered by their best member's score
    assert len({r["site"] for r in got}) == len(got)
    best_by_site: dict = {}
    site_of = {r["doc_id"]: s for r in flat for s in
               [docs.where(F.col("doc_id") == r["doc_id"]).first()["site"]]}
    flat_scores = {r["doc_id"]: r["score"] for r in flat}
    for r in sorted(flat, key=lambda x: x["rank"]):
        best_by_site.setdefault(site_of[r["doc_id"]], r["doc_id"])
    assert [r["doc_id"] for r in got] == sorted(
        best_by_site.values(),
        key=lambda d: (-flat_scores[d], d),
    )
    for r in got:
        assert r["score"] == pytest.approx(flat_scores[r["doc_id"]], abs=1e-9)


def test_collapse_per_key_two_tiles_toward_flat(spark, shaped):
    docs, idx = shaped
    q = _q(spark, "zebra quark data")
    flat = bm25_topk(
        idx.doc_terms, idx.terms, q, stats=idx.stats, positive_only=False
    ).collect()
    wide = collapse_topk(
        idx, q, docs, "site", per_key=10, positive_only=False
    ).orderBy("rank").collect()
    # with per_key >= docs-per-site, collapse degenerates to the flat ranking
    assert [r["doc_id"] for r in wide] == [
        r["doc_id"] for r in sorted(flat, key=lambda x: x["rank"])
    ]
    two = collapse_topk(idx, q, docs, "site", per_key=2, positive_only=False).collect()
    per_site: dict = {}
    for r in two:
        per_site[r["site"]] = per_site.get(r["site"], 0) + 1
    assert max(per_site.values()) <= 2


def test_function_score_log1p_multiply(spark, shaped):
    docs, idx = shaped
    q = _q(spark, "zebra")
    flat = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(
            idx.doc_terms, idx.terms, q, stats=idx.stats, positive_only=False
        ).collect()
    }
    n_chars = {r["doc_id"]: r["n_chars"] for r in docs.collect()}
    got = function_score_topk(
        idx, q, docs, "n_chars", positive_only=False
    ).orderBy("rank").collect()
    expect = {
        d: s * round(math.log(1.0 + n_chars[d]), 6) for d, s in flat.items()
    }
    assert {r["doc_id"] for r in got} == set(expect)
    for r in got:
        assert r["score"] == pytest.approx(expect[r["doc_id"]], abs=1e-9)
    ranked = sorted(expect.items(), key=lambda x: (-x[1], x[0]))
    assert [r["doc_id"] for r in got] == [d for d, _ in ranked]


def test_function_score_sum_mode(spark, shaped):
    docs, idx = shaped
    q = _q(spark, "zebra")
    got = function_score_topk(
        idx, q, docs, "n_chars", boost_mode="sum", positive_only=False
    ).collect()
    flat = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(
            idx.doc_terms, idx.terms, q, stats=idx.stats, positive_only=False
        ).collect()
    }
    n_chars = {r["doc_id"]: r["n_chars"] for r in docs.collect()}
    for r in got:
        assert r["score"] == pytest.approx(
            flat[r["doc_id"]] + round(math.log(1.0 + n_chars[r["doc_id"]]), 6),
            abs=1e-9,
        )
    with pytest.raises(ValueError):
        function_score_topk(idx, q, docs, "n_chars", boost_mode="max")


def test_boosting_demotes_not_excludes(spark, shaped):
    docs, idx = shaped
    pos = _q(spark, "zebra")
    neg = spark.createDataFrame([(0, "quark")], "query_id int, query_text string")
    flat = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(
            idx.doc_terms, idx.terms, pos, stats=idx.stats, positive_only=False
        ).collect()
    }
    got = boosting_topk(idx, pos, neg, negative_boost=0.5, positive_only=False).collect()
    # same doc set as the positive query — nothing excluded
    assert {r["doc_id"] for r in got} == set(flat)
    quark_docs = {0, 1, 3, 4}
    for r in got:
        factor = 0.5 if r["doc_id"] in quark_docs else 1.0
        assert r["score"] == pytest.approx(flat[r["doc_id"]] * factor, abs=1e-9)


def test_rescore_phrase_window(spark, shaped):
    docs, idx = shaped
    q = _q(spark, "zebra data", k=8)
    phrases = spark.createDataFrame([(0, "zebra quark")], "query_id int, phrase string")
    flat = {
        r["doc_id"]: r["score"]
        for r in bm25_topk(
            idx.doc_terms, idx.terms, q, stats=idx.stats, positive_only=False
        ).collect()
    }
    got = rescore_topk(
        idx, q, docs, phrases, window_size=50,
        query_weight=1.0, rescore_weight=10.0, positive_only=False,
    ).orderBy("rank").collect()
    text_of = {r["doc_id"]: r["text"] for r in docs.collect()}
    expect = {
        d: s + 10.0 * text_of[d].count("zebra quark") for d, s in flat.items()
    }
    assert {r["doc_id"] for r in got} == set(expect)
    for r in got:
        assert r["score"] == pytest.approx(expect[r["doc_id"]], abs=1e-9)
    # phrase docs (0 "zebra ZEBRA QUARK data", 1, 3) jump ahead of every
    # non-phrase doc at weight 10
    ranks = {r["doc_id"]: r["rank"] for r in got}
    assert {d for d, r in ranks.items() if r <= 3} == {0, 1, 3}


def test_rescore_window_restricts_candidates(spark, shaped):
    docs, idx = shaped
    q = _q(spark, "zebra data", k=2)
    phrases = spark.createDataFrame([(0, "zebra quark")], "query_id int, phrase string")
    got = rescore_topk(
        idx, q, docs, phrases, window_size=2,
        rescore_weight=100.0, positive_only=False,
    ).collect()
    flat = bm25_topk(
        idx.doc_terms, idx.terms, _q(spark, "zebra data", k=2),
        stats=idx.stats, positive_only=False,
    ).collect()
    # only the original top-2 compete, regardless of phrase hits outside
    assert {r["doc_id"] for r in got} == {r["doc_id"] for r in flat}


def _rows(df):
    return [tuple(r) for r in df.orderBy("rank").collect()]


def test_dsl_compiles_to_dedicated_operators(spark, shaped):
    """Each DSL request form produces exactly the dedicated operator's
    plan output (the DSL is a compiler, not a second scorer)."""
    from neural_search_spark.query.boolean import bm25_topk_bool, bool_terms_df
    from neural_search_spark.query.dsl import search_dsl

    docs, idx = shaped
    q = _q(spark, "zebra quark data", k=8)
    phrases = spark.createDataFrame([(0, "zebra quark")], "query_id int, phrase string")

    assert _rows(
        search_dsl(idx, {"query": {"match": {"query": "zebra quark data"}},
                         "top_k": 8})
    ) == _rows(
        bm25_topk(idx.doc_terms, idx.terms, q, stats=idx.stats, positive_only=False)
    )

    got = search_dsl(
        idx,
        {"query": {"bool": {"must": ["zebra"], "should": ["quark", "data"],
                            "must_not": ["filler"],
                            "minimum_should_match": 1}},
         "top_k": 8},
    )
    bt = bool_terms_df(spark, [(0, "+zebra -filler quark data", 8)])
    assert _rows(got) == _rows(
        bm25_topk_bool(idx, bt, min_should_match=1)
    )

    assert _rows(
        search_dsl(idx, {"query": {"match": {"query": "zebra quark"}},
                         "collapse": {"field": "site"}, "top_k": 8}, docs=docs)
    ) == _rows(
        collapse_topk(idx, _q(spark, "zebra quark", 8), docs, "site",
                      positive_only=False)
    )

    assert _rows(
        search_dsl(idx, {"query": {"match": {"query": "zebra"}},
                         "function_score": {"field": "n_chars"}, "top_k": 8},
                   docs=docs)
    ) == _rows(
        function_score_topk(idx, _q(spark, "zebra", 8), docs, "n_chars",
                            positive_only=False)
    )

    assert _rows(
        search_dsl(idx, {"query": {"match": {"query": "zebra data"}},
                         "rescore": {"phrase": "zebra quark",
                                     "rescore_weight": 10.0}, "top_k": 8},
                   docs=docs)
    ) == _rows(
        rescore_topk(idx, _q(spark, "zebra data", 8), docs, phrases,
                     rescore_weight=10.0, positive_only=False)
    )


def test_dsl_rejects_bad_requests(spark, shaped):
    from neural_search_spark.query.dsl import search_dsl

    docs, idx = shaped
    with pytest.raises(ValueError, match="exactly one"):
        search_dsl(idx, {"query": {}})
    with pytest.raises(ValueError, match="unsupported query kind"):
        search_dsl(idx, {"query": {"fuzzy": {"value": "x"}}})
    with pytest.raises(ValueError, match="at most one"):
        search_dsl(idx, {"query": {"match": {"query": "zebra"}},
                         "collapse": {"field": "site"},
                         "rescore": {"phrase": "x"}}, docs=docs)
    with pytest.raises(ValueError, match="needs the docs"):
        search_dsl(idx, {"query": {"match": {"query": "zebra"}},
                         "collapse": {"field": "site"}})
    with pytest.raises(ValueError, match="shaping composes with match"):
        search_dsl(idx, {"query": {"bool": {"must": ["zebra"]}},
                         "collapse": {"field": "site"}}, docs=docs)


def test_percolate_clause_semantics(spark, shaped):
    docs, idx = shaped
    registered = registered_queries_df(
        spark,
        [
            (0, "+zebra +quark"),   # both required
            (1, "zebra -data"),     # should + exclusion
            (2, "quark data"),      # pure should: >=1 matches
            (3, "+nosuchterm zebra"),  # unknown must: matches nothing
            (4, "+filler"),
        ],
    )
    got: dict[int, set] = {}
    for r in percolate(idx, registered).collect():
        got.setdefault(r["query_id"], set()).add(r["doc_id"])
    assert got.get(0, set()) == {0, 1, 3}
    assert got.get(1, set()) == {3, 5}        # zebra docs without data
    assert got.get(2, set()) == {0, 1, 2, 3, 4, 7}
    assert 3 not in got
    assert got.get(4, set()) == {6}


def test_percolate_plan_broadcasts_registered(spark, shaped):
    _, idx = shaped
    registered = registered_queries_df(spark, [(0, "+zebra quark")])
    plan = percolate(idx, registered)._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan


def test_percolate_stateless_matches_grouped(spark, shaped):
    """The per-row array-ops evaluator (the streaming form) returns exactly
    the grouped percolate's matches."""
    from neural_search_spark.query.percolate import (
        percolate_stateless,
        registered_clause_arrays,
    )

    docs, idx = shaped
    queries = [
        (0, "+zebra +quark"),
        (1, "zebra -data"),
        (2, "quark data"),
        (3, "+nosuchterm zebra"),
        (4, "+filler"),
        (5, "-zebra -quark words"),
    ]
    grouped = {
        (r["doc_id"], r["query_id"])
        for r in percolate(idx, registered_queries_df(spark, queries)).collect()
    }
    stateless = {
        (r["doc_id"], r["query_id"])
        for r in percolate_stateless(
            docs, registered_clause_arrays(spark, queries)
        ).collect()
    }
    assert stateless == grouped and grouped


def test_percolate_matcher_matches_cluster(spark, shaped):
    """The serving-tier single-doc matcher agrees with the cluster
    percolate on every doc of the corpus."""
    from neural_search_spark.query.percolate import PercolateMatcher

    docs, idx = shaped
    queries = [
        (0, "+zebra +quark"),
        (1, "zebra -data"),
        (2, "quark data"),
        (3, "+nosuchterm zebra"),
        (4, "+filler"),
    ]
    grouped: dict[int, set] = {}
    for r in percolate(idx, registered_queries_df(spark, queries)).collect():
        grouped.setdefault(r["doc_id"], set()).add(r["query_id"])
    matcher = PercolateMatcher(queries)
    for row in docs.collect():
        assert set(matcher.match(row["text"])) == grouped.get(row["doc_id"], set())


def test_percolate_matcher_from_jsonl(tmp_path):
    import json

    from neural_search_spark.query.percolate import PercolateMatcher

    p = tmp_path / "saved.jsonl"
    p.write_text(
        "\n".join(
            json.dumps({"query_id": q, "query": t})
            for q, t in [(0, "+zebra"), (1, "quark -zebra")]
        )
    )
    m = PercolateMatcher.from_jsonl(str(p))
    assert m.match("zebra quark here") == [0]
    assert m.match("quark only") == [1]
    assert m.match("nothing relevant") == []


def test_percolate_stateless_plan_is_aggregation_free(spark, shaped):
    """No aggregate/exchange beyond the broadcast — the property that makes
    the plan legal in streaming append mode."""
    from neural_search_spark.query.percolate import (
        percolate_stateless,
        registered_clause_arrays,
    )

    docs, _ = shaped
    reg = registered_clause_arrays(spark, [(0, "+zebra quark")])
    plan = (
        percolate_stateless(docs, reg)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "HashAggregate" not in plan and "SortAggregate" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "Broadcast" in plan


def test_dsl_new_query_kinds_compile_to_dedicated_operators(spark, shaped):
    from neural_search_spark.query.boosting import bm25_topk_boosted
    from neural_search_spark.query.dsl import search_dsl
    from neural_search_spark.query.mlt import more_like_this
    from neural_search_spark.query.phrase import (
        doc_term_positions,
        ordered_near_topk,
        phrase_topk,
    )
    from neural_search_spark.query.prefix import prefix_topk, wildcard_topk
    from neural_search_spark.query.similarities import lm_dirichlet_topk

    docs, idx = shaped
    positions = doc_term_positions(docs)

    assert _rows(
        search_dsl(idx, {"query": {"match_phrase": {"query": "zebra quark"}},
                         "top_k": 8}, docs=docs)
    ) == _rows(phrase_topk(positions, spark, [(0, "zebra quark", 8)]))

    assert _rows(
        search_dsl(idx, {"query": {"match_phrase": {"query": "zebra data",
                                                    "slop": 1}},
                         "top_k": 8}, docs=docs)
    ) == _rows(ordered_near_topk(positions, spark, [(0, "zebra data", 8, 3)]))

    qp = spark.createDataFrame([(0, "ze", 8)], "query_id int, prefix string, top_k int")
    assert _rows(search_dsl(idx, {"query": {"prefix": "ze"}, "top_k": 8})) == _rows(
        prefix_topk(idx, qp)
    )

    qw = spark.createDataFrame(
        [(0, "z*ra", 8)], "query_id int, pattern string, top_k int"
    )
    assert _rows(search_dsl(idx, {"query": {"wildcard": "z*ra"}, "top_k": 8})) == _rows(
        wildcard_topk(idx, qw)
    )

    qb = _q(spark, "zebra^2.5 data", 8)
    assert _rows(
        search_dsl(idx, {"query": {"boosted": "zebra^2.5 data"}, "top_k": 8})
    ) == _rows(bm25_topk_boosted(idx, qb, positive_only=False))

    src = spark.createDataFrame([(0,)], "src_id long")
    assert _rows(
        search_dsl(idx, {"query": {"more_like_this": 0}, "top_k": 8})
    ) == _rows(more_like_this(idx, src, k=8, positive_only=False))

    assert _rows(
        search_dsl(idx, {"query": {"match": {"query": "zebra data",
                                             "similarity": "lm_dirichlet"}},
                         "top_k": 8})
    ) == _rows(lm_dirichlet_topk(idx.doc_terms, _q(spark, "zebra data", 8)))


def test_dsl_filter_context_preserves_scores(spark, shaped):
    from neural_search_spark.query.dsl import search_dsl

    docs, idx = shaped
    flat = {
        r["doc_id"]: r["score"]
        for r in search_dsl(idx, {"query": {"match": {"query": "zebra"}},
                                  "top_k": 8}).collect()
    }
    got = search_dsl(
        idx,
        {"query": {"match": {"query": "zebra"}}, "filter": {"site": "a"},
         "top_k": 8},
        docs=docs,
    ).orderBy("rank").collect()
    # only site-a docs survive, scores UNCHANGED (ES filter context), ranks 1..n
    assert [r["doc_id"] for r in got] and all(r["doc_id"] in (0, 1, 2) for r in got)
    assert [r["rank"] for r in got] == list(range(1, len(got) + 1))
    for r in got:
        assert r["score"] == flat[r["doc_id"]]


def test_dsl_new_kind_rejections(spark, shaped):
    from neural_search_spark.query.dsl import search_dsl

    docs, idx = shaped
    with pytest.raises(ValueError, match="filter"):
        search_dsl(idx, {"query": {"prefix": "ze"}, "filter": {"site": "a"}},
                   docs=docs)
    with pytest.raises(ValueError, match="plain match"):
        search_dsl(idx, {"query": {"match": {"query": "zebra",
                                             "similarity": "lm_dirichlet"}},
                         "filter": {"site": "a"}}, docs=docs)
    with pytest.raises(ValueError, match="unsupported similarity"):
        search_dsl(idx, {"query": {"match": {"query": "zebra",
                                             "similarity": "tfidf"}}})
    with pytest.raises(ValueError, match="result shaping"):
        search_dsl(idx, {"query": {"match_phrase": {"query": "zebra quark"}},
                         "collapse": {"field": "site"}}, docs=docs)
