"""Phrase retrieval, snippet extraction, and facet counts: semantics against
hand-built fixtures + a pure-Python mirror, and physical-plan shape."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from neural_search_spark.functions.snippets import _best_window, best_snippets
from neural_search_spark.operators.facets import facet_counts
from neural_search_spark.query.phrase import (
    doc_term_positions,
    phrase_match,
    phrase_topk,
    proximity_match,
    proximity_topk,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def tiny_docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "quick brown quick brown quick"),
        (2, "brown fox and the quick dog"),
        (3, "nothing relevant here at all"),
        (4, "fox quick brown fox quick brown fox"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_phrase_tf(text: str, phrase: list[str]) -> int:
    toks = re.findall(r"\b\w+\b", text.lower())
    n = len(phrase)
    return sum(1 for i in range(len(toks) - n + 1) if toks[i : i + n] == phrase)


# --- positions ---------------------------------------------------------------


def test_doc_term_positions_are_sorted_one_based(spark, tiny_docs):
    rows = {
        (r.doc_id, r.term): (list(r.positions), r.doc_len)
        for r in doc_term_positions(tiny_docs).collect()
    }
    assert rows[(0, "the")] == ([1, 7], 9)
    assert rows[(1, "quick")] == ([1, 3, 5], 5)
    assert rows[(4, "fox")] == ([1, 4, 7], 7)


# --- phrase match ------------------------------------------------------------


def test_phrase_tf_matches_python_sliding_window(spark, tiny_docs):
    texts = {r.doc_id: r.text for r in tiny_docs.collect()}
    phrases = [(0, "quick brown", 10), (1, "brown fox", 10), (2, "the quick brown fox", 10)]
    pos = doc_term_positions(tiny_docs)
    got = {
        (r.phrase_id, r.doc_id): r.phrase_tf
        for r in phrase_match(pos, spark, phrases).collect()
    }
    for pid, ptext, _ in phrases:
        ptoks = ptext.split()
        for doc_id, text in texts.items():
            expect = _py_phrase_tf(text, ptoks)
            assert got.get((pid, doc_id), 0) == expect, (pid, doc_id)


def test_phrase_with_unknown_term_matches_nothing(spark, tiny_docs):
    pos = doc_term_positions(tiny_docs)
    assert phrase_match(pos, spark, [(0, "quick zebra", 10)]).count() == 0


def test_phrase_missing_one_term_occurrence_is_excluded(spark, tiny_docs):
    # doc 2 has both "quick" and "brown" but never adjacent in that order.
    pos = doc_term_positions(tiny_docs)
    rows = {r.doc_id for r in phrase_match(pos, spark, [(0, "quick brown", 10)]).collect()}
    assert 2 not in rows and {0, 1, 4} <= rows


def test_repeated_term_phrase(spark):
    docs = spark.createDataFrame(
        [(0, "go go go stop"), (1, "go stop go"), (2, "go go")],
        "doc_id long, text string",
    )
    pos = doc_term_positions(docs)
    got = {
        (r.phrase_id, r.doc_id): r.phrase_tf
        for r in phrase_match(pos, spark, [(0, "go go", 10)]).collect()
    }
    assert got == {(0, 0): 2, (0, 2): 1}


def test_phrase_topk_rank_is_tf_desc_docid_asc(spark, tiny_docs):
    pos = doc_term_positions(tiny_docs)
    rows = phrase_topk(pos, spark, [(0, "quick brown", 2)]).orderBy("rank").collect()
    assert [(r.rank, r.doc_id, r.phrase_tf) for r in rows] == [(1, 1, 2), (2, 4, 2)]


def test_phrase_join_broadcasts_phrase_side(spark, tiny_docs):
    pos = doc_term_positions(tiny_docs)
    plan = _plan(phrase_match(pos, spark, [(0, "quick brown", 10)]))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


# --- proximity ---------------------------------------------------------------


def _py_min_window(text: str, terms: list[str]) -> int | None:
    toks = re.findall(r"\b\w+\b", text.lower())
    tset = sorted(set(terms))
    best = None
    for i in range(len(toks)):
        seen = {}
        for j in range(i, len(toks)):
            if toks[j] in tset:
                seen[toks[j]] = j
            if len(seen) == len(tset):
                w = j - i + 1
                best = w if best is None else min(best, w)
                break
    return best


def test_proximity_min_window_matches_python_scan(spark, tiny_docs):
    texts = {r.doc_id: r.text for r in tiny_docs.collect()}
    queries = [
        (0, "quick brown", 10, 100),
        (1, "fox dog", 10, 100),
        (2, "the quick dog", 10, 100),
        (3, "quick nosuchterm", 10, 100),
    ]
    pos = doc_term_positions(tiny_docs)
    got = {
        (r.query_id, r.doc_id): r.min_window
        for r in proximity_match(pos, spark, queries).collect()
    }
    for qid, qtext, _, _ in queries:
        terms = re.findall(r"\b\w+\b", qtext.lower())
        for did, dtext in texts.items():
            assert got.get((qid, did)) == _py_min_window(dtext, terms), (qid, did)


def test_proximity_max_span_filters(spark, tiny_docs):
    # doc 2 "brown fox and the quick dog": min window for (fox, dog) is 5;
    # span 4 must drop it while doc 0's window-6 pair is dropped too.
    pos = doc_term_positions(tiny_docs)
    rows = proximity_match(pos, spark, [(0, "fox dog", 10, 4)]).collect()
    assert rows == []
    rows = proximity_match(pos, spark, [(0, "fox dog", 10, 5)]).collect()
    assert [(r.doc_id, r.min_window) for r in rows] == [(2, 5)]


def test_proximity_topk_rank_is_window_asc_docid_asc(spark, tiny_docs):
    pos = doc_term_positions(tiny_docs)
    rows = (
        proximity_topk(pos, spark, [(0, "quick brown", 2, 100)])
        .orderBy("rank")
        .collect()
    )
    assert [(r.rank, r.doc_id, r.min_window) for r in rows] == [(1, 0, 2), (2, 1, 2)]


def test_proximity_broadcasts_query_side(spark, tiny_docs):
    pos = doc_term_positions(tiny_docs)
    plan = _plan(proximity_match(pos, spark, [(0, "quick brown", 10, 8)]))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# --- snippets ----------------------------------------------------------------


def test_best_window_picks_max_distinct_then_earliest():
    toks = "a x b x x a b c x a".split()
    # candidates: positions of {a,b,c}; window 3 starting at pos 6 covers a,b,c
    assert _best_window(toks, ["a", "b", "c"], 3) == (6, 3)
    # width 1: every window has 1 hit -> earliest matched position wins
    assert _best_window(toks, ["a", "b", "c"], 1) == (1, 1)


def test_best_snippets_rows(spark, tiny_docs):
    rows = {r.doc_id: r for r in best_snippets(tiny_docs, ["quick", "dog"], window=4).collect()}
    assert 3 not in rows  # no query term -> dropped
    assert rows[2].start == 5 and rows[2].n_hits == 2
    assert rows[2].snippet == "quick dog"  # window runs past the end: truncated
    # doc 0: quick@2, dog@9 -> no 4-window covers both; earliest 1-hit start wins
    assert rows[0].start == 2 and rows[0].n_hits == 1
    assert rows[0].snippet == "quick brown fox jumps"


def test_best_snippets_zero_shuffle(spark, tiny_docs):
    plan = _plan(best_snippets(tiny_docs, ["quick"], window=4))
    assert "Exchange" not in plan


# --- facets ------------------------------------------------------------------


def test_facet_counts(spark):
    docs = spark.createDataFrame(
        [(0, "en", "a"), (1, "en", "b"), (2, "de", "a"), (3, "de", "a")],
        "doc_id long, lang string, source string",
    )
    results = spark.createDataFrame(
        [(0, 0), (0, 1), (0, 2), (1, 2), (1, 3)], "query_id int, doc_id long"
    )
    got = {
        (r.query_id, r.facet, r.value): r.n_docs
        for r in facet_counts(results, docs, ["lang", "source"]).collect()
    }
    assert got == {
        (0, "lang", "en"): 2,
        (0, "lang", "de"): 1,
        (0, "source", "a"): 2,
        (0, "source", "b"): 1,
        (1, "lang", "de"): 2,
        (1, "source", "a"): 2,
    }


def test_facet_counts_broadcasts_results_not_corpus(spark):
    docs = spark.createDataFrame([(0, "en", "a")], "doc_id long, lang string, source string")
    results = spark.createDataFrame([(0, 0)], "query_id int, doc_id long")
    plan = _plan(facet_counts(results, docs, ["lang", "source"]))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_histogram_facet_buckets(spark):
    from neural_search_spark.operators.facets import histogram_facet

    docs = spark.createDataFrame(
        [(0, 120), (1, 199), (2, 200), (3, 350), (4, 401)],
        "doc_id long, n_chars int",
    )
    results = spark.createDataFrame(
        [(0, 0), (0, 1), (0, 2), (0, 3), (1, 3), (1, 4)],
        "query_id int, doc_id long",
    )
    got = {
        (r.query_id, r.bucket_lo): r.n_docs
        for r in histogram_facet(results, docs, "n_chars", 200).collect()
    }
    # floor(v/200)*200: 120,199 -> 0; 200,350 -> 200; 401 -> 400
    assert got == {(0, 0): 2, (0, 200): 2, (1, 200): 1, (1, 400): 1}


def test_stats_facet_values(spark):
    from neural_search_spark.operators.facets import stats_facet

    docs = spark.createDataFrame(
        [(0, 10), (1, 20), (2, 40)], "doc_id long, n_chars int"
    )
    results = spark.createDataFrame(
        [(0, 0), (0, 1), (0, 2), (1, 2)], "query_id int, doc_id long"
    )
    got = {r.query_id: r for r in stats_facet(results, docs, "n_chars").collect()}
    assert (got[0].n_docs, got[0].min_v, got[0].max_v, got[0].sum_v) == (3, 10.0, 40.0, 70.0)
    assert abs(got[0].avg_v - 70.0 / 3) < 1e-9
    assert (got[1].n_docs, got[1].min_v, got[1].max_v) == (1, 40.0, 40.0)


def test_numeric_facets_broadcast_results_not_corpus(spark):
    from neural_search_spark.operators.facets import histogram_facet, stats_facet

    docs = spark.createDataFrame([(0, 10)], "doc_id long, n_chars int")
    results = spark.createDataFrame([(0, 0)], "query_id int, doc_id long")
    for df in (histogram_facet(results, docs, "n_chars", 100), stats_facet(results, docs, "n_chars")):
        plan = _plan(df)
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan


def test_significant_terms_prefers_concentrated_terms(spark):
    from neural_search_spark.operators.facets import significant_terms

    # 10 docs; "rare" appears only in the 3 result docs, "common" in all 10.
    rows = []
    for d in range(10):
        terms = [("common", 2)]
        if d < 3:
            terms.append(("rare", 1))
        for t, tf in terms:
            rows.append((d, t, tf, 3))
    doc_terms = spark.createDataFrame(rows, "doc_id long, term string, tf int, doc_len int")
    results = spark.createDataFrame([(0, 0), (0, 1), (0, 2)], "query_id int, doc_id long")
    out = significant_terms(results, doc_terms, n_docs=10, m=5).orderBy("rank").collect()
    assert [(r.rank, r.term) for r in out] == [(1, "rare"), (2, "common")]
    r = out[0]
    # fg_pct = 3/3 = 1, bg_pct = 3/10 -> JLH = (1 - 0.3) * (1/0.3)
    assert (r.fg_count, r.bg_count) == (3, 3)
    assert abs(r.score - round((1 - 0.3) * (1 / 0.3), 6)) < 1e-9
    # "common" is the background itself: fg_pct == bg_pct == 1 -> score 0
    assert out[1].score == 0.0


def test_significant_terms_broadcasts_hits_not_postings(spark):
    from neural_search_spark.operators.facets import significant_terms

    doc_terms = spark.createDataFrame(
        [(0, "a", 1, 1)], "doc_id long, term string, tf int, doc_len int"
    )
    results = spark.createDataFrame([(0, 0)], "query_id int, doc_id long")
    plan = _plan(significant_terms(results, doc_terms, n_docs=1))
    assert "BroadcastHashJoin" in plan


# --- Ordered proximity (SpanNear inOrder=true) --------------------------------


def test_ordered_near_is_order_sensitive(spark):
    from neural_search_spark.query.phrase import doc_term_positions, ordered_near_topk

    rows = [
        (0, "alpha x beta"),        # alpha..beta span 3, ordered
        (1, "beta x alpha"),        # reversed only
        (2, "alpha beta"),          # adjacent, span 2
        (3, "x y z"),               # neither
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    pos = doc_term_positions(corpus)
    fwd = {
        r["doc_id"]: r["min_window"]
        for r in ordered_near_topk(pos, spark, [(0, "alpha beta", 10, 10)]).collect()
    }
    rev = {
        r["doc_id"]: r["min_window"]
        for r in ordered_near_topk(pos, spark, [(0, "beta alpha", 10, 10)]).collect()
    }
    assert fwd == {0: 3, 2: 2}, "forward matches only the in-order docs"
    assert rev == {1: 3}, "reversed query matches only the reversed doc"


def test_ordered_near_repeated_terms_and_span_cut(spark):
    from neural_search_spark.query.phrase import doc_term_positions, ordered_near_topk

    rows = [
        (0, "a a b"),       # a a b chain: window 3
        (1, "a b"),         # only one 'a': cannot satisfy two a-slots
        (2, "a q q q a b"), # window 6 chain a..a..b
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    pos = doc_term_positions(corpus)
    got = {
        r["doc_id"]: r["min_window"]
        for r in ordered_near_topk(pos, spark, [(0, "a a b", 10, 10)]).collect()
    }
    assert got == {0: 3, 2: 6}, "repeated slots need distinct ordered positions"
    # span cut drops the loose chain
    tight = {
        r["doc_id"]: r["min_window"]
        for r in ordered_near_topk(pos, spark, [(0, "a a b", 10, 3)]).collect()
    }
    assert tight == {0: 3}


def test_ordered_near_exact_phrase_degenerate(spark):
    """max_span == n reduces ordered-near to 'the phrase exists' (adjacent
    in-order run), agreeing with phrase_match on matched docs."""
    from neural_search_spark.query.phrase import (
        doc_term_positions,
        ordered_near_topk,
        phrase_topk,
    )

    rows = [
        (0, "big data wins"),
        (1, "big x data"),
        (2, "data big"),
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    pos = doc_term_positions(corpus)
    near = {r["doc_id"] for r in ordered_near_topk(pos, spark, [(0, "big data", 10, 2)]).collect()}
    phr = {r["doc_id"] for r in phrase_topk(pos, spark, [(0, "big data", 10)]).collect()}
    assert near == phr == {0}


def test_phrase_bm25_rare_phrase_outranks_common(spark):
    """Phrase scoring must invert raw-tf ordering when the higher-tf phrase
    is common: a doc with ONE occurrence of a rare phrase outranks a doc
    with TWO occurrences of a phrase found everywhere."""
    from neural_search_spark.functions.tokenize import doc_lengths
    from neural_search_spark.query.phrase import doc_term_positions, phrase_bm25_topk

    rows = [(0, "rare pair here filler words now")] + [
        (i, "common duo common duo filler words") for i in range(1, 9)
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    dl = doc_lengths(corpus, id_col="doc_id")
    row = dl.agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("doc_len") * 1.0 / F.count(F.lit(1))).alias("avgdl"),
    ).collect()[0]
    pos = doc_term_positions(corpus)
    phrases = [(0, "rare pair", 10), (1, "common duo", 10)]
    res = phrase_bm25_topk(
        pos, dl, spark, phrases, n_docs=int(row["n"]), avgdl=float(row["avgdl"])
    ).collect()
    by_p = {}
    for r in res:
        by_p.setdefault(r["phrase_id"], {})[r["doc_id"]] = r["score"]
    rare_score = by_p[0][0]
    common_best = max(by_p[1].values())
    # df("rare pair") = 1 of 9 -> high idf; df("common duo") = 8 of 9 ->
    # negative idf; even phrase_tf 2 cannot save it
    assert rare_score > common_best
    assert common_best < 0, "a phrase in >half the docs gets a negative idf"
