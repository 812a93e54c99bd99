"""More-like-this (query/mlt.py) and fuzzy term suggestion (query/suggest.py):
semantics against brute-force references, determinism, and the plan shapes
the 100 TB story depends on (broadcast query sides, no corpus shuffle before
the score agg)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neural_search_spark.index.stats import build_logical_index
from neural_search_spark.query.mlt import mlt_select_terms, more_like_this
from neural_search_spark.query.suggest import term_suggest, vocab_variant_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def mlt_index(spark):
    # docs 0/1 share the rare term pair (zebra quark), doc 2 shares only
    # zebra, doc 3 is common-terms-only, doc 4 shares nothing selected
    rows = [
        (0, "zebra quark the the the data data"),
        (1, "quark zebra data the the the the"),
        (2, "zebra the data data data the the"),
        (3, "the the the data data data the"),
        (4, "unrelated words entirely here yes"),
        # common-only filler keeps zebra/quark df in the minority so their
        # idfs stay positive (raw idf flips negative at df > N/2)
        (5, "the data the data the"),
        (6, "data the data the data"),
        (7, "the the data data the"),
        (8, "data data the the data"),
        (9, "the data data the the"),
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    return build_logical_index(corpus, persist=True)


def test_mlt_selects_top_tfidf_terms(spark, mlt_index):
    src = spark.createDataFrame([(0,)], "src_id int")
    sel = mlt_select_terms(mlt_index, src, m=2).collect()
    # doc 0 terms: zebra(df2->high idf), quark(df2), the(df5), data(df4);
    # tf*idf ranks the two rare terms first
    assert sorted(r["term"] for r in sel) == ["quark", "zebra"]


def test_mlt_excludes_source_and_ranks_sharers_first(spark, mlt_index):
    src = spark.createDataFrame([(0,)], "src_id int")
    res = more_like_this(mlt_index, src, m=2, k=10).collect()
    ids = [r["doc_id"] for r in res]
    assert 0 not in ids  # source excluded
    assert ids[0] == 1  # shares both selected terms
    assert ids[1] == 2  # shares one
    assert 4 not in ids  # shares none -> never a candidate


def test_mlt_positive_only_cut(spark, mlt_index):
    src = spark.createDataFrame([(0,)], "src_id int")
    allr = more_like_this(mlt_index, src, m=2, k=10, positive_only=False).count()
    pos = more_like_this(mlt_index, src, m=2, k=10, positive_only=True)
    assert pos.where(F.col("score") <= 0).count() == 0
    assert pos.count() <= allr


def test_mlt_batch_is_deterministic(spark, mlt_index):
    src = spark.createDataFrame([(0,), (2,), (3,)], "src_id int")
    a = sorted(map(tuple, more_like_this(mlt_index, src, m=3, k=5).collect()))
    b = sorted(map(tuple, more_like_this(mlt_index, src, m=3, k=5).collect()))
    assert a == b


def test_mlt_plan_broadcasts_query_side(spark, mlt_index):
    src = spark.createDataFrame([(0,)], "src_id int")
    plan = _plan(more_like_this(mlt_index, src, m=2, k=5))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_prefix_expands_and_ranks(spark, mlt_index):
    from neural_search_spark.query.prefix import expand_prefix, prefix_topk

    q = spark.createDataFrame(
        [(0, "z", 10), (1, "qu", 10), (2, "nope", 10)],
        "query_id int, prefix string, top_k int",
    )
    exp = expand_prefix(mlt_index.terms, q)
    by_q = {r["query_id"]: r["term"] for r in exp.collect()}
    assert by_q == {0: "zebra", 1: "quark"}  # 'nope' expands to nothing
    res = prefix_topk(mlt_index, q).collect()
    assert {r["query_id"] for r in res} == {0, 1}
    # 'z' -> zebra: docs 0,1,2 and nothing else
    assert sorted(r["doc_id"] for r in res if r["query_id"] == 0) == [0, 1, 2]


def test_prefix_multi_term_sums_contributions(spark, mlt_index):
    from neural_search_spark.query.prefix import prefix_topk

    # 'z'+'qu' separately vs a prefix matching both terms is not expressible
    # on this vocab, so check additivity directly: a doc matching two
    # expanded terms outscores one matching a single term at equal tf/dl
    q = spark.createDataFrame(
        [(0, "q", 10)], "query_id int, prefix string, top_k int"
    )
    res = prefix_topk(mlt_index, q).orderBy("rank").collect()
    assert [r["doc_id"] for r in res] == [0, 1]  # only quark docs


def test_prefix_plan_shape(spark, mlt_index):
    from neural_search_spark.query.prefix import prefix_topk

    q = spark.createDataFrame(
        [(0, "z", 10)], "query_id int, prefix string, top_k int"
    )
    plan = _plan(prefix_topk(mlt_index, q))
    assert "Broadcast" in plan
    assert "SortMergeJoin" not in plan


VOCAB = [
    ("spark", 40), ("scan", 55), ("a", 90), ("agg", 30), ("window", 25),
    ("merge", 60), ("row", 70), ("rows", 5), ("key", 80),
]


def _brute(q: str, n: int = 3, max_dist: int = 1):
    import itertools

    def lev(s, t):
        d = list(range(len(t) + 1))
        for i, cs in enumerate(s, 1):
            prev, d[0] = d[0], i
            for j, ct in enumerate(t, 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1, prev + (cs != ct))
        return d[-1]

    cands = [(lev(q, t), -df, t) for t, df in VOCAB if lev(q, t) <= max_dist]
    return [(t, d, -ndf) for d, ndf, t in sorted(cands)][:n]


@pytest.fixture(scope="module")
def vocab_df(spark):
    return spark.createDataFrame(VOCAB, "term string, df long")


@pytest.mark.parametrize(
    "q", ["spark", "spak", "sparkk", "par", "ro", "row", "a", "zz", "wind0w"]
)
def test_suggest_matches_brute_force(spark, vocab_df, q):
    qdf = spark.createDataFrame([(q,)], "q_term string")
    got = [
        (r["suggestion"], r["distance"], r["df"])
        for r in term_suggest(vocab_df, qdf, n=3).orderBy("rank").collect()
    ]
    assert got == _brute(q), f"{q}: {got} vs {_brute(q)}"


def test_suggest_deletion_neighborhood_is_vocab_bounded(spark, vocab_df):
    # |variants| <= sum(len(term) + 1): corpus-size-independent index
    n = vocab_variant_table(vocab_df).count()
    assert n <= sum(len(t) + 1 for t, _ in VOCAB)


def test_suggest_plan_broadcasts_query_side(spark, vocab_df):
    qdf = spark.createDataFrame([("spak",)], "q_term string")
    plan = _plan(term_suggest(vocab_df, qdf))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


# -- boolean queries (query/boolean.py) --------------------------------------


def test_parse_bool_query():
    from neural_search_spark.query.boolean import parse_bool_query

    assert parse_bool_query("+zebra quark -the") == [
        ("must", "zebra"), ("should", "quark"), ("must_not", "the"),
    ]
    # a segment may tokenize to several terms, all inheriting its clause
    assert parse_bool_query("+a-b") == [("must", "a"), ("must", "b")]
    assert parse_bool_query("-x,y") == [("must_not", "x"), ("must_not", "y")]


def test_bool_must_and_must_not(spark, mlt_index):
    from neural_search_spark.query.boolean import bm25_topk_bool, bool_terms_df

    # corpus recap: zebra in {0,1,2}, quark in {0,1}, data everywhere but 4
    cases = {
        0: ("+zebra +quark", {0, 1}),         # both required
        1: ("+zebra -quark", {2}),            # zebra minus quark docs
        2: ("zebra -quark", {2}),             # should-scored, same exclusion
        3: ("+nosuchterm zebra", set()),      # unknown must empties
        4: ("+quark", {0, 1}),                # single must
    }
    bt = bool_terms_df(spark, [(q, t, 10) for q, (t, _) in cases.items()])
    res = bm25_topk_bool(mlt_index, bt).collect()
    got: dict[int, set] = {}
    for r in res:
        got.setdefault(r["query_id"], set()).add(r["doc_id"])
    for q, (_, expect) in cases.items():
        assert got.get(q, set()) == expect, f"query {q}"


def test_bool_pure_should_matches_flat_bm25(spark, mlt_index):
    """With no +/- clauses, boolean retrieval degenerates to the flat
    match-mode BM25 path — identical docs and scores."""
    from neural_search_spark.query.bm25_dataframe import bm25_topk
    from neural_search_spark.query.boolean import bm25_topk_bool, bool_terms_df

    text = "zebra quark data"
    bt = bool_terms_df(spark, [(0, text, 10)])
    got = {
        (r["doc_id"], round(r["score"], 9))
        for r in bm25_topk_bool(mlt_index, bt).collect()
    }
    q = spark.createDataFrame(
        [(0, text, 10)], "query_id int, query_text string, top_k int"
    )
    expect = {
        (r["doc_id"], round(r["score"], 9))
        for r in bm25_topk(
            mlt_index.doc_terms, mlt_index.terms, q,
            stats=mlt_index.stats, positive_only=False,
        ).collect()
    }
    assert got == expect


def test_bool_plan_broadcasts_clause_table(spark, mlt_index):
    from neural_search_spark.query.boolean import bm25_topk_bool, bool_terms_df

    bt = bool_terms_df(spark, [(0, "+zebra -quark data", 5)])
    plan = _plan(bm25_topk_bool(mlt_index, bt))
    assert "Broadcast" in plan
    # the corpus-side term joins must broadcast the clause table; the
    # (query_id, doc_id)-keyed eligibility joins MAY sort-merge — they share
    # the score agg's partitioning, so no extra corpus exchange. What must
    # never appear is a term-keyed shuffle JOIN (a term-keyed exchange still
    # exists for the vocabulary df/idf aggregation — that one is vocab-sized).
    assert "SortMergeJoin [term" not in plan


def test_bool_min_should_match(spark, mlt_index):
    """Lucene setMinimumNumberShouldMatch semantics: a doc needs >= n
    DISTINCT should-term matches (occurrences of one term count once), on
    top of the must/must_not constraints.

    Corpus recap: zebra in {0,1,2}, quark in {0,1}, data everywhere but 4.
    """
    from neural_search_spark.query.boolean import bm25_topk_bool, bool_terms_df

    cases = [
        # (text, msm, expected doc set)
        ("zebra quark data", 1, {0, 1, 2, 3, 5, 6, 7, 8, 9}),
        ("zebra quark data", 2, {0, 1, 2}),   # doc 2: zebra+data only
        ("zebra quark data", 3, {0, 1}),
        ("zebra quark", 3, set()),            # fewer distinct shoulds than n
        ("+data zebra quark", 1, {0, 1, 2}),  # must AND >=1 should
        # repeated occurrences of one term count once
        ("zebra zebra quark", 2, {0, 1}),
    ]
    for qi, (text, msm, expect) in enumerate(cases):
        bt = bool_terms_df(spark, [(qi, text, 20)])
        got = {
            r["doc_id"]
            for r in bm25_topk_bool(
                mlt_index, bt, min_should_match=msm
            ).collect()
        }
        assert got == expect, f"{text!r} msm={msm}"


def test_bool_min_should_match_scores_unchanged(spark, mlt_index):
    """msm only FILTERS eligibility — surviving docs keep exactly the score
    the unconstrained boolean query gives them."""
    from neural_search_spark.query.boolean import bm25_topk_bool, bool_terms_df

    bt = bool_terms_df(spark, [(0, "zebra quark data", 20)])
    base = {
        r["doc_id"]: r["score"]
        for r in bm25_topk_bool(mlt_index, bt).collect()
    }
    constrained = bm25_topk_bool(mlt_index, bt, min_should_match=2).collect()
    assert {r["doc_id"] for r in constrained} < set(base)
    for r in constrained:
        assert r["score"] == pytest.approx(base[r["doc_id"]], abs=1e-9)


# --- synonym folding ---------------------------------------------------------


def _syn_corpus(spark):
    rows = [
        (0, "join the tables now"),
        (1, "merge the tables now"),
        (2, "join merge join"),
        (3, "nothing about either topic"),
        (4, "the group window closes"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_synonym_members_query_identically(spark):
    from neural_search_spark.query.synonyms import bm25_topk_syn, synonyms_df

    idx = build_logical_index(_syn_corpus(spark), persist=True)
    syn = synonyms_df(spark, {"merge": "join"})
    qs = spark.createDataFrame(
        [(0, "join", 10), (1, "merge", 10)], "query_id int, query_text string, top_k int"
    )
    rows = bm25_topk_syn(idx, qs, syn, positive_only=False).collect()
    by_q = {0: [], 1: []}
    for r in rows:
        by_q[r.query_id].append((r.rank, r.doc_id, round(r.score, 9)))
    # both group members hit the same folded posting list: identical rankings
    assert sorted(by_q[0]) == sorted(by_q[1])
    # docs 0, 1 and 2 all match through the fold
    assert {d for _, d, _ in by_q[0]} == {0, 1, 2}


def test_synonym_fold_df_is_union_not_sum(spark):
    from neural_search_spark.query.synonyms import fold_index, synonyms_df

    idx = build_logical_index(_syn_corpus(spark), persist=True)
    syn = synonyms_df(spark, {"merge": "join"})
    fidx = fold_index(idx, syn)
    t = {r.term: (r.df, r.raw_idf) for r in fidx.terms.collect()}
    # doc 2 contains both members but counts once: df = |{0,1,2}| = 3
    assert t["join"][0] == 3
    assert "merge" not in t
    # group tf in doc 2 = 2 + 1
    tf = {
        (r.doc_id, r.term): r.tf for r in fidx.doc_terms.collect()
    }
    assert tf[(2, "join")] == 3
    # doc lengths unchanged by folding
    dl = {r.doc_id: r.doc_len for r in fidx.doc_terms.select("doc_id", "doc_len").distinct().collect()}
    assert dl[2] == 3 and dl[0] == 4


def test_synonym_identity_mapping_is_noop(spark):
    from neural_search_spark.query.bm25_dataframe import bm25_topk
    from neural_search_spark.query.synonyms import bm25_topk_syn, synonyms_df

    corpus = _syn_corpus(spark)
    idx = build_logical_index(corpus, persist=True)
    syn = synonyms_df(spark, {"unusedterm": "alsounused"})
    qs = spark.createDataFrame(
        [(0, "join tables", 10), (1, "group window", 10)],
        "query_id int, query_text string, top_k int",
    )
    base = bm25_topk(idx.doc_terms, idx.terms, qs, stats=idx.stats, positive_only=False)
    fold = bm25_topk_syn(idx, qs, syn, positive_only=False)
    b = sorted((r.query_id, r.rank, r.doc_id, round(r.score, 9)) for r in base.collect())
    f = sorted((r.query_id, r.rank, r.doc_id, round(r.score, 9)) for r in fold.collect())
    assert b == f


def test_synonym_qtf_sums_across_variants(spark):
    from neural_search_spark.query.synonyms import fold_query_terms, synonyms_df
    from neural_search_spark.query.bm25_dataframe import query_terms

    syn = synonyms_df(spark, {"merge": "join"})
    qs = spark.createDataFrame(
        [(0, "join merge join", 10)], "query_id int, query_text string, top_k int"
    )
    out = fold_query_terms(query_terms(qs), syn).collect()
    assert [(r.term, r.qtf) for r in out] == [("join", 3)]


# --- BM25F multi-field ranking ------------------------------------------------


def test_bm25f_title_hit_outranks_body_hit(spark):
    """Two docs identical except WHERE the query term sits: in the title
    window vs the body. BM25F with a title boost must rank the title doc
    first; flat BM25 scores them identically (same tf/doc_len)."""
    from neural_search_spark.query.bm25_dataframe import bm25_topk
    from neural_search_spark.query.bm25f import (
        BM25FParams,
        FieldSpec,
        bm25f_topk,
        split_fielded_terms,
    )

    rows = [
        # 12 tokens each; title window = first 8 tokens
        (0, "zebra aa bb cc dd ee ff gg hh ii jj kk"),   # zebra in title
        (1, "aa bb cc dd ee ff gg hh zebra ii jj kk"),   # zebra in body
        (2, "aa bb cc dd ee ff gg hh ii jj kk ll"),      # no zebra
        (3, "mm nn oo pp qq rr ss tt uu vv ww xx"),
        # filler keeps zebra's df (2) under N/2 so its idf is positive
        (4, "mm nn oo pp qq rr ss tt uu vv ww xx"),
        (5, "mm nn oo pp qq rr ss tt uu vv ww xx"),
        (6, "mm nn oo pp qq rr ss tt uu vv ww xx"),
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_logical_index(corpus, persist=True)
    fielded = split_fielded_terms(corpus, title_tokens=8)
    qdf = spark.createDataFrame(
        [(0, "zebra", 5)], "query_id int, query_text string, top_k int"
    )
    params = BM25FParams(
        fields={"title": FieldSpec(weight=3.0), "body": FieldSpec(weight=1.0)}
    )
    got = {
        r["doc_id"]: r["rank"]
        for r in bm25f_topk(idx, fielded, qdf, params=params).collect()
    }
    assert set(got) == {0, 1}, "only zebra docs match"
    assert got[0] == 1 and got[1] == 2, "title hit must outrank body hit"

    flat = bm25_topk(idx.doc_terms, idx.terms, qdf, stats=idx.stats).collect()
    scores = {r["doc_id"]: r["score"] for r in flat}
    assert scores[0] == pytest.approx(scores[1], rel=1e-12), (
        "flat BM25 cannot distinguish the two placements"
    )


def test_bm25f_equal_weights_zero_b_matches_flat_saturation(spark):
    """With w_f = 1 and b_f = 0 for all fields, tf~ degenerates to the raw
    document tf, so BM25F == BM25 with b=0: field structure must not leak
    into scores when the params say fields don't matter."""
    from neural_search_spark.config import BM25Params
    from neural_search_spark.query.bm25_dataframe import bm25_topk
    from neural_search_spark.query.bm25f import (
        BM25FParams,
        FieldSpec,
        bm25f_topk,
        split_fielded_terms,
    )

    rows = [
        (0, "zebra quark aa bb cc dd ee ff gg hh zebra ii"),
        (1, "aa zebra bb cc dd ee ff gg hh ii jj kk"),
        (2, "quark aa bb cc dd ee ff gg hh ii jj kk"),
        (3, "mm nn oo pp qq rr ss tt uu vv ww xx"),
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_logical_index(corpus, persist=True)
    fielded = split_fielded_terms(corpus, title_tokens=8)
    qdf = spark.createDataFrame(
        [(0, "zebra quark", 5)], "query_id int, query_text string, top_k int"
    )
    fparams = BM25FParams(
        k1=1.5,
        fields={"title": FieldSpec(1.0, b=0.0), "body": FieldSpec(1.0, b=0.0)},
    )
    got = {
        r["doc_id"]: r["score"]
        for r in bm25f_topk(idx, fielded, qdf, params=fparams).collect()
    }
    flat = bm25_topk(
        idx.doc_terms, idx.terms, qdf, stats=idx.stats,
        params=BM25Params(k1=1.5, b=0.0),
    ).collect()
    want = {r["doc_id"]: r["score"] for r in flat}
    assert set(got) == set(want)
    for d, s in want.items():
        assert got[d] == pytest.approx(s, rel=1e-9), d


# --- S-stemmer analyzer stage ---------------------------------------------


STEM_CASES = [
    ("queries", "query"),
    ("tables", "table"),
    ("keys", "key"),
    ("values", "value"),
    ("glass", "glass"),      # -ss protected
    ("virus", "virus"),      # -us protected
    ("toes", "toes"),        # -oes protected
    ("trees", "trees"),      # -ees protected (terminal: no fall-through to -s)
    ("ties", "ty"),          # 4 letters clears the -ies length guard: known
                             # over-stem of the rule-simple S-stemmer, pinned
    ("as", "as"),            # length guard
    ("is", "is"),            # length guard
    ("zq3s", "zq3"),
    ("window", "window"),    # no suffix
]


def test_s_stem_python_column_sql_parity(spark):
    """The three stemmer mirrors (Python, Spark Column, DuckDB SQL) must
    agree on every case — the serving replica, the cluster fold, and the
    oracle all depend on bit-identical folding."""
    import duckdb

    from neural_search_spark.functions.stem import s_stem_col, s_stem_py, s_stem_sql

    words = [w for w, _ in STEM_CASES]
    df = spark.createDataFrame([(w,) for w in words], "term string")
    got_col = {
        r["term"]: r["stem"]
        for r in df.select("term", s_stem_col(F.col("term")).alias("stem")).collect()
    }
    vals = ", ".join(f"('{w}')" for w in words)
    got_sql = dict(
        duckdb.sql(
            f"SELECT term, {s_stem_sql('term')} AS s FROM (VALUES {vals}) t(term)"
        ).fetchall()
    )
    for w, _want in STEM_CASES:
        py = s_stem_py(w)
        assert got_col[w] == py, f"column mirror diverges on {w}"
        assert got_sql[w] == py, f"sql mirror diverges on {w}"


def test_s_stem_expected_folds():
    from neural_search_spark.functions.stem import s_stem_py

    for w, want in STEM_CASES:
        assert s_stem_py(w) == want, w


def test_stemmed_retrieval_plural_matches_singular(spark):
    """A plural query must retrieve singular docs (and vice versa), with df
    computed over the union of surface forms."""
    from neural_search_spark.query.stemming import bm25_topk_stem, stem_index

    rows = [
        (0, "table aa bb cc dd"),
        (1, "tables ee ff gg hh"),
        (2, "ii jj kk ll mm"),
        (3, "nn oo pp qq rr"),
        (4, "ss tt uu vv ww"),
    ]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_logical_index(corpus, persist=True)

    sidx = stem_index(idx)
    got_df = {
        r["term"]: r["df"] for r in sidx.terms.where(F.col("term") == "table").collect()
    }
    assert got_df == {"table": 2}, "df must be the union of 'table' and 'tables' docs"

    qdf = spark.createDataFrame(
        [(0, "tables", 5), (1, "table", 5)],
        "query_id int, query_text string, top_k int",
    )
    res = bm25_topk_stem(idx, qdf).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r["query_id"], {})[r["doc_id"]] = r["score"]
    assert set(by_q[0]) == {0, 1}, "plural query matches both surface forms"
    assert by_q[0] == by_q[1], "plural and singular queries are identical post-fold"


# --- Query-time term boosting -------------------------------------------------


def test_parse_boosted_query():
    from neural_search_spark.query.boosting import parse_boosted_py

    assert parse_boosted_py("zebra^2.5 quark") == [("zebra", 2.5), ("quark", 1.0)]
    # a multi-token chunk shares its boost across all its tokens
    assert parse_boosted_py("a-b^2") == [("a", 2.0), ("b", 2.0)]
    # malformed boost degrades to plain tokens (the ^ is dropped by \w+)
    assert parse_boosted_py("x^y") == [("x", 1.0), ("y", 1.0)]
    assert parse_boosted_py("") == []


def test_boost_one_equals_flat_bm25(spark, mlt_index):
    """All boosts 1.0 (implicit) must reproduce the flat engine exactly."""
    from neural_search_spark.query.bm25_dataframe import bm25_topk
    from neural_search_spark.query.boosting import bm25_topk_boosted

    qdf = spark.createDataFrame(
        [(0, "zebra quark", 10), (1, "zebra zebra data", 10)],
        "query_id int, query_text string, top_k int",
    )
    flat = {
        (r["query_id"], r["doc_id"]): (r["rank"], r["score"])
        for r in bm25_topk(
            mlt_index.doc_terms, mlt_index.terms, qdf, stats=mlt_index.stats
        ).collect()
    }
    boosted = {
        (r["query_id"], r["doc_id"]): (r["rank"], r["score"])
        for r in bm25_topk_boosted(mlt_index, qdf).collect()
    }
    assert set(boosted) == set(flat)
    for key, (rank, score) in flat.items():
        brank, bscore = boosted[key]
        assert brank == rank and bscore == pytest.approx(score, rel=1e-12), key


def test_boost_score_linearity(spark, mlt_index):
    """Boost weights act linearly per term BEFORE the doc-level sum:
    score("zebra^2 quark^0.5", d) == 2*score("zebra", d) + 0.5*score("quark", d)
    — an exact algebraic identity of the weighted-qtf generalization."""
    from neural_search_spark.query.boosting import bm25_topk_boosted

    qdf = spark.createDataFrame(
        [(0, "zebra", 10), (1, "quark", 10), (2, "zebra^2 quark^0.5", 10)],
        "query_id int, query_text string, top_k int",
    )
    res = bm25_topk_boosted(mlt_index, qdf).collect()
    by_q: dict[int, dict[int, float]] = {}
    for r in res:
        by_q.setdefault(r["query_id"], {})[r["doc_id"]] = r["score"]
    za, qa, comb = by_q[0], by_q[1], by_q[2]
    assert set(comb) == set(za) | set(qa)
    for d, s in comb.items():
        want = 2.0 * za.get(d, 0.0) + 0.5 * qa.get(d, 0.0)
        assert s == pytest.approx(want, rel=1e-12), d


# --- Wildcard queries ---------------------------------------------------------


def test_wildcard_regex_translation():
    from neural_search_spark.query.prefix import wildcard_regex

    assert wildcard_regex("spar*") == "^spar.*$"
    assert wildcard_regex("k?y") == "^k.y$"
    assert wildcard_regex("a.b*") == r"^a\.b.*$"  # regex metachars escaped
    assert wildcard_regex("*") == "^.*$"


def test_wildcard_expands_and_scores(spark, mlt_index):
    from neural_search_spark.query.prefix import expand_wildcard, prefix_topk, wildcard_topk

    q = spark.createDataFrame(
        [(0, "z*a", 10), (1, "?uark", 10), (2, "x?z", 10)],
        "query_id int, pattern string, top_k int",
    )
    exp = {r["query_id"]: r["term"] for r in expand_wildcard(mlt_index.terms, q).collect()}
    assert exp == {0: "zebra", 1: "quark"}  # 'x?z' expands to nothing

    # a pure-prefix wildcard must equal the dedicated prefix path
    wq = spark.createDataFrame(
        [(0, "ze*", 10)], "query_id int, pattern string, top_k int"
    )
    pq = spark.createDataFrame(
        [(0, "ze", 10)], "query_id int, prefix string, top_k int"
    )
    got = sorted(map(tuple, wildcard_topk(mlt_index, wq).collect()))
    want = sorted(map(tuple, prefix_topk(mlt_index, pq).collect()))
    assert got == want and len(got) > 0


def test_dis_max_best_fields_semantics(spark):
    """dis_max vs BM25F: the doc whose query terms CO-OCCUR in one field wins
    under best-fields (tie_breaker=0); tie_breaker re-admits the split doc's
    second field without touching single-field docs."""
    from neural_search_spark.index.stats import build_logical_index
    from neural_search_spark.query.bm25f import (
        BM25FParams,
        FieldSpec,
        dis_max_topk,
        split_fielded_terms,
    )

    pad = " ".join(f"w{i}" for i in range(6))
    rows = [
        # title = first 8 tokens
        (0, "alpha beta " + pad + " tail tail tail"),        # both in title
        (1, "alpha " + pad + " x beta tail tail"),            # alpha title, beta body
        (2, "other words entirely here now " + pad),
        (3, "more unrelated filler text here " + pad),
        (4, "background corpus doc one " + pad),
        (5, "background corpus doc two " + pad),
        (6, "background corpus doc three " + pad),
        (7, "background corpus doc four " + pad),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_logical_index(docs, persist=True)
    fielded = split_fielded_terms(docs, title_tokens=8)
    params = BM25FParams(fields={"title": FieldSpec(weight=1.0), "body": FieldSpec(weight=1.0)})
    q = spark.createDataFrame(
        [(0, "alpha beta", 10)], "query_id int, query_text string, top_k int"
    )

    def scores(tb):
        got = dis_max_topk(
            idx, fielded, q, params=params, tie_breaker=tb,
            positive_only=False, score_rounding=6,
        ).collect()
        return {r["doc_id"]: (r["rank"], r["score"]) for r in got}

    tb0, tb1 = scores(0.0), scores(1.0)
    # co-occurrence in ONE field wins under pure best-fields
    assert tb0[0][0] < tb0[1][0]
    # tie_breaker=1 adds the split doc's other field...
    assert tb1[1][1] > tb0[1][1]
    # ...and leaves single-matching-field docs untouched
    assert tb1[0][1] == tb0[0][1]
