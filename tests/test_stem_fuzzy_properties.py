"""Differential property tests for two more bit-exactness frontiers:

* the S-stemmer tri-mirror (Python / Spark Column / generated SQL must agree
  on arbitrary tokens — the exception-suffix table is fiddly and a drifted
  mirror shows up only as a driver hash mismatch);
* the fuzzy deletion-1 neighborhood (the SymSpell candidate join must find
  EVERY vocabulary term within Levenshtein distance 1 — completeness is the
  documented contract the oracle checks at corpus scale, here checked over
  random vocabularies).
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from neural_search_spark.functions.stem import s_stem_col, s_stem_py, s_stem_sql

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# word-ish tokens, biased toward the suffix classes the stemmer rewrites
_WORD = st.one_of(
    st.from_regex(r"[a-z]{1,8}(ies|es|s|ss|us|is|ch)?", fullmatch=True),
    st.from_regex(r"[a-z]{0,6}(aties|cties|ties|ies|yes|oes|xes|ses|e?s)", fullmatch=True),
)


@given(words=st.lists(_WORD, min_size=1, max_size=60))
@settings(**_SETTINGS)
def test_stemmer_tri_mirror_agrees(spark, words):
    py = {w: s_stem_py(w) for w in words}
    sdf = spark.createDataFrame([(w,) for w in set(words)], "term string")
    col = {
        r["term"]: r["stem"]
        for r in sdf.select("term", s_stem_col(F.col("term")).alias("stem")).collect()
    }
    con = duckdb.connect()
    con.register("words_pdf", pd.DataFrame({"term": sorted(set(words))}))
    sql = {
        t: s
        for t, s in con.execute(
            f"SELECT term, {s_stem_sql('term')} AS stem FROM words_pdf"
        ).fetchall()
    }
    for w in set(words):
        assert py[w] == col[w] == sql[w], (w, py[w], col[w], sql[w])


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@given(
    vocab=st.lists(
        st.from_regex(r"[a-z]{2,7}", fullmatch=True), min_size=2, max_size=40
    ),
    q=st.from_regex(r"[a-z]{2,7}", fullmatch=True),
)
@settings(**_SETTINGS)
def test_fuzzy_deletion1_neighborhood_is_complete(spark, vocab, q):
    from neural_search_spark.query.fuzzy import fuzzy_expansions

    terms = spark.createDataFrame(
        [(v, 1.0) for v in set(vocab)], "term string, idf double"
    )
    qdf = spark.createDataFrame(
        [(0, 10, q, 1)], "query_id int, top_k int, term string, qtf int"
    )
    got = {
        r["term"]
        for r in fuzzy_expansions(terms, qdf, max_dist=1).collect()
    }
    want = {v for v in set(vocab) if _lev(q, v) <= 1}
    assert got == want
