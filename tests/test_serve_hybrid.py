"""Hybrid serving (query/serve_hybrid.py): engine parity + embed twin.

The contract: a serving replica running HybridReader over the parquet index
+ embeddings returns EXACTLY what the cluster's SearchEngine.search(
hybrid=True) returns for the same query — same docs, same fused scores,
same tie order — with the deterministic hash-embedding stand-in on both
sides (the reference's own tests inject a fake encoder the same way,
tests/conftest.py:106-141).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from neural_search_spark.config import IndexLayout
from neural_search_spark.corpus import write_corpus_parquet
from neural_search_spark.functions.embed import hash_embed_py, hash_embedding
from neural_search_spark.index.build import build_index
from neural_search_spark.index.docmap import assign_doc_ids
from neural_search_spark.index.stats import build_logical_index
from neural_search_spark.operators.similarity import cosine_col
from neural_search_spark.plans.engine import SearchEngine, initial_k_policy
from neural_search_spark.query.serve import IndexReader
from neural_search_spark.query.serve_hybrid import (
    DenseReader,
    HybridReader,
    write_doc_embeddings,
)

TOP_K = 10
# NOTE: all of these hash-embed to nonzero vectors ("w0005 w0010" does not —
# its two tokens share a bucket with opposite signs; the cluster injection
# path rejects zero-norm queries under ANSI division, so a real deployment
# would too, and DenseReader documents the exclusion)
QUERIES = ["w0004 w0008", "w0001", "w0000 w0002 w0007", "nosuchterm w0003"]


def test_hash_embed_py_matches_spark(spark):
    texts = [
        "w0005 w0010 hello world",
        "The QUICK brown-fox; jumps_over 42 lazy dogs!",
        "",
        "repeat repeat repeat",
        "punct.,;:!?-only &&& ###",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i int, text string")
    got = {
        r["i"]: list(r["embedding"])
        for r in hash_embedding(df).select("i", "embedding").collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == hash_embed_py(t), t  # exact doubles, not approx


@pytest.fixture(scope="module")
def stack(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("hybrid_serve")
    corpus_path = str(root / "corpus")
    write_corpus_parquet(spark, corpus_path, n_docs=300)
    corpus = assign_doc_ids(spark.read.parquet(corpus_path)).select(
        "doc_id", "url", "text"
    )
    idx_dir = str(root / "idx")
    build_index(
        corpus, idx_dir, id_col="doc_id",
        layout=IndexLayout(docs_per_shard=64, block_size=16), n_buckets=8,
    )
    emb_dir = str(root / "emb")
    write_doc_embeddings(corpus, emb_dir)
    logical = build_logical_index(corpus, id_col="doc_id", persist=True)
    engine = SearchEngine(
        doc_terms=logical.doc_terms, terms=logical.terms, stats=logical.stats
    )
    reader = HybridReader(sparse=IndexReader(idx_dir), dense=DenseReader(emb_dir))
    return corpus, engine, reader


def _engine_dense(spark, corpus, queries_df, initial_k):
    """The cluster injection path: hash-embed cosine, rounded 6, top initial_k
    (mirrors plans/driver_entry.py:_hash_dense)."""
    docs_e = hash_embedding(corpus).select("doc_id", F.col("embedding").alias("dv"))
    q_e = hash_embedding(
        queries_df.select("query_id", F.col("query_text").alias("text"))
    ).select("query_id", F.col("embedding").alias("qv"))
    scored = docs_e.crossJoin(F.broadcast(q_e)).select(
        "query_id", "doc_id",
        F.round(cosine_col(F.col("dv"), F.col("qv")), 6).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= initial_k)
        .select("query_id", "doc_id", "score")
    )


def test_dense_reader_matches_cluster_injection(spark, stack):
    corpus, _, reader = stack
    initial_k = initial_k_policy(TOP_K, hybrid=True, rerank=False)
    qdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(QUERIES)], "query_id int, query_text string"
    )
    expect: dict[int, list] = {i: [] for i in range(len(QUERIES))}
    for r in _engine_dense(spark, corpus, qdf, initial_k).collect():
        expect[r["query_id"]].append((r["doc_id"], r["score"]))
    for i, t in enumerate(QUERIES):
        got = reader.dense.query(hash_embed_py(t), initial_k, rounding=6)
        assert got == sorted(expect[i], key=lambda x: (-x[1], x[0])), t


def test_hybrid_reader_matches_engine(spark, stack):
    corpus, engine, reader = stack
    initial_k = initial_k_policy(TOP_K, hybrid=True, rerank=False)
    qdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(QUERIES)], "query_id int, query_text string"
    )
    res = engine.search(
        qdf,
        top_k=TOP_K,
        hybrid=True,
        alpha=0.5,
        dense_results=_engine_dense(spark, corpus, qdf, initial_k),
        score_rounding=4,
    )
    expect: dict[int, list] = {i: [] for i in range(len(QUERIES))}
    for r in res.orderBy("query_id", "rank").collect():
        expect[r["query_id"]].append((r["rank"], r["doc_id"], r["score"]))
    for i, t in enumerate(QUERIES):
        got = reader.search(t, top_k=TOP_K, alpha=0.5, score_rounding=4)
        assert [(rk, d) for rk, d, _ in got] == [(rk, d) for rk, d, _ in expect[i]], t
        for (_, _, gs), (_, _, es) in zip(got, expect[i]):
            assert gs == es, (t, gs, es)  # identical arithmetic -> identical floats


def test_hybrid_reader_filtered_matches_engine(spark, stack):
    """allowed_docs == engine filters + a dense injection computed over the
    allowed set (the reference's vector store filters during search, so the
    dense top-k is the top-k OF the allowed set on both sides)."""
    corpus, engine, reader = stack
    from neural_search_spark.plans.engine import SearchEngine

    metadata = corpus.select("doc_id", (F.col("doc_id") % 3).alias("grp"))
    engine_f = SearchEngine(
        doc_terms=engine.doc_terms, terms=engine.terms, stats=engine.stats,
        metadata=metadata,
    )
    allowed = [r["doc_id"] for r in metadata.where("grp = 1").collect()]
    initial_k = initial_k_policy(TOP_K, hybrid=True, rerank=False)
    qdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(QUERIES)], "query_id int, query_text string"
    )
    dense_allowed = _engine_dense(
        spark, corpus.where(F.col("doc_id") % 3 == 1), qdf, initial_k
    )
    res = engine_f.search(
        qdf, top_k=TOP_K, hybrid=True, alpha=0.5,
        dense_results=dense_allowed,
        filters={"grp": {"$eq": 1}},
        score_rounding=4,
    )
    expect: dict[int, list] = {i: [] for i in range(len(QUERIES))}
    for r in res.orderBy("query_id", "rank").collect():
        expect[r["query_id"]].append((r["rank"], r["doc_id"], r["score"]))
    for i, t in enumerate(QUERIES):
        got = reader.search(
            t, top_k=TOP_K, alpha=0.5, score_rounding=4, allowed_docs=allowed
        )
        assert got == expect[i], t
        assert all(d % 3 == 1 for _, d, _ in got)


def test_hybrid_unknown_sparse_terms_still_dense(stack):
    """A query with no indexed terms degrades to dense-only, like the engine."""
    _, _, reader = stack
    got = reader.search("zzzzunknown qqqnope", top_k=5)
    assert len(got) == 5  # dense side always has candidates
    assert [r for r, _, _ in got] == [1, 2, 3, 4, 5]
