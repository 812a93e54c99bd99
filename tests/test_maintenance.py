"""Incremental add/remove must be logically identical to a fresh build of the
updated corpus: same global stats, same per-term df/idf, and WAND top-k with
the same (url, score) results. doc_ids may differ between the two indexes
(incremental appends at the end; a fresh build renumbers by url order), so
comparisons go through urls."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neural_search_spark.config import IndexLayout
from neural_search_spark.corpus import corpus_df, queries_df
from neural_search_spark.index.build import build_index
from neural_search_spark.index.maintenance import (
    add_documents,
    decode_shard_postings,
    remove_documents,
)
from neural_search_spark.query.bm25_wand import bm25_topk_wand

LAYOUT = IndexLayout(docs_per_shard=64, block_size=16)


def _stats_equal(a, b):
    assert a.stats.n_docs == b.stats.n_docs
    assert a.stats.avgdl == pytest.approx(b.stats.avgdl, rel=1e-12)
    assert a.stats.average_idf == pytest.approx(b.stats.average_idf, rel=1e-12)
    ta = {r["term"]: (r["df"], r["idf"]) for r in a.terms.collect()}
    tb = {r["term"]: (r["df"], r["idf"]) for r in b.terms.collect()}
    assert set(ta) == set(tb)
    for t, (df_a, idf_a) in ta.items():
        assert df_a == tb[t][0], t
        assert idf_a == pytest.approx(tb[t][1], rel=1e-12), t


def _topk_by_url(spark, idx, queries):
    res = bm25_topk_wand(idx, queries, positive_only=False)
    with_url = res.join(idx.docmap.select("doc_id", "url"), "doc_id")
    out: dict = {}
    for r in with_url.collect():
        out.setdefault(r["query_id"], set()).add((r["url"], round(r["score"], 9)))
    return out


def test_add_documents_equals_fresh_build(spark, tmp_path):
    full = corpus_df(spark, n_docs=150, seed=42)
    # initial corpus: first 120 urls; batch: the remaining 30
    urls = sorted(r["url"] for r in full.select("url").collect())
    initial_urls, new_urls = urls[:120], urls[120:]
    initial = full.where(F.col("url").isin(initial_urls))
    batch = full.where(F.col("url").isin(new_urls))

    out = str(tmp_path / "incr")
    build_index(initial, out, layout=LAYOUT, n_buckets=8)
    incr = add_documents(full, out, batch)

    fresh = build_index(full, str(tmp_path / "fresh"), layout=LAYOUT, n_buckets=8)
    _stats_equal(incr, fresh)
    q = queries_df(spark)
    assert _topk_by_url(spark, incr, q) == _topk_by_url(spark, fresh, q)


def test_add_documents_rebuilds_only_affected_shards(spark, tmp_path):
    full = corpus_df(spark, n_docs=150, seed=42)
    urls = sorted(r["url"] for r in full.select("url").collect())
    initial = full.where(F.col("url").isin(urls[:128]))  # exactly 2 shards
    batch = full.where(F.col("url").isin(urls[128:]))

    out = str(tmp_path / "incr")
    first = build_index(initial, out, layout=LAYOUT, n_buckets=8)
    shard0_before = sorted(
        (r["term"], r["block_id"], bytes(r["deltas"]))
        for r in first.postings.where("shard = 0").collect()
    )
    incr = add_documents(full, out, batch)
    shard0_after = sorted(
        (r["term"], r["block_id"], bytes(r["deltas"]))
        for r in incr.postings.where("shard = 0").collect()
    )
    # 128 docs fill shards 0-1 exactly; the 22-doc batch lands in shard 2+
    # and shard 0's compressed blocks are byte-identical (never re-encoded)
    assert shard0_before == shard0_after


def test_remove_documents_equals_fresh_build(spark, tmp_path):
    full = corpus_df(spark, n_docs=150, seed=42)
    urls = sorted(r["url"] for r in full.select("url").collect())
    removed_urls = urls[40:55]  # middle of shard 0/1
    remaining = full.where(~F.col("url").isin(removed_urls))

    out = str(tmp_path / "incr")
    build_index(full, out, layout=LAYOUT, n_buckets=8)
    incr = remove_documents(remaining, out, removed_urls)

    fresh = build_index(remaining, str(tmp_path / "fresh"), layout=LAYOUT, n_buckets=8)
    _stats_equal(incr, fresh)
    q = queries_df(spark)
    assert _topk_by_url(spark, incr, q) == _topk_by_url(spark, fresh, q)


def test_remove_then_add_roundtrip(spark, tmp_path):
    full = corpus_df(spark, n_docs=100, seed=42)
    urls = sorted(r["url"] for r in full.select("url").collect())
    victim = urls[10:20]
    remaining = full.where(~F.col("url").isin(victim))
    victim_docs = full.where(F.col("url").isin(victim))

    out = str(tmp_path / "idx")
    build_index(full, out, layout=LAYOUT, n_buckets=8)
    remove_documents(remaining, out, victim)
    idx = add_documents(full, out, victim_docs)

    fresh = build_index(full, str(tmp_path / "fresh"), layout=LAYOUT, n_buckets=8)
    _stats_equal(idx, fresh)
    q = queries_df(spark)
    assert _topk_by_url(spark, idx, q) == _topk_by_url(spark, fresh, q)


def test_decode_shard_postings_is_lossless(spark, tmp_path):
    from neural_search_spark.functions.tokenize import doc_terms
    from neural_search_spark.index.docmap import assign_doc_ids

    corpus = corpus_df(spark, n_docs=100, seed=42)
    idx = build_index(corpus, str(tmp_path / "idx"), layout=LAYOUT, n_buckets=8)
    shards = [r["shard"] for r in idx.postings.select("shard").distinct().collect()]
    got = {
        (r["doc_id"], r["term"]): r["tf"]
        for r in decode_shard_postings(idx, shards).collect()
    }
    want = {
        (r["doc_id"], r["term"]): r["tf"]
        for r in doc_terms(assign_doc_ids(corpus)).collect()
    }
    assert got == want


def test_add_documents_is_idempotent(spark, tmp_path):
    """Re-running the same batch (crash-recovery / at-least-once delivery)
    must be a no-op: already-committed urls are dropped before any mutation,
    so docmap rows and df deltas are never double-applied."""
    full = corpus_df(spark, n_docs=120, seed=42)
    urls = sorted(r["url"] for r in full.select("url").collect())
    initial = full.where(F.col("url").isin(urls[:100]))
    batch = full.where(F.col("url").isin(urls[100:]))

    out = str(tmp_path / "idx")
    build_index(initial, out, layout=LAYOUT, n_buckets=8)
    once = add_documents(full, out, batch)
    stats_once = (once.stats.n_docs, once.stats.avgdl, once.stats.average_idf)

    twice = add_documents(full, out, batch)  # same batch again
    assert (twice.stats.n_docs, twice.stats.avgdl, twice.stats.average_idf) == stats_once
    assert twice.docmap.count() == 120
    assert twice.docmap.select("url").distinct().count() == 120

    fresh = build_index(full, str(tmp_path / "fresh"), layout=LAYOUT, n_buckets=8)
    _stats_equal(twice, fresh)
    q = queries_df(spark)
    assert _topk_by_url(spark, twice, q) == _topk_by_url(spark, fresh, q)
