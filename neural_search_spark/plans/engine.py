"""Search orchestration — the reference's control-flow "planner" as a
DataFrame plan builder (``/root/reference/src/neural_search/core/
search_engine.py:232-350``).

Reproduced policy (search_engine.py:271-276, 322-332):
  * initial_k = top_k; if rerank: min(rerank_top_k=50, top_k*5);
    if hybrid: max(initial_k, top_k*2)
  * hybrid: sparse BM25 is fetched with k = 2 x (dense hits per query)
    (hybrid.py:198), both sides min-max normalized, weighted by alpha
  * final cut: only docs present in the *dense* result set survive — the
    reference silently drops BM25-only docs from hybrid output (:324-332)
  * metadata filters: the reference post-filters an x10-oversampled dense
    search (faiss_store.py:292,311-313); here filters compile to Column
    predicates applied to the candidate set (pushdown, no oversampling)

Dense scoring itself is model inference (out of north-rule scope): dense
results are *injected* as a (query_id, doc_id, score) DataFrame, exactly like
the reference's own unit tests inject them (tests/test_search/test_hybrid.py).
With no dense input the engine runs the pure sparse path.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import DEFAULT_TOP_K, HYBRID_ALPHA, RERANK_TOP_K, RRF_K
from ..operators.filters import compile_filters
from ..operators.fusion import hybrid_fuse
from ..query.bm25_dataframe import bm25_scores, rank_topk


def initial_k_policy(top_k: int, hybrid: bool, rerank: bool) -> int:
    initial_k = top_k
    if rerank:
        initial_k = min(RERANK_TOP_K, top_k * 5)
    if hybrid:
        initial_k = max(initial_k, top_k * 2)
    return initial_k


@dataclass
class SearchEngine:
    """Facade over the logical index (doc_terms + term_stats + stats)."""

    doc_terms: DataFrame
    terms: DataFrame
    stats: object  # CorpusStats
    metadata: DataFrame | None = None  # (doc_id, <metadata columns...>)

    def get_stats(self) -> dict:
        """I6 parity (/root/reference/src/neural_search/core/hybrid.py:268-280)."""
        return {
            "num_documents": self.stats.n_docs,
            "has_index": True,
            "k1": self.stats.k1,
            "b": self.stats.b,
            "alpha": HYBRID_ALPHA,
        }

    def _sparse(
        self,
        queries: DataFrame,
        filters: dict | None,
        score_rounding: int | None = None,
    ) -> DataFrame:
        per_doc = bm25_scores(self.doc_terms, self.terms, queries, stats=self.stats)
        if filters:
            if self.metadata is None:
                raise ValueError("filters given but no metadata DataFrame attached")
            allowed = self.metadata.where(compile_filters(filters)).select("doc_id")
            per_doc = per_doc.join(allowed, "doc_id")  # pushdown-friendly semi-ish join
        if score_rounding is not None:
            per_doc = per_doc.withColumn("score", F.round("score", score_rounding))
        return per_doc

    def _apply_rerank(self, candidates, queries, reranker, top_k: int) -> DataFrame:
        """Rescore the initial_k candidate set and cut to the final top_k.

        Reference flow (``core/reranker.py:53-101`` driven by
        ``search_engine.py``): the cross-encoder scores every (query,
        candidate) pair and the final order is rerank-score descending.
        ``reranker(candidates(query_id, doc_id), queries) -> (query_id,
        doc_id, score)`` — the injected-scorer seam where a model runtime
        plugs in; a deterministic stand-in lives in functions/embed.py.
        """
        rr = reranker(candidates.select("query_id", "doc_id"), queries)
        w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
        return (
            rr.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= top_k)
            .select("query_id", "rank", "doc_id", "score")
        )

    def search(
        self,
        queries: DataFrame,
        top_k: int = DEFAULT_TOP_K,
        hybrid: bool = False,
        alpha: float = HYBRID_ALPHA,
        rerank: bool = False,
        filters: dict | None = None,
        dense_results: DataFrame | None = None,
        score_rounding: int | None = None,
        reranker=None,
    ) -> DataFrame:
        """(query_id, rank, doc_id, score) per query.

        ``score_rounding``: round sparse per-doc scores to this many decimals
        before any rank cut. Engine-equivalence mode: with it, every rank
        boundary in the plan is decided on rounded values with the doc_id
        tie-break, so an independent engine (the DuckDB oracle) computing the
        same plan reproduces results bit-for-bit — a 1-ulp libm divergence
        cannot flip a cut. Default None = raw scores (reference behavior).

        ``rerank=True`` widens initial_k per the reference policy; if a
        ``reranker`` scorer is also given, the candidate set is rescored and
        the final order is rerank-score descending (without one, the widened
        candidate fetch alone is preserved — reranking needs a model runtime,
        see ``rerank_hook``).
        """
        initial_k = initial_k_policy(top_k, hybrid, rerank)
        queries_k = queries.withColumn("top_k", F.lit(initial_k))

        if not hybrid or dense_results is None:
            # pure sparse path (plus optional injected-dense-only mode)
            if dense_results is not None and not hybrid:
                base = dense_results
                if filters:
                    allowed = self.metadata.where(compile_filters(filters)).select("doc_id")
                    base = base.join(allowed, "doc_id")
                base = base.withColumn("top_k", F.lit(initial_k))
                ranked = rank_topk(base)
            else:
                ranked = rank_topk(self._sparse(queries_k, filters, score_rounding))
            if rerank and reranker is not None:
                return self._apply_rerank(ranked, queries, reranker, top_k)
            return ranked.where(F.col("rank") <= top_k)

        # hybrid: sparse k = 2 x dense hits per query (hybrid.py:198)
        dense_k = dense_results.groupBy("query_id").agg(
            (F.count(F.lit(1)) * 2).alias("sparse_k")
        )
        sparse_all = self._sparse(queries, filters, score_rounding).join(
            F.broadcast(dense_k), "query_id", "left"
        )
        w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
        sparse = (
            sparse_all.withColumn("r", F.row_number().over(w))
            .where(F.col("r") <= F.coalesce(F.col("sparse_k"), F.lit(0)))
            .select("query_id", "doc_id", "score")
        )
        fused = hybrid_fuse(
            dense_results.select("query_id", "doc_id", "score"),
            sparse,
            alpha=alpha,
            top_k=initial_k,
        )
        # final filter: only docs present in the dense result set survive
        dense_ids = dense_results.select("query_id", "doc_id").distinct()
        surviving = fused.join(dense_ids, ["query_id", "doc_id"])
        if rerank and reranker is not None:
            return self._apply_rerank(surviving, queries, reranker, top_k)
        w2 = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
        return (
            surviving.withColumn("rank", F.row_number().over(w2))
            .where(F.col("rank") <= top_k)
            .select("query_id", "rank", "doc_id", "score")
        )

    def rerank_hook(self, candidates: DataFrame, queries: DataFrame) -> DataFrame:
        """Q8 cross-encoder rerank with a REAL model is out of scope here.

        The orchestration seam is ``search(rerank=True, reranker=...)`` —
        exercised end-to-end (and oracle-checked) with the deterministic
        hash-embedding scorer from functions/embed.py. This hook raises for
        the real-model case, mirroring the scope decision in SURVEY §7.0.
        """
        raise NotImplementedError(
            "cross-encoder reranking requires a model runtime; see SURVEY.md §7.0 "
            "and search(reranker=...) for the injectable-scorer seam"
        )
