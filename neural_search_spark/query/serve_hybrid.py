"""Hybrid (dense + BM25) serving — the reference's primary search endpoint
without a cluster in the loop.

The reference's API search is *hybrid by default*: FAISS-flat dense cosine +
rank-bm25 sparse, min-max normalized and alpha-weighted per query
(``/root/reference/src/neural_search/api/search.py:21-135`` driving
``core/hybrid.py:175-220``). The cluster-side analog here is
``plans/engine.py:SearchEngine.search(hybrid=True)``; this module is the
*serving-replica* form of the same plan:

  * ``DenseReader`` — the FAISS-flat analog: a (doc_id, embedding) parquet
    (written by ``functions/embed.py:hash_embedding`` or any real encoder's
    batch job) loaded into an in-RAM numpy matrix, exact cosine top-k with
    the same left-to-right float arithmetic as the cluster's
    ``operators/similarity.py:cosine_col``, so scores agree bit-for-bit.
    Replica RAM bounds the matrix exactly like FAISS-flat bounds the
    reference (README.md:162-166 quotes 100K-doc latency); past RAM, the
    scale path is the Spark-side IVF (``operators/similarity.py:build_ivf``)
    with the replica holding only probed clusters.
  * ``HybridReader`` — ``SearchEngine.search(hybrid=True)`` policy,
    construct-for-construct (initial_k widening, sparse_k = 2 x dense hits,
    min-max with the all-equal -> 1.0 edge, alpha-weighted sum with a
    missing side contributing 0, dense-survivor cut, (score desc, doc_id)
    ranking) — asserted rank- and score-identical to the engine in
    tests/test_serve_hybrid.py.

Embedding the *query* at serving time is model inference; the default
``embed_fn`` is the deterministic hash-projection stand-in
(``functions/embed.py:hash_embed_py``, bit-identical to the Spark
expression), and a real encoder drops in as any ``text -> list[float]``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..config import DEFAULT_TOP_K, HYBRID_ALPHA
from ..functions.embed import hash_embed_py
from ..plans.engine import initial_k_policy
from .serve import IndexReader, round_half_up


@dataclass
class DenseReader:
    """Exact cosine top-k over an in-RAM embedding matrix (FAISS-flat analog)."""

    path: str
    ids: np.ndarray = field(init=False)
    mat: np.ndarray = field(init=False)
    norms: np.ndarray = field(init=False)

    def __post_init__(self) -> None:
        self.refresh()

    def refresh(self) -> None:
        import pyarrow.parquet as pq

        t = pq.read_table(self.path, columns=["doc_id", "embedding"])
        self.ids = np.asarray(t.column("doc_id"), dtype=np.int64)
        self.mat = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
        # sequential-over-dims accumulation = the cluster's left-to-right
        # F.aggregate fold, vectorized over docs — keeps norms bit-identical
        acc = np.zeros(len(self.ids), dtype=np.float64)
        for d in range(self.mat.shape[1]):
            acc = acc + self.mat[:, d] * self.mat[:, d]
        self.norms = np.sqrt(acc)

    def query(
        self, vec, top_k: int, rounding: int | None = None, allowed_docs=None
    ) -> list[tuple[int, float]]:
        """[(doc_id, cosine)] top_k, (score desc, doc_id asc).

        ``rounding`` rounds HALF_UP before the cut (the cluster injection
        path rounds dense scores the same way). Zero-norm rows (no tokens)
        have no defined cosine and are excluded. ``allowed_docs`` is the
        metadata-filter leg (the reference's vector store applies filter
        conditions natively, faiss_store.py): ids outside the set are
        dropped BEFORE the top-k cut.
        """
        q = np.asarray(vec, dtype=np.float64)
        qacc = 0.0
        for v in q:
            qacc += float(v * v)
        qn = float(np.sqrt(qacc))
        dot = np.zeros(len(self.ids), dtype=np.float64)
        for d in range(q.shape[0]):
            dot = dot + self.mat[:, d] * q[d]
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = dot / (self.norms * qn)
        ok = np.isfinite(cos)
        ids, cos = self.ids[ok], cos[ok]
        if allowed_docs is not None:
            allowed = np.unique(np.asarray(list(allowed_docs), dtype=np.int64))
            keep = np.isin(ids, allowed)
            ids, cos = ids[keep], cos[keep]
        if rounding is not None:
            cos = round_half_up(cos, rounding)
        sel = np.lexsort((ids, -cos))
        if ids.size > top_k:
            sel = sel[:top_k]
        return [(int(ids[i]), float(cos[i])) for i in sel]


def _minmax(hits: list[tuple[int, float]]) -> dict[int, float]:
    # hybrid.py:149-173 semantics: (s - min) / (max - min); all-equal -> 1.0
    if not hits:
        return {}
    ss = [s for _, s in hits]
    mn, mx = min(ss), max(ss)
    if mx == mn:
        return {d: 1.0 for d, _ in hits}
    return {d: (s - mn) / (mx - mn) for d, s in hits}


@dataclass
class HybridReader:
    """Single-query hybrid search over (IndexReader, DenseReader).

    ``search`` reproduces ``SearchEngine.search(hybrid=True)`` exactly —
    same candidate policy, same fusion arithmetic, same tie-breaks — so a
    serving replica and the cluster batch path give identical answers.
    """

    sparse: IndexReader
    dense: DenseReader
    embed_fn: object = hash_embed_py  # text -> list[float]; real encoder slots in

    def refresh(self) -> None:
        self.sparse.refresh()
        self.dense.refresh()

    def search(
        self,
        text: str,
        top_k: int = DEFAULT_TOP_K,
        alpha: float = HYBRID_ALPHA,
        score_rounding: int | None = None,
        dense_rounding: int | None = 6,
        allowed_docs=None,
    ) -> list[tuple[int, int, float]]:
        """[(rank, doc_id, fused_score)] — engine.search(hybrid=True) parity.

        ``score_rounding`` / ``dense_rounding`` are the equivalence-mode
        knobs: the cluster entry rounds sparse contributions to 4 and
        injected dense scores to 6 before any rank boundary; matching them
        here makes replica answers bit-identical to the cluster's.

        ``allowed_docs`` filters BOTH legs before their rank cuts — the
        reference applies filter conditions inside the vector store and the
        engine applies them to the sparse scores pre-rank, so the replica
        matches ``SearchEngine.search(filters=..., dense_results=<filtered>)``
        exactly (asserted in tests/test_serve_hybrid.py).
        """
        initial_k = initial_k_policy(top_k, hybrid=True, rerank=False)
        dense_hits = self.dense.query(
            self.embed_fn(text), initial_k, rounding=dense_rounding,
            allowed_docs=allowed_docs,
        )
        # sparse k = 2 x dense hits per query (hybrid.py:198); positive-only
        # cut on raw scores, rounding before the rank cut (engine._sparse)
        sparse_k = 2 * len(dense_hits)
        sparse_hits = (
            self.sparse.query(
                text, top_k=sparse_k, positive_only=True,
                score_rounding=score_rounding, allowed_docs=allowed_docs,
            )
            if sparse_k
            else []
        )
        dn, sn = _minmax(dense_hits), _minmax(sparse_hits)
        fused = [
            (d, alpha * dn.get(d, 0.0) + (1.0 - alpha) * sn.get(d, 0.0))
            for d in set(dn) | set(sn)
        ]
        fused.sort(key=lambda x: (-x[1], x[0]))
        fused = fused[:initial_k]
        # final filter: only docs present in the dense result set survive
        # (the reference silently drops BM25-only docs, search_engine.py:324-332)
        dense_ids = set(dn)
        surviving = [(d, s) for d, s in fused if d in dense_ids][:top_k]
        return [(r + 1, d, s) for r, (d, s) in enumerate(surviving)]


def write_doc_embeddings(
    corpus, out_path: str, id_col: str = "doc_id", text_col: str = "text"
) -> None:
    """Cluster-side batch job: (doc_id, embedding) parquet for DenseReader.

    Map-only (codegen expressions, no shuffle); with a real encoder this
    becomes the mapInPandas batch-inference job — the output contract is the
    same parquet.
    """
    from ..functions.embed import hash_embedding

    hash_embedding(corpus, text_col=text_col).select(
        id_col, "embedding"
    ).write.mode("overwrite").parquet(out_path)


__all__ = ["DenseReader", "HybridReader", "write_doc_embeddings"]
