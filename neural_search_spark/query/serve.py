"""Low-latency BM25 serving over the physical index — no Spark job per query.

The reference serves queries from in-process state: rank-bm25 arrays + FAISS
resident in the API worker (``/root/reference/src/neural_search/api/
search.py:21-135``), giving per-query millisecond latency but coupling
serving memory to corpus size and rebuilding everything on restart. Here the
durable artifact is the sharded compressed parquet index the Spark cluster
builds (index/build.py); ``IndexReader`` answers a query by reading ONLY the
query terms' posting blocks via pyarrow predicate pushdown (shard-partition
dirs + row-group statistics on the sorted ``term`` column), decoding them
with the same numpy codec, and scoring with bit-identical arithmetic to the
WAND kernel — so results are rank-identical to ``bm25_topk_wand`` and the
DataFrame batch path (asserted in tests/test_serve.py).

Deployment shape at scale:
  * one reader per serving replica; replicas are stateless — everything
    durable lives in the index files, so restart = reopen, and maintenance
    commits (index/maintenance.py) are picked up with ``refresh()``;
  * the term dictionary (term -> idf, vocabulary-sized) and corpus stats are
    cached in memory; per-shard doc_len arrays are loaded on first touch and
    cached (docs_per_shard x 4 bytes — bounded, shard-granular);
  * posting bytes are fetched on demand; hot terms ride the OS page cache /
    object-store CDN. A query touches O(|q| x df/block_size) blocks, never a
    full scan — the latency is decode + score of the query terms' postings.

This closes the serving story without a cluster in the loop: Spark owns
build/maintenance/batch analytics; serving needs only the parquet files.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np

from ..functions.tokenize import tokenize_py


@dataclass
class _ShardState:
    doc_len: np.ndarray  # dense doc_len array indexed by local doc id


@dataclass
class IndexReader:
    root: str
    stats: dict = field(init=False)
    idf: dict = field(init=False)
    docs_per_shard: int = field(init=False)
    _shards: dict = field(init=False, default_factory=dict)

    def __post_init__(self) -> None:
        self.refresh()

    # -- loading ------------------------------------------------------------

    def refresh(self) -> None:
        """(Re)load stats + term dictionary; drop cached shard state.

        Call after a maintenance commit to serve the new snapshot."""
        import pyarrow.parquet as pq

        srow = pq.read_table(os.path.join(self.root, "corpus_stats")).to_pylist()[0]
        self.stats = srow
        self.docs_per_shard = int(srow["docs_per_shard"])
        terms = pq.read_table(
            os.path.join(self.root, "term_stats"), columns=["term", "idf"]
        )
        self.idf = dict(
            zip(terms.column("term").to_pylist(), terms.column("idf").to_pylist())
        )
        self._shards = {}

    def _shard_state(self, shard: int) -> _ShardState:
        import pyarrow.parquet as pq

        st = self._shards.get(shard)
        if st is None:
            t = pq.read_table(
                os.path.join(self.root, "docmap", f"shard={shard}"),
                columns=["doc_id", "doc_len"],
            )
            dl = np.zeros(self.docs_per_shard, dtype=np.float64)
            local = np.asarray(t.column("doc_id"), dtype=np.int64) - shard * self.docs_per_shard
            dl[local] = np.asarray(t.column("doc_len"), dtype=np.float64)
            st = _ShardState(doc_len=dl)
            self._shards[shard] = st
        return st

    # -- querying -----------------------------------------------------------

    def query(
        self, text: str, top_k: int = 10, positive_only: bool = True
    ) -> list[tuple[int, float]]:
        """[(doc_id, score)] — exact BM25 top-k, (score desc, doc_id asc).

        Reads only the query terms' posting blocks (pyarrow filter pushdown:
        the ``term IN (...)`` predicate prunes shard files / row groups whose
        term-range statistics can't match), decodes with the shared codec,
        and scores each touched doc exactly — identical semantics to
        ``bm25_topk_wand(positive_only=...)`` for a single query.
        """
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from ..index.codec import decode_ints

        counts: dict[str, int] = {}
        for t in tokenize_py(text):
            counts[t] = counts.get(t, 0) + 1
        qterms = {
            t: (c, self.idf[t])
            for t, c in counts.items()
            if t in self.idf and (self.idf[t] != 0.0 or not positive_only)
        }
        if not qterms:
            return []

        k1, b = float(self.stats["k1"]), float(self.stats["b"])
        avgdl = float(self.stats["avgdl"])
        span = self.docs_per_shard

        table = pq.read_table(
            os.path.join(self.root, "postings"),
            columns=[
                "shard", "term", "block_id", "first_doc_id", "n_docs", "deltas", "tfs",
            ],
            filters=pc.field("term").isin(list(qterms)),
        )
        rows = table.to_pylist()
        # accumulate per-shard dense score arrays (shards touched by >=1 term)
        acc: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        by_key: dict[tuple[int, str], list[dict]] = {}
        for r in rows:
            by_key.setdefault((int(r["shard"]), r["term"]), []).append(r)
        for (shard, term), blocks in by_key.items():
            qtf, idf = qterms[term]
            base = shard * span
            st = self._shard_state(shard)
            if shard not in acc:
                acc[shard] = (
                    np.zeros(span, dtype=np.float64),
                    np.zeros(span, dtype=bool),
                )
            scores, touched = acc[shard]
            blocks.sort(key=lambda x: int(x["block_id"]))
            prev = base
            for blk in blocks:
                n = int(blk["n_docs"])
                deltas = decode_ints(bytes(blk["deltas"]), n).astype(np.int64)
                ids = np.cumsum(deltas) + prev
                prev = int(ids[-1])
                tfs = decode_ints(bytes(blk["tfs"]), n).astype(np.float64)
                loc = ids - base
                denom = tfs + k1 * (1.0 - b + b * st.doc_len[loc] / avgdl)
                scores[loc] += qtf * idf * (tfs * (k1 + 1.0) / denom)
                touched[loc] = True

        out_ids: list[np.ndarray] = []
        out_scores: list[np.ndarray] = []
        for shard, (scores, touched) in acc.items():
            loc = np.flatnonzero(touched)
            s = scores[loc]
            if positive_only:
                pos = s > 0
                loc, s = loc[pos], s[pos]
            out_ids.append(loc + shard * span)
            out_scores.append(s)
        if not out_ids:
            return []
        ids = np.concatenate(out_ids)
        scores = np.concatenate(out_scores)
        if ids.size > top_k:
            sel = np.lexsort((ids, -scores))[:top_k]
        else:
            sel = np.lexsort((ids, -scores))
        return [(int(ids[i]), float(scores[i])) for i in sel]
