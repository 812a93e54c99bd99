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
    full scan — the latency is decode + score of the query terms' postings;
  * optionally, a ``TtlLruCache`` (query/cache.py, the reference's
    ``utils/cache.py`` analog) caches decoded per-term posting arrays and
    whole search results, keyed by the index snapshot token so a maintenance
    commit + ``refresh()`` invalidates immediately.

This closes the serving story without a cluster in the loop: Spark owns
build/maintenance/batch analytics; serving needs only the parquet files.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass, field

import numpy as np

from ..config import MAX_TOP_K
from ..functions.tokenize import _TOKEN_RE, tokenize_py
from .cache import TtlLruCache


def round_half_up(values: np.ndarray, digits: int) -> np.ndarray:
    """Element-wise HALF_UP decimal rounding, identical to Spark's ``F.round``.

    Spark rounds via ``BigDecimal.valueOf(double)`` (shortest decimal
    representation) with HALF_UP; ``Decimal(repr(x))`` is the same shortest
    representation, so quantizing it HALF_UP reproduces Spark bit-for-bit —
    numpy's ``round`` (half-to-even on binary floats) does not. Used only in
    engine-equivalence mode (``score_rounding``), not in the raw hot path.
    """
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-digits)
    return np.array(
        [float(Decimal(repr(float(v))).quantize(q, rounding=ROUND_HALF_UP)) for v in values],
        dtype=np.float64,
    )


def _deletion_variants(term: str) -> set[str]:
    """The term plus every drop-one-character string (SymSpell distance-1
    neighborhood; mirrors query/suggest.py:deletion_variants)."""
    return {term} | {term[:i] + term[i + 1 :] for i in range(len(term))}


def _levenshtein(s: str, t: str) -> int:
    d = list(range(len(t) + 1))
    for i, cs in enumerate(s, 1):
        prev, d[0] = d[0], i
        for j, ct in enumerate(t, 1):
            prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1, prev + (cs != ct))
    return d[-1]


@dataclass
class _ShardState:
    doc_len: np.ndarray  # dense doc_len array indexed by local doc id
    host: np.ndarray | None = None  # dense url-host array, loaded lazily


@dataclass
class IndexReader:
    root: str
    cache: TtlLruCache | None = None
    corpus_path: str | None = None
    stats: dict = field(init=False)
    idf: dict = field(init=False)
    df: dict = field(init=False)
    docs_per_shard: int = field(init=False)
    _suggest_index: dict | None = field(init=False, default=None)
    snapshot: str = field(init=False, default="")
    _shards: dict = field(init=False, default_factory=dict)

    def __post_init__(self) -> None:
        self.refresh()

    # -- loading ------------------------------------------------------------

    def refresh(self) -> None:
        """(Re)load stats + term dictionary; drop cached shard state.

        Call after a maintenance commit to serve the new snapshot. The
        snapshot token (md5 of the checkpoint manifest, whose atomic rename
        is the index's commit point — index/build.py:_write_checkpoint)
        scopes every cache key, so entries for the previous snapshot can
        never be served again; they age out of the LRU."""
        import pyarrow.parquet as pq

        ckpt = os.path.join(self.root, "_checkpoint.json")
        if os.path.exists(ckpt):
            with open(ckpt, "rb") as f:
                self.snapshot = hashlib.md5(f.read()).hexdigest()
        else:
            self.snapshot = ""
        srow = pq.read_table(os.path.join(self.root, "corpus_stats")).to_pylist()[0]
        self.stats = srow
        self.docs_per_shard = int(srow["docs_per_shard"])
        terms = pq.read_table(
            os.path.join(self.root, "term_stats"), columns=["term", "df", "idf"]
        )
        self.idf = dict(
            zip(terms.column("term").to_pylist(), terms.column("idf").to_pylist())
        )
        self.df = dict(
            zip(terms.column("term").to_pylist(), terms.column("df").to_pylist())
        )
        self._shards = {}
        self._suggest_index = None

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

    def _hosts_for(self, ids: np.ndarray) -> np.ndarray:
        """URL host per doc_id (same extraction rule as
        ``functions/urls.py:RE_HOST``; non-URL ids get ''), via lazily
        cached dense per-shard host arrays from the docmap."""
        import re

        import pyarrow.parquet as pq

        from ..functions.urls import RE_HOST

        host_re = re.compile(RE_HOST)
        span = self.docs_per_shard
        out = np.empty(ids.shape, dtype=object)
        for shard in np.unique(ids // span):
            st = self._shard_state(int(shard))
            if st.host is None:
                t = pq.read_table(
                    os.path.join(self.root, "docmap", f"shard={int(shard)}"),
                    columns=["doc_id", "url"],
                )
                dense = np.full(span, "", dtype=object)
                local = (
                    np.asarray(t.column("doc_id"), dtype=np.int64) - shard * span
                )
                hosts = [
                    (m.group(1) if (m := host_re.match(u or "")) else "")
                    for u in t.column("url").to_pylist()
                ]
                dense[local] = hosts
                st.host = dense
            sel = ids // span == shard
            out[sel] = st.host[ids[sel] - shard * span]
        return out

    def _postings_for(self, terms: list[str]) -> dict:
        """term -> [(shard, doc_ids, tfs)] (shards ascending), decoded.

        Reads only the missing terms' blocks (pyarrow filter pushdown: the
        ``term IN (...)`` predicate prunes shard files / row groups whose
        term-range statistics can't match) and decodes with the shared
        codec; terms already in the cache skip both the read and the decode.
        """
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from ..index.codec import decode_ints_many

        out: dict = {}
        missing: list[str] = []
        for t in terms:
            if self.cache is not None:
                hit = self.cache.get(TtlLruCache.make_postings_key(t, self.snapshot))
                if hit is not None:
                    out[t] = hit
                    continue
            missing.append(t)
        if not missing:
            return out

        span = self.docs_per_shard
        table = pq.read_table(
            os.path.join(self.root, "postings"),
            columns=[
                "shard", "term", "block_id", "first_doc_id", "n_docs", "deltas", "tfs",
            ],
            filters=pc.field("term").isin(missing),
        )
        by_key: dict = {}
        for r in table.to_pylist():
            by_key.setdefault((r["term"], int(r["shard"])), []).append(r)
        per_term: dict = {t: [] for t in missing}
        # one batched decode across EVERY block of every missing term: the
        # per-call decode overhead (not the bit twiddling) dominated cold
        # reads — see codec.decode_ints_many
        groups = []
        bufs: list = []
        cnts: list[int] = []
        for (term, shard), blocks in sorted(by_key.items()):
            blocks.sort(key=lambda x: int(x["block_id"]))
            counts = [int(b["n_docs"]) for b in blocks]
            groups.append((term, shard, len(blocks), counts))
            bufs.extend(b["deltas"] for b in blocks)
            bufs.extend(b["tfs"] for b in blocks)
            cnts.extend(counts)
            cnts.extend(counts)
        streams = decode_ints_many(bufs, cnts)
        pos = 0
        for term, shard, nblk, counts in groups:
            deltas = np.concatenate(streams[pos : pos + nblk]).astype(np.int64)
            tfs = np.concatenate(streams[pos + nblk : pos + 2 * nblk]).astype(
                np.float64
            )
            pos += 2 * nblk
            # block b's first delta is relative to block b-1's last id, so a
            # single cumsum from the shard base reconstructs every id
            ids = np.cumsum(deltas) + shard * span
            per_term[term].append((shard, ids, tfs))
        for t in missing:
            out[t] = per_term[t]
            if self.cache is not None:
                self.cache.set(TtlLruCache.make_postings_key(t, self.snapshot), out[t])
        return out

    def _positions_for(self, terms: list[str]) -> dict:
        """term -> [(shard, doc_ids, pos_lists)] from a positional index.

        Same pushdown-pruned read shape as ``_postings_for`` plus the
        positions stream; cached under a ``pos:``-prefixed keyspace so flat
        posting entries never collide."""
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from ..index.codec import decode_ints, decode_position_lists

        out: dict = {}
        missing: list[str] = []
        for t in terms:
            if self.cache is not None:
                hit = self.cache.get(
                    TtlLruCache.make_postings_key(f"pos:{t}", self.snapshot)
                )
                if hit is not None:
                    out[t] = hit
                    continue
            missing.append(t)
        if not missing:
            return out

        span = self.docs_per_shard
        table = pq.read_table(
            os.path.join(self.root, "postings"),
            columns=[
                "shard", "term", "block_id", "n_docs", "deltas", "tfs", "positions",
            ],
            filters=pc.field("term").isin(missing),
        )
        by_key: dict = {}
        for r in table.to_pylist():
            by_key.setdefault((r["term"], int(r["shard"])), []).append(r)
        per_term: dict = {t: [] for t in missing}
        for (term, shard), blocks in sorted(by_key.items()):
            blocks.sort(key=lambda x: int(x["block_id"]))
            prev = shard * span
            ids_parts, pos_parts = [], []
            for blk in blocks:
                n = int(blk["n_docs"])
                deltas = decode_ints(bytes(blk["deltas"]), n).astype(np.int64)
                ids = np.cumsum(deltas) + prev
                prev = int(ids[-1])
                tfs = decode_ints(bytes(blk["tfs"]), n).astype(np.int64)
                ids_parts.append(ids)
                pos_parts.extend(decode_position_lists(bytes(blk["positions"]), tfs))
            per_term[term].append((shard, np.concatenate(ids_parts), pos_parts))
        for t in missing:
            out[t] = per_term[t]
            if self.cache is not None:
                self.cache.set(
                    TtlLruCache.make_postings_key(f"pos:{t}", self.snapshot), out[t]
                )
        return out

    def query_phrase(self, text: str, top_k: int = 10) -> list[tuple[int, int]]:
        """[(doc_id, phrase_tf)] — exact-phrase retrieval from the positional
        index, (phrase_tf desc, doc_id asc), identical semantics to the
        cluster operator ``query/phrase.py:phrase_topk`` (parity pinned in
        tests/test_serve.py). Requires an index built with
        ``store_positions=True``; query tokens pass through the index's
        bound analyzer like every other surface."""
        if not bool(self.stats.get("positional")):
            raise ValueError(
                "index stores no positions; rebuild with store_positions=True"
            )
        from ..functions.analyzers import analyze_tokens

        toks = analyze_tokens(
            tokenize_py(text), self.stats.get("analyzer") or ""
        )
        if not toks:
            return []
        distinct = sorted(set(toks))
        if any(t not in self.idf for t in distinct):
            return []  # a phrase containing an unknown term matches nothing
        pos = self._positions_for(distinct)
        # per-term doc -> positions map (concatenated over shards)
        by_term: dict[str, dict[int, np.ndarray]] = {}
        for t in distinct:
            m: dict[int, np.ndarray] = {}
            for _shard, ids, plists in pos[t]:
                for d, p in zip(ids.tolist(), plists):
                    m[d] = p
            by_term[t] = m
        # candidates: docs containing every distinct phrase term
        cand = set.intersection(*(set(by_term[t]) for t in distinct))
        hits: list[tuple[int, int]] = []
        for d in cand:
            inter: np.ndarray | None = None
            for off, t in enumerate(toks):
                shifted = by_term[t][d] - off
                inter = shifted if inter is None else np.intersect1d(
                    inter, shifted, assume_unique=True
                )
                if inter.size == 0:
                    break
            if inter is not None and inter.size:
                hits.append((d, int(inter.size)))
        hits.sort(key=lambda x: (-x[1], x[0]))
        return hits[:top_k]

    def query_near(
        self, text: str, max_span: int, top_k: int = 10, ordered: bool = False
    ) -> list[tuple[int, int]]:
        """[(doc_id, min_window)] — proximity (NEAR) from the positional
        index: smallest token window containing every distinct query term
        (``ordered=False``, the unordered min-cover of
        ``query/phrase.py:proximity_topk``) or the query terms IN ORDER
        (``ordered=True``, the chain DP of ``ordered_near_topk``); kept iff
        <= ``max_span``; (min_window asc, doc_id asc). Parity with the
        cluster operators pinned in tests/test_serve.py."""
        if not bool(self.stats.get("positional")):
            raise ValueError(
                "index stores no positions; rebuild with store_positions=True"
            )
        from ..functions.analyzers import analyze_tokens

        toks = analyze_tokens(
            tokenize_py(text), self.stats.get("analyzer") or ""
        )
        terms = sorted(set(toks))
        if not terms or any(t not in self.idf for t in terms):
            return []
        pos = self._positions_for(terms)
        by_term: dict[str, dict[int, np.ndarray]] = {}
        for t in terms:
            m: dict[int, np.ndarray] = {}
            for _shard, ids, plists in pos[t]:
                for d, p in zip(ids.tolist(), plists):
                    m[d] = p
            by_term[t] = m
        cand = set.intersection(*(set(by_term[t]) for t in terms))
        hits: list[tuple[int, int]] = []
        if ordered:
            # slots follow the QUERY token order (repeats = separate slots)
            slots = toks
            n = len(slots)
            for d in cand:
                occ = sorted(
                    (int(p), -slot)
                    for slot, t in enumerate(slots)
                    for p in by_term[t][d]
                )
                starts = [-1] * n
                best = None
                for p, nslot in occ:
                    slot = -nslot
                    prev = p if slot == 0 else starts[slot - 1]
                    if prev < 0:
                        continue
                    if starts[slot] < prev:
                        starts[slot] = prev
                    if slot == n - 1:
                        w = p - prev + 1
                        if best is None or w < best:
                            best = w
                if best is not None and best <= max_span:
                    hits.append((d, best))
        else:
            n = len(terms)
            for d in cand:
                occ = sorted(
                    (int(p), tid)
                    for tid, t in enumerate(terms)
                    for p in by_term[t][d]
                )
                last = [-1] * n
                best = None
                for p, tid in occ:
                    last[tid] = p
                    mn = min(last)
                    if mn >= 0:
                        w = p - mn + 1
                        if best is None or w < best:
                            best = w
                if best is not None and best <= max_span:
                    hits.append((d, best))
        hits.sort(key=lambda x: (x[1], x[0]))
        return hits[:top_k]

    def term_vector(self, doc_id: int, positions: bool = False) -> dict:
        """The ES ``_termvectors`` analog: a document's terms with tf (and,
        on a positional index, 1-based positions) recovered from the index
        alone — the posting blocks are lossless, so no document store is
        needed. Reads exactly one shard's posting files (the doc's shard
        directory) and decodes only blocks whose [first_doc_id,
        last_doc_id] range covers the doc.

        Returns {"doc_id", "doc_len", "terms": {term: tf | [positions]}};
        unknown doc_ids return an empty terms dict.
        """
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from ..index.codec import decode_ints, decode_position_lists

        if positions and not bool(self.stats.get("positional")):
            raise ValueError(
                "index stores no positions; rebuild with store_positions=True"
            )
        span = self.docs_per_shard
        shard = int(doc_id) // span
        shard_dir = os.path.join(self.root, "postings", f"shard={shard}")
        if not os.path.isdir(shard_dir):
            return {"doc_id": int(doc_id), "doc_len": 0, "terms": {}}
        cols = ["term", "block_id", "first_doc_id", "last_doc_id", "n_docs",
                "deltas", "tfs"] + (["positions"] if positions else [])
        table = pq.read_table(
            shard_dir,
            columns=cols,
            filters=(pc.field("first_doc_id") <= doc_id)
            & (pc.field("last_doc_id") >= doc_id),
        )
        terms: dict = {}
        for blk in table.to_pylist():
            n = int(blk["n_docs"])
            # block deltas are relative to the PREVIOUS block's last id; for
            # a direct block probe, reconstruct from first_doc_id instead
            deltas = decode_ints(bytes(blk["deltas"]), n).astype(np.int64)
            ids = np.cumsum(deltas) - int(deltas[0]) + int(blk["first_doc_id"])
            hit = np.flatnonzero(ids == int(doc_id))
            if hit.size == 0:
                continue
            tfs = decode_ints(bytes(blk["tfs"]), n).astype(np.int64)
            i = int(hit[0])
            if positions:
                plists = decode_position_lists(bytes(blk["positions"]), tfs)
                terms[blk["term"]] = [int(p) for p in plists[i]]
            else:
                terms[blk["term"]] = int(tfs[i])
        dl = self._shard_state(shard).doc_len[int(doc_id) - shard * span]
        return {"doc_id": int(doc_id), "doc_len": int(dl), "terms": terms}

    def explain(self, text: str, doc_id: int) -> dict:
        """The ES ``_explain`` analog, replica-side: why does ``doc_id``
        score what it scores for ``text``? Per-query-term tf / df / idf /
        length-normalized contribution rows, recovered from the index alone
        (one shard's posting blocks via ``term_vector`` + the term
        dictionary already in memory) — no Spark job, no document store.

        Returns {"doc_id", "doc_len", "score", "terms": [{term, tf, df,
        qtf, idf, contrib}, ...]} with the cluster operator's rounding
        contract (idf 6dp, contrib/score 4dp); rows match
        ``query/explain.py:bm25_explain`` for the same (query, doc) pair
        (pinned in tests/test_serve.py). Query tokens fold through the
        index's bound analyzer, exactly like ``query``.
        """
        from ..functions.analyzers import analyze_tokens

        counts: dict[str, int] = {}
        for t in analyze_tokens(tokenize_py(text), self.stats.get("analyzer") or ""):
            counts[t] = counts.get(t, 0) + 1
        tv = self.term_vector(int(doc_id))
        dl = float(tv["doc_len"])
        k1, b = float(self.stats["k1"]), float(self.stats["b"])
        avgdl = float(self.stats["avgdl"])
        rows = []
        score = 0.0
        for term in sorted(counts):
            if term not in self.idf or term not in tv["terms"]:
                continue
            tf = float(tv["terms"][term])
            qtf = counts[term]
            idf = float(self.idf[term])
            denom = tf + k1 * (1.0 - b + b * dl / avgdl)
            contrib = qtf * idf * (tf * (k1 + 1.0) / denom)
            score += contrib
            rows.append(
                {
                    "term": term,
                    "tf": int(tf),
                    "df": int(self.df[term]),
                    "qtf": int(qtf),
                    "idf": float(round_half_up(np.array([idf]), 6)[0]),
                    "contrib": float(round_half_up(np.array([contrib]), 4)[0]),
                }
            )
        return {
            "doc_id": int(doc_id),
            "doc_len": int(tv["doc_len"]),
            "score": float(round_half_up(np.array([score]), 4)[0]),
            "terms": rows,
        }

    def query_dsl(self, request: dict, positive_only: bool = False) -> list:
        """One declarative request object served replica-side — the SAME
        shape ``query/dsl.py:search_dsl`` compiles cluster-side (match /
        bool / match_phrase / prefix / wildcard / more_like_this, plus
        top_k / offset / search_after), so a caller's JSON runs on either
        tier with identical semantics (parity pinned in tests/test_serve.py).

        Forms that need document attributes or another similarity
        (``collapse`` / ``function_score`` / ``rescore`` / ``filter`` /
        ``similarity: lm_dirichlet``) stay cluster-side and raise here —
        route those requests to a Spark session.
        """
        q = request.get("query")
        if not isinstance(q, dict) or len(q) != 1:
            raise ValueError("request['query'] must be exactly one query kind")
        blocked = {"collapse", "function_score", "rescore", "filter"} & set(request)
        if blocked:
            raise ValueError(f"cluster-side-only request parts: {sorted(blocked)}")
        top_k = int(request.get("top_k", 10))
        # request-boundary bound, mirroring the reference's api/schemas.py:58-73
        # (top_k ∈ [1,100]); internal callers with a legitimate larger fetch
        # (e.g. the tie-margin) use the method APIs, not the request object
        if not 1 <= top_k <= MAX_TOP_K:
            raise ValueError(f"top_k must be in [1, {MAX_TOP_K}], got {top_k}")
        offset = int(request.get("offset", 0))
        sa = request.get("search_after")
        sa = (float(sa[0]), int(sa[1])) if sa is not None else None
        (kind, body), = q.items()
        if kind == "match":
            if isinstance(body, dict) and body.get("similarity", "bm25") != "bm25":
                raise ValueError("only the bm25 similarity serves replica-side")
            text = body["query"] if isinstance(body, dict) else str(body)
            return self.query(
                text, top_k=top_k, positive_only=positive_only,
                offset=offset, search_after=sa,
            )
        if kind == "bool":
            # boundary validation: a non-object body is a client error, not
            # an AttributeError crash (the serve loop only catches ValueError)
            if not isinstance(body, dict):
                raise ValueError("bool query body must be an object")
            text = " ".join(
                ["+" + t for t in body.get("must", [])]
                + ["-" + t for t in body.get("must_not", [])]
                + list(body.get("should", []))
            )
            return self.query_bool(
                text, top_k=top_k, positive_only=positive_only,
                offset=offset, search_after=sa,
                min_should_match=int(body.get("minimum_should_match", 0)),
            )
        if kind == "match_phrase":
            text = body["query"] if isinstance(body, dict) else str(body)
            slop = int(body.get("slop", 0)) if isinstance(body, dict) else 0
            if slop == 0:
                return self.query_phrase(text, top_k=top_k)
            n = len(tokenize_py(text))
            return self.query_near(text, max_span=n + slop, top_k=top_k, ordered=True)
        if kind in ("prefix", "wildcard"):
            if kind == "prefix":
                matched = sorted(t for t in self.idf if t.startswith(str(body)))
            else:
                import re as _re

                from .prefix import wildcard_regex

                rx = _re.compile(wildcard_regex(str(body)))
                matched = sorted(t for t in self.idf if rx.match(t))
            # same zero-idf gating as query(); each matched term scores once
            # with its own idf (the Lucene scoring-rewrite, = the cluster
            # expansion join with qtf=1)
            qterms = {
                t: (1, self.idf[t])
                for t in matched
                if self.idf[t] != 0.0 or not positive_only
            }
            if not qterms:
                return []
            return self._score(
                qterms, top_k, positive_only, None, None,
                offset=offset, search_after=sa,
            )
        if kind == "more_like_this":
            return self.more_like_this(int(body), top_k=top_k)
        raise ValueError(f"unsupported query kind: {kind}")

    # -- result hydration ----------------------------------------------------

    def hydrate(
        self,
        doc_ids: list[int],
        query: str | None = None,
        snippet_window: int | None = None,
    ) -> dict[int, dict]:
        """doc_id -> {"url", "content" [, "snippet", "snippet_hits"]}.

        The reference's search API returns each hit's full ``content``
        (``/root/reference/src/neural_search/api/search.py:112-128``); the
        replica reproduces that by joining results back through the docmap
        (doc_id -> url, shard-pruned reads) and the corpus parquet
        (url -> text, pushdown-filtered) — the index itself stays
        text-free. With ``query`` + ``snippet_window``, each doc also gets
        the best-window snippet, same semantics as the cluster operator
        ``functions/snippets.py:best_snippets`` (candidate starts at
        matched-term positions, hits = distinct query terms in window,
        earliest-start ties).
        """
        if self.corpus_path is None:
            raise ValueError("no corpus_path configured; pass corpus_path= "
                             "or serve --corpus to enable hydration")
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        span = self.docs_per_shard
        urls: dict[int, str] = {}
        for s in sorted({d // span for d in doc_ids if d >= 0}):
            shard_dir = os.path.join(self.root, "docmap", f"shard={s}")
            if not os.path.isdir(shard_dir):
                continue  # unknown ids resolve to no doc, not an error
            t = pq.read_table(shard_dir, columns=["doc_id", "url"])
            m = dict(
                zip(t.column("doc_id").to_pylist(), t.column("url").to_pylist())
            )
            for d in doc_ids:
                if d in m:
                    urls[d] = m[d]
        if not urls:
            return {}
        tbl = pq.read_table(
            self.corpus_path,
            columns=["url", "text"],
            filters=pc.field("url").isin(sorted(set(urls.values()))),
        )
        text_by_url = dict(
            zip(tbl.column("url").to_pylist(), tbl.column("text").to_pylist())
        )
        qterms = sorted(set(tokenize_py(query))) if query else []
        out: dict[int, dict] = {}
        for d in doc_ids:
            u = urls.get(d)
            if u is None or u not in text_by_url:
                continue
            text = text_by_url[u]
            rec: dict = {"url": u, "content": text}
            if qterms and snippet_window:
                from ..functions.snippets import _best_window

                toks = _TOKEN_RE.findall(text.lower()) if text else []
                bw = _best_window(toks, qterms, snippet_window)
                if bw is not None:
                    start, hits = bw
                    rec["snippet"] = " ".join(
                        toks[start - 1 : start - 1 + snippet_window]
                    )
                    rec["snippet_hits"] = hits
            out[d] = rec
        return out

    def more_like_this(
        self,
        doc_id: int,
        m: int = 10,
        top_k: int = 10,
        positive_only: bool = False,
        score_rounding: int | None = 4,
    ) -> list[tuple[int, float]]:
        """Serving twin of ``query/mlt.py:more_like_this`` (parity pinned in
        tests/test_serve.py): select the source doc's top-m terms by
        HALF_UP-rounded tf*idf (ties by term), run them as a one-occurrence
        BM25 bag, exclude the source. The term vector comes from the index
        itself (one shard read); scores rank on 4dp-rounded values by
        default — the cluster operator's contract."""
        tv = self.term_vector(int(doc_id))["terms"]
        if not tv:
            return []
        terms = sorted(tv)
        weights = round_half_up(
            np.array([float(tv[t]) * self.idf.get(t, 0.0) for t in terms]), 4
        )
        order = sorted(range(len(terms)), key=lambda i: (-weights[i], terms[i]))
        qterms = {
            t: (1, self.idf[t])
            for t in (terms[i] for i in order[:m])
            if t in self.idf
        }
        if not qterms:
            return []
        return self._score(
            qterms, top_k, positive_only, score_rounding, None,
            excluded=np.array([int(doc_id)], dtype=np.int64),
        )

    # -- suggestion ---------------------------------------------------------

    def suggest(
        self, term: str, n: int = 3, max_dist: int = 1
    ) -> list[tuple[str, int, int]]:
        """Top-n fuzzy vocabulary suggestions: [(suggestion, distance, df)].

        The serving-side twin of ``query/suggest.py:term_suggest`` — same
        SymSpell deletion-1 candidate generation (complete for
        levenshtein <= 1), same exact-distance verify, same deterministic
        (distance asc, df desc, term asc) order; parity is pinned in
        tests/test_serve.py. The variant dict is built lazily per snapshot
        (vocabulary-bounded, same order of memory as the idf dict) and
        dropped on refresh().
        """
        if self._suggest_index is None:
            idx: dict[str, list[str]] = {}
            for t in self.idf:
                for v in _deletion_variants(t):
                    idx.setdefault(v, []).append(t)
            self._suggest_index = idx
        cands: set[str] = set()
        for v in _deletion_variants(term):
            cands.update(self._suggest_index.get(v, ()))
        scored = [
            (d, -self.df[t], t)
            for t in cands
            if (d := _levenshtein(term, t)) <= max_dist
        ]
        return [(t, d, -ndf) for d, ndf, t in sorted(scored)[:n]]

    # -- querying -----------------------------------------------------------

    def query(
        self,
        text: str,
        top_k: int = 10,
        positive_only: bool = True,
        score_rounding: int | None = None,
        allowed_docs=None,
        offset: int = 0,
        search_after: tuple[float, int] | None = None,
        collapse_hosts: int = 0,
    ) -> list[tuple[int, float]]:
        """[(doc_id, score)] — exact BM25 top-k, (score desc, doc_id asc).

        ``collapse_hosts=n`` is ES field collapsing on the URL host (the
        webtext "at most n results per domain" policy): at most n docs per
        host survive, chosen best-first in the same total order, BEFORE
        pagination — so offset / search_after page through the collapsed
        sequence. Same semantics as the cluster op
        ``query/rescore.py:collapse_topk`` keyed on the parsed host
        (parity pinned in tests/test_serve.py).

        ``offset`` paginates: ranks offset+1 .. offset+top_k of the SAME
        deterministic total order (page 2 of a query is stable across
        requests on one snapshot). Past-the-end offsets return [].

        ``search_after`` is the Elasticsearch-style deep-pagination cursor:
        the (score, doc_id) of the LAST hit the client received; the next
        page is the top_k docs strictly after that position in the total
        order. Equivalent to offset paging on a fixed snapshot but O(1) in
        page depth on the client protocol (no growing offset), and the two
        tile identically (pinned in tests/test_serve.py).

        Identical semantics to ``bm25_topk_wand(positive_only=...)`` for a
        single query. With a ``cache`` attached, a repeated query string is
        a whole-result hit and a repeated query *term* skips the posting
        read + decode; both are snapshot-scoped (see ``refresh``).

        ``score_rounding`` mirrors ``SearchEngine.search(score_rounding=)``:
        the positive cut stays on raw scores, then scores are HALF_UP
        rounded BEFORE the rank cut, so rank boundaries agree bit-for-bit
        with the cluster engine (and its DuckDB oracle) in equivalence mode.

        ``allowed_docs`` is the serving leg of metadata filters (the
        reference's ``filter_conditions``, api/search.py): an iterable/array
        of doc_ids that may appear in results, applied BEFORE the rank cut
        (same semantics as ``SearchEngine.search(filters=...)``'s pre-rank
        semi-join — a filtered search returns the top-k OF the allowed set,
        not the survivors of an unfiltered top-k). The caller resolves
        metadata -> ids once (e.g. a cluster job materializes the allowed-id
        set per filter expression, or a replica-local metadata sidecar);
        at serve time the filter is one vectorized ``np.isin`` over the
        already-scored candidates. Cached results are keyed by the id-set
        digest, so distinct filters never collide.
        """
        allowed = None
        if allowed_docs is not None:
            allowed = np.unique(np.asarray(list(allowed_docs), dtype=np.int64))
        if self.cache is not None:
            fdig = (
                hashlib.md5(allowed.tobytes()).hexdigest()
                if allowed is not None
                else None
            )
            fkey = {}
            if fdig:
                fkey["ids"] = fdig
            if offset:
                fkey["offset"] = offset
            if search_after is not None:
                fkey["after"] = f"{search_after[0]!r}:{int(search_after[1])}"
            if collapse_hosts:
                fkey["collapse"] = collapse_hosts
            skey = TtlLruCache.make_search_key(
                text, top_k, positive_only, self.snapshot,
                filters=fkey or None,
                score_rounding=score_rounding,
            )
            hit = self.cache.get(skey)
            if hit is not None:
                return hit

        from ..functions.analyzers import analyze_tokens

        counts: dict[str, int] = {}
        for t in analyze_tokens(tokenize_py(text), self.stats.get("analyzer") or ""):
            counts[t] = counts.get(t, 0) + 1
        qterms = {
            t: (c, self.idf[t])
            for t, c in counts.items()
            if t in self.idf and (self.idf[t] != 0.0 or not positive_only)
        }
        result = (
            self._score(
                qterms, top_k, positive_only, score_rounding, allowed,
                offset=offset, search_after=search_after,
                collapse_hosts=collapse_hosts,
            )
            if qterms
            else []
        )
        if self.cache is not None:
            self.cache.set(skey, result)
        return result

    def query_bool(
        self,
        text: str,
        top_k: int = 10,
        positive_only: bool = False,
        score_rounding: int | None = None,
        allowed_docs=None,
        offset: int = 0,
        search_after: tuple[float, int] | None = None,
        min_should_match: int = 0,
    ) -> list[tuple[int, float]]:
        """Boolean serving twin of ``query/boolean.py:bm25_topk_bool``:
        ``+term`` must appear, ``-term`` must not, bare terms score
        optionally — same eligibility and scoring semantics as the cluster
        operator (parity pinned in tests/test_serve.py).
        ``min_should_match`` requires >= n distinct should terms per doc
        (Lucene setMinimumNumberShouldMatch), counted on the same posting
        id arrays the must intersection uses.

        Must-eligibility is the numpy intersection of the must terms'
        posting id arrays (folded into ``_score``'s pre-rank ``allowed``
        filter, composing with caller ``allowed_docs``); must_not is an
        ``excluded`` id drop. An unknown must term returns [] immediately
        (no doc can contain it). Results are whole-result cached under a
        ``bool:`` keyspace so flat queries never collide.
        """
        from .boolean import parse_bool_query

        if self.cache is not None:
            adig = None
            if allowed_docs is not None:
                arr = np.unique(np.asarray(list(allowed_docs), dtype=np.int64))
                allowed_docs = arr
                adig = hashlib.md5(arr.tobytes()).hexdigest()
            fkey = {}
            if adig:
                fkey["ids"] = adig
            if offset:
                fkey["offset"] = offset
            if search_after is not None:
                fkey["after"] = f"{search_after[0]!r}:{int(search_after[1])}"
            if min_should_match:
                fkey["msm"] = min_should_match
            skey = TtlLruCache.make_search_key(
                f"bool:{text}", top_k, positive_only, self.snapshot,
                filters=fkey or None,
                score_rounding=score_rounding,
            )
            hit = self.cache.get(skey)
            if hit is not None:
                return hit

        from ..functions.analyzers import analyze_tokens

        ana = self.stats.get("analyzer") or ""
        counts: dict[tuple[str, str], int] = {}
        for clause, term in parse_bool_query(text):
            term = analyze_tokens([term], ana)[0]
            counts[(clause, term)] = counts.get((clause, term), 0) + 1
        must_terms = sorted({t for c, t in counts if c == "must"})
        not_terms = sorted({t for c, t in counts if c == "must_not"})
        should_terms = (
            sorted({t for c, t in counts if c == "should" and t in self.idf})
            if min_should_match > 0
            else []
        )
        if any(t not in self.idf for t in must_terms) or (
            min_should_match > 0 and len(should_terms) < min_should_match
        ):
            result: list[tuple[int, float]] = []
        else:
            # qtf sums across must+should clauses (per-occurrence semantics,
            # identical to the clause-table join in the cluster operator)
            qterms: dict[str, tuple[int, float]] = {}
            for (clause, term), qtf in counts.items():
                if clause == "must_not" or term not in self.idf:
                    continue
                if self.idf[term] == 0.0 and positive_only:
                    continue
                prev = qterms.get(term, (0, self.idf[term]))
                qterms[term] = (prev[0] + qtf, prev[1])

            post = self._postings_for(
                sorted(set(must_terms) | set(not_terms) | set(should_terms))
            )

            def _ids_of(term: str) -> np.ndarray:
                parts = [ids for _shard, ids, _tfs in post[term]]
                return (
                    np.concatenate(parts) if parts else np.empty(0, dtype=np.int64)
                )

            allowed = None
            if allowed_docs is not None:
                allowed = np.unique(np.asarray(list(allowed_docs), dtype=np.int64))
            for t in must_terms:
                have = _ids_of(t)
                allowed = have if allowed is None else np.intersect1d(allowed, have)
            if min_should_match > 0:
                # each term's id array is unique within the term, so the
                # concat's multiplicity IS the distinct-should-match count
                cat = np.concatenate([_ids_of(t) for t in should_terms])
                ids_u, n_match = np.unique(cat, return_counts=True)
                sat = ids_u[n_match >= min_should_match]
                allowed = sat if allowed is None else np.intersect1d(allowed, sat)
            excluded = (
                np.unique(np.concatenate([_ids_of(t) for t in not_terms]))
                if not_terms
                else None
            )
            empty_allowed = allowed is not None and allowed.size == 0
            result = (
                self._score(
                    qterms, top_k, positive_only, score_rounding, allowed, excluded,
                    offset=offset, search_after=search_after,
                )
                if qterms and not empty_allowed
                else []
            )
        if self.cache is not None:
            self.cache.set(skey, result)
        return result

    def warm(
        self, queries: list[str] | None = None, preload_postings: bool = False
    ) -> dict:
        """Eliminate replica cold-start before it enters the serving pool.

        The serving analog of the reference's model pre-cache (S8,
        ``scripts/download_models.py:15-38`` — download once so the first
        request doesn't pay it): loads every shard's docmap state, optionally
        streams the posting files through the OS page cache, and runs any
        given queries through the normal path so their term postings (and
        results) are cached under the current snapshot. Returns what was
        warmed; call again after ``refresh()`` for a new snapshot.
        """
        import time

        t0 = time.perf_counter()
        docmap_dir = os.path.join(self.root, "docmap")
        shards = sorted(
            int(d.split("=", 1)[1])
            for d in os.listdir(docmap_dir)
            if d.startswith("shard=")
        )
        for s in shards:
            self._shard_state(s)
        posting_bytes = 0
        if preload_postings:
            pdir = os.path.join(self.root, "postings")
            for dirpath, _dirs, files in os.walk(pdir):
                for fn in files:
                    if not fn.endswith(".parquet"):
                        continue
                    with open(os.path.join(dirpath, fn), "rb") as f:
                        while chunk := f.read(1 << 20):
                            posting_bytes += len(chunk)
        for q in queries or []:
            self.query(q, top_k=10)
        return {
            "snapshot": self.snapshot,
            "n_shards": len(shards),
            "n_terms": len(self.idf),
            "posting_bytes_touched": posting_bytes,
            "n_warm_queries": len(queries or []),
            "elapsed_s": round(time.perf_counter() - t0, 4),
        }

    def _score(
        self,
        qterms: dict,
        top_k: int,
        positive_only: bool,
        score_rounding: int | None = None,
        allowed: np.ndarray | None = None,
        excluded: np.ndarray | None = None,
        offset: int = 0,
        search_after: tuple[float, int] | None = None,
        avgdl_override: float | None = None,
        collapse_hosts: int = 0,
    ) -> list[tuple[int, float]]:
        k1, b = float(self.stats["k1"]), float(self.stats["b"])
        # override = scatter-gather mode (MultiReader): GLOBAL avgdl with
        # local tf/doc_len, so partial-index scores equal merged-index scores
        avgdl = (
            float(avgdl_override)
            if avgdl_override is not None
            else float(self.stats["avgdl"])
        )
        span = self.docs_per_shard
        postings = self._postings_for(sorted(qterms))

        # accumulate per-shard dense score arrays (shards touched by >=1
        # term); iteration order is sorted (term, shard) — deterministic and
        # independent of which terms came from the cache
        acc: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        for term in sorted(qterms):
            qtf, idf = qterms[term]
            for shard, ids, tfs in postings[term]:
                st = self._shard_state(shard)
                if shard not in acc:
                    acc[shard] = (
                        np.zeros(span, dtype=np.float64),
                        np.zeros(span, dtype=bool),
                    )
                scores, touched = acc[shard]
                loc = ids - shard * span
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
        if allowed is not None:
            keep = np.isin(ids, allowed, assume_unique=False)
            ids, scores = ids[keep], scores[keep]
            if ids.size == 0:
                return []
        if excluded is not None and excluded.size:
            keep = ~np.isin(ids, excluded, assume_unique=False)
            ids, scores = ids[keep], scores[keep]
            if ids.size == 0:
                return []
        if score_rounding is not None:
            scores = round_half_up(scores, score_rounding)
        if collapse_hosts:
            # sort once into the final (score desc, id asc) order, then keep
            # the first `collapse_hosts` rows of each host — vectorized
            # per-group cumcount, no Python loop over candidates
            order = np.lexsort((ids, -scores))
            ids, scores = ids[order], scores[order]
            inv = np.unique(self._hosts_for(ids), return_inverse=True)[1]
            counts = np.bincount(inv)
            starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
            gorder = np.argsort(inv, kind="stable")
            pos = np.empty(inv.size, dtype=np.int64)
            pos[gorder] = np.arange(inv.size) - np.repeat(starts, counts)
            keep = pos < collapse_hosts
            ids, scores = ids[keep], scores[keep]
        if search_after is not None:
            # cursor = the (score, doc_id) of the last hit the client saw, in
            # the representation this reader emits (post-rounding): keep only
            # docs STRICTLY after it in the (score desc, doc_id asc) order.
            # Comparing emitted-score == stored-score is exact (same floats).
            a_score, a_id = float(search_after[0]), int(search_after[1])
            keep = (scores < a_score) | ((scores == a_score) & (ids > a_id))
            ids, scores = ids[keep], scores[keep]
            if ids.size == 0:
                return []
        if collapse_hosts:
            # already in final order (masks preserve it); just paginate
            sl = slice(offset, offset + top_k)
            return [(int(d), float(s)) for d, s in zip(ids[sl], scores[sl])]
        # top-(offset+top_k) selection, not a full candidate sort: partition
        # for the need-th largest score, keep only candidates at or above it
        # (ALL ties at the threshold survive, so the (score desc, doc_id asc)
        # lexsort of the survivors is exact), then sort the small remainder.
        # Head-term queries at 100K docs have ~N candidates; this turns the
        # dominant O(N log N) rank step into O(N) + O(k' log k').
        need = offset + top_k
        if 0 < need < scores.size:
            kth = np.partition(scores, scores.size - need)[scores.size - need]
            keep = scores >= kth
            ids, scores = ids[keep], scores[keep]
        sel = np.lexsort((ids, -scores))
        sel = sel[offset : offset + top_k]
        return [(int(ids[i]), float(scores[i])) for i in sel]
