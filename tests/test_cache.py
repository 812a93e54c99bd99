"""TtlLruCache (query/cache.py) + cached IndexReader behavior.

Reference parity target: ``src/neural_search/utils/cache.py`` get/set/
delete/exists + TTL + key builders; plus the Spark-native upgrades — LRU
bound, snapshot-scoped invalidation on maintenance commits, and per-term
posting caching that must be result-invisible (cached == uncached answers).
"""

from __future__ import annotations

import pytest

from neural_search_spark.config import IndexLayout
from neural_search_spark.corpus import write_corpus_parquet
from neural_search_spark.index.build import build_index
from neural_search_spark.query.cache import TtlLruCache
from neural_search_spark.query.serve import IndexReader


class FakeClock:
    def __init__(self) -> None:
        self.now = 1000.0

    def __call__(self) -> float:
        return self.now


# -- unit: the cache itself -------------------------------------------------


def test_get_set_delete_exists():
    c = TtlLruCache(max_entries=8, ttl=60, clock=FakeClock())
    assert c.get("k") is None
    c.set("k", {"v": 1})
    assert c.get("k") == {"v": 1}
    assert c.exists("k")
    assert c.delete("k")
    assert not c.exists("k")
    assert not c.delete("k")
    assert c.stats.hits == 1 and c.stats.misses == 1


def test_ttl_expiry_uses_clock():
    clk = FakeClock()
    c = TtlLruCache(max_entries=8, ttl=60, clock=clk)
    c.set("k", "v")
    clk.now += 59.9
    assert c.get("k") == "v"
    clk.now += 0.2
    assert c.get("k") is None
    assert c.stats.expirations == 1
    # per-entry ttl override beats the default
    c.set("short", "v", ttl=5)
    clk.now += 6
    assert not c.exists("short")


def test_lru_eviction_order():
    c = TtlLruCache(max_entries=3, ttl=60, clock=FakeClock())
    for k in ("a", "b", "c"):
        c.set(k, k)
    c.get("a")  # refresh a -> b is now oldest
    c.set("d", "d")
    assert not c.exists("b")
    assert c.exists("a") and c.exists("c") and c.exists("d")
    assert c.stats.evictions == 1
    assert len(c) == 3


def test_search_key_includes_filters_and_snapshot():
    k1 = TtlLruCache.make_search_key("q", 10, True, "snapA", {"lang": "en"})
    k2 = TtlLruCache.make_search_key("q", 10, True, "snapA", {"lang": "de"})
    k3 = TtlLruCache.make_search_key("q", 10, True, "snapB", {"lang": "en"})
    assert len({k1, k2, k3}) == 3
    # dict ordering must not matter (reference sorts keys, cache.py:182)
    assert TtlLruCache.make_search_key(
        "q", 10, True, "s", {"a": 1, "b": 2}
    ) == TtlLruCache.make_search_key("q", 10, True, "s", {"b": 2, "a": 1})


# -- integration: cached reader ---------------------------------------------


@pytest.fixture(scope="module")
def idx_dir(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("serve_cache")
    corpus_path = str(root / "corpus")
    write_corpus_parquet(spark, corpus_path, n_docs=300)
    corpus = spark.read.parquet(corpus_path).select("url", "text")
    out_dir = str(root / "idx")
    build_index(
        corpus, out_dir,
        layout=IndexLayout(docs_per_shard=64, block_size=16), n_buckets=8,
    )
    return out_dir


QUERIES = ["w0005 w0010", "w0001", "w0000 w0002 w0007", "nosuchterm w0003"]


@pytest.mark.parametrize("positive_only", [True, False])
def test_cached_reader_is_result_invisible(idx_dir, positive_only):
    plain = IndexReader(idx_dir)
    cached = IndexReader(idx_dir, cache=TtlLruCache(clock=FakeClock()))
    for text in QUERIES:
        expect = plain.query(text, top_k=12, positive_only=positive_only)
        assert cached.query(text, top_k=12, positive_only=positive_only) == expect
        # second call: whole-result hit, still identical
        assert cached.query(text, top_k=12, positive_only=positive_only) == expect


def test_term_cache_hit_path(idx_dir):
    cache = TtlLruCache(clock=FakeClock())
    reader = IndexReader(idx_dir, cache=cache)
    r1 = reader.query("w0005 w0010", top_k=10)
    h0 = cache.stats.hits
    # different query STRING sharing a term: result-key misses, the shared
    # term's postings hit; answers must still be exact
    r2 = reader.query("w0005", top_k=10)
    assert cache.stats.hits > h0
    plain = IndexReader(idx_dir)
    assert r1 == plain.query("w0005 w0010", top_k=10)
    assert r2 == plain.query("w0005", top_k=10)


def test_refresh_after_maintenance_invalidates(spark, tmp_path):
    from neural_search_spark.index.maintenance import add_documents

    corpus_path = str(tmp_path / "corpus")
    write_corpus_parquet(spark, corpus_path, n_docs=120)
    base = spark.read.parquet(corpus_path).select("url", "text")
    out_dir = str(tmp_path / "idx")
    build_index(
        base, out_dir,
        layout=IndexLayout(docs_per_shard=64, block_size=16), n_buckets=8,
    )
    cache = TtlLruCache(clock=FakeClock())  # TTL never advances: only the
    reader = IndexReader(out_dir, cache=cache)  # snapshot token can invalidate
    before = reader.query("w0005", top_k=5)
    assert reader.query("freshterm") == []
    old_snapshot = reader.snapshot

    new_docs = spark.createDataFrame(
        [("zzz://new/1", "freshterm freshterm w0005")], "url string, text string"
    )
    add_documents(base.unionByName(new_docs), out_dir, new_docs)
    reader.refresh()
    assert reader.snapshot != old_snapshot

    got = reader.query("freshterm", top_k=5)
    assert len(got) == 1 and got[0][0] == 120
    # the w0005 postings changed (new doc contains it); the cached pre-commit
    # arrays must not be reused — compare against an uncached fresh reader
    plain = IndexReader(out_dir)
    after = reader.query("w0005", top_k=5)
    assert after == plain.query("w0005", top_k=5)
    assert after != before or [d for d, _ in before] == [d for d, _ in after]


def test_cli_serve_loop(idx_dir):
    """`cli.py serve` answers stdin queries as JSON lines, no Spark session."""
    import json
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, "-m", "neural_search_spark.cli", "serve",
         "--index", idx_dir, "--top-k", "5"],
        input="w0005 w0010\n:refresh\nw0005 w0010\n",
        capture_output=True, text=True, timeout=120, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr
    lines = [json.loads(x) for x in proc.stdout.strip().splitlines()]
    assert len(lines) == 3
    assert lines[1]["refreshed"] is True
    expect = IndexReader(idx_dir).query("w0005 w0010", top_k=5)
    for res in (lines[0], lines[2]):
        got = [(h["doc_id"], h["score"]) for h in res["hits"]]
        assert got == expect
        assert res["latency_ms"] < 5000


def test_cli_serve_structured_request(idx_dir):
    """A JSON request line carries top_k + filter_ids (pre-rank id filter)."""
    import json
    import subprocess
    import sys

    full = IndexReader(idx_dir).query("w0005 w0010", top_k=100, positive_only=True)
    allowed = [d for d, _ in full[len(full) // 2 :]]
    req = json.dumps({"query": "w0005 w0010", "top_k": 3, "filter_ids": allowed})
    proc = subprocess.run(
        [sys.executable, "-m", "neural_search_spark.cli", "serve",
         "--index", idx_dir, "--top-k", "5"],
        input=req + "\n{not json\n",
        capture_output=True, text=True, timeout=120, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr
    lines = [json.loads(x) for x in proc.stdout.strip().splitlines()]
    got = [(h["doc_id"], h["score"]) for h in lines[0]["hits"]]
    assert got == [(d, s) for d, s in full if d in set(allowed)][:3]
    assert "error" in lines[1]


def test_sliding_window_limiter_deterministic_clock():
    from neural_search_spark.query.ratelimit import SlidingWindowLimiter

    t = [0.0]
    lim = SlidingWindowLimiter(3, 10.0, clock=lambda: t[0])
    assert [lim.check()[0] for _ in range(3)] == [True, True, True]
    ok, retry = lim.check()
    assert not ok and abs(retry - 10.0) < 1e-9  # oldest stamp at t=0 expires at 10
    t[0] = 9.999
    assert lim.check()[0] is False
    t[0] = 10.001  # all three t=0 stamps aged out -> window empty again
    assert [lim.check()[0] for _ in range(3)] == [True, True, True]
    ok, retry = lim.check()  # full again; oldest stamp now at 10.001
    assert not ok and abs(retry - 10.0) < 1e-9
    # rejections are not recorded: advancing past all stamps frees all slots
    t[0] = 25.0
    assert [lim.check()[0] for _ in range(3)] == [True, True, True]
    s = lim.stats()
    assert s["allowed"] == 9 and s["rejected"] == 3 and s["in_window"] == 3


def test_cli_serve_rate_limit(idx_dir):
    """With --rate-limit N, request N+1 inside the window is rejected with a
    retry_after_s hint and the loop keeps serving afterwards."""
    import json
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, "-m", "neural_search_spark.cli", "serve",
         "--index", idx_dir, "--top-k", "3", "--rate-limit", "2",
         "--rate-window", "3600"],
        input="w0005\nw0005\nw0005\nw0005\n",
        capture_output=True, text=True, timeout=120, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr
    lines = [json.loads(x) for x in proc.stdout.strip().splitlines()]
    assert len(lines) == 4
    assert "hits" in lines[0] and "hits" in lines[1]
    for rej in lines[2:]:
        assert rej["error"] == "rate limited"
        assert 0 < rej["retry_after_s"] <= 3600


def test_warmup_loads_shards_and_queries(idx_dir):
    """warm() pre-loads every shard's docmap state, touches the posting
    bytes, and primes the query/postings caches for the given queries."""
    from neural_search_spark.query.cache import TtlLruCache
    from neural_search_spark.query.serve import IndexReader

    r = IndexReader(idx_dir, cache=TtlLruCache())
    assert not r._shards
    info = r.warm(["w0005 w0010"], preload_postings=True)
    assert info["n_shards"] == len(r._shards) > 0
    assert info["posting_bytes_touched"] > 0
    assert info["n_warm_queries"] == 1
    # the warm query is now served from the result cache
    key = TtlLruCache.make_search_key("w0005 w0010", 10, True, r.snapshot)
    assert r.cache.get(key) is not None


def test_cli_warmup(idx_dir, tmp_path):
    import json
    import subprocess
    import sys

    qf = tmp_path / "warm_queries.txt"
    qf.write_text("w0005 w0010\n")
    proc = subprocess.run(
        [sys.executable, "-m", "neural_search_spark.cli", "warmup",
         "--index", idx_dir, "--queries", str(qf), "--preload-postings"],
        capture_output=True, text=True, timeout=120, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr
    info = json.loads(proc.stdout.strip().splitlines()[-1])
    assert info["n_shards"] > 0 and info["posting_bytes_touched"] > 0


def test_cli_serve_suggest_request(idx_dir):
    """A {"suggest": term} line returns fuzzy vocabulary suggestions."""
    import json
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, "-m", "neural_search_spark.cli", "serve",
         "--index", idx_dir, "--top-k", "5"],
        input='{"suggest": "w005", "n": 2}\n',
        capture_output=True, text=True, timeout=120, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr
    out = json.loads(proc.stdout.strip().splitlines()[0])
    expect = IndexReader(idx_dir).suggest("w005", n=2)
    got = [(s["term"], s["distance"], s["df"]) for s in out["suggestions"]]
    assert got == expect and len(got) > 0


def test_cli_serve_bool_request(idx_dir):
    """A {"query": ..., "bool": true} line uses clause syntax on the replica."""
    import json
    import subprocess
    import sys

    reqs = "\n".join([
        json.dumps({"query": "+w0005 -w0010", "top_k": 5, "bool": True}),
        json.dumps({"query": "w0005 w0010 w0001", "top_k": 5, "bool": True,
                    "minimum_should_match": 2}),
    ])
    proc = subprocess.run(
        [sys.executable, "-m", "neural_search_spark.cli", "serve",
         "--index", idx_dir, "--top-k", "5", "--match-all"],
        input=reqs + "\n",
        capture_output=True, text=True, timeout=120, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr
    lines = [json.loads(x) for x in proc.stdout.strip().splitlines()]
    reader = IndexReader(idx_dir)
    expect = reader.query_bool("+w0005 -w0010", top_k=5)
    assert [(h["doc_id"], h["score"]) for h in lines[0]["hits"]] == expect
    assert len(expect) > 0
    expect_msm = reader.query_bool(
        "w0005 w0010 w0001", top_k=5, min_should_match=2
    )
    assert [(h["doc_id"], h["score"]) for h in lines[1]["hits"]] == expect_msm
    assert len(expect_msm) > 0


def test_cli_serve_more_like_this_request(idx_dir):
    """{"more_like_this": doc_id} returns the replica MLT hits."""
    import json
    import subprocess
    import sys

    req = json.dumps({"more_like_this": 5, "m": 8, "top_k": 6})
    proc = subprocess.run(
        [sys.executable, "-m", "neural_search_spark.cli", "serve",
         "--index", idx_dir, "--match-all"],
        input=req + "\n",
        capture_output=True, text=True, timeout=120, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr
    out = json.loads(proc.stdout.strip().splitlines()[0])
    expect = IndexReader(idx_dir).more_like_this(5, m=8, top_k=6, positive_only=False)
    assert [(h["doc_id"], h["score"]) for h in out["hits"]] == expect
    assert len(expect) > 0 and 5 not in [h["doc_id"] for h in out["hits"]]


def test_cli_serve_percolate_request(idx_dir, tmp_path):
    """{"percolate": text} matches saved searches from --percolate-queries."""
    import json
    import subprocess
    import sys

    saved = tmp_path / "saved.jsonl"
    saved.write_text(
        "\n".join(
            json.dumps({"query_id": q, "query": t})
            for q, t in [(0, "+w0005"), (1, "w0003 -w0001"), (2, "+nosuch")]
        )
    )
    reqs = "\n".join([
        json.dumps({"percolate": "w0005 and w0003 words"}),
        json.dumps({"percolate": "w0003 w0001 together"}),
    ])
    proc = subprocess.run(
        [sys.executable, "-m", "neural_search_spark.cli", "serve",
         "--index", idx_dir, "--percolate-queries", str(saved)],
        input=reqs + "\n",
        capture_output=True, text=True, timeout=120, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr
    lines = [json.loads(x) for x in proc.stdout.strip().splitlines()]
    assert lines[0]["matches"] == [0, 1]
    assert lines[1]["matches"] == []  # w0001 excludes query 1


def test_cli_serve_collapse_request(idx_dir):
    """A {"collapse_hosts": n} line collapses results per URL host."""
    import json
    import subprocess
    import sys

    req = json.dumps(
        {"query": "w0005 w0010", "top_k": 8, "collapse_hosts": 1}
    )
    proc = subprocess.run(
        [sys.executable, "-m", "neural_search_spark.cli", "serve",
         "--index", idx_dir, "--match-all"],
        input=req + "\n",
        capture_output=True, text=True, timeout=120, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr
    out = json.loads(proc.stdout.strip().splitlines()[0])
    expect = IndexReader(idx_dir).query(
        "w0005 w0010", top_k=8, positive_only=False, collapse_hosts=1
    )
    assert [(h["doc_id"], h["score"]) for h in out["hits"]] == expect
    assert len(expect) > 0


def test_cli_serve_search_after_cursor(idx_dir):
    """The serve loop's {"search_after": [score, doc_id]} request returns the
    next page of the same total order (tiles with offset paging)."""
    import json
    import subprocess
    import sys

    reader = IndexReader(idx_dir)
    p0 = reader.query("w0005 w0010", top_k=5)
    want = reader.query("w0005 w0010", top_k=5, offset=5)
    req = json.dumps(
        {"query": "w0005 w0010", "top_k": 5, "search_after": [p0[-1][1], p0[-1][0]]}
    )
    proc = subprocess.run(
        [sys.executable, "-m", "neural_search_spark.cli", "serve",
         "--index", idx_dir, "--top-k", "5"],
        input=req + "\n",
        capture_output=True, text=True, timeout=120, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr
    lines = [json.loads(x) for x in proc.stdout.strip().splitlines()]
    got = [(h["doc_id"], h["score"]) for h in lines[0]["hits"]]
    assert got == want


def test_cli_stats(idx_dir):
    """`cli.py stats` reports index metadata + byte sizes without Spark."""
    import json
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, "-m", "neural_search_spark.cli", "stats",
         "--index", idx_dir],
        capture_output=True, text=True, timeout=60, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr
    out = json.loads(proc.stdout.strip())
    assert out["n_docs"] > 0 and out["vocabulary"] > 0
    assert out["analyzer"] == "" and out["positional"] is False
    assert out["postings_bytes"] > 0 and out["n_shards"] >= 1


def test_cli_serve_mget(idx_dir):
    """{"mget": [ids]} fetches documents by id via the hydration path."""
    import json
    import subprocess
    import sys

    import os

    # the idx_dir fixture's corpus lives next to it

    root = os.path.dirname(idx_dir.rstrip("/"))
    corpus = os.path.join(root, "corpus")
    req = json.dumps({"mget": [0, 3, 10_000_000]})
    proc = subprocess.run(
        [sys.executable, "-m", "neural_search_spark.cli", "serve",
         "--index", idx_dir, "--corpus", corpus],
        input=req + "\n",
        capture_output=True, text=True, timeout=120, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr
    out = json.loads(proc.stdout.strip().splitlines()[0])
    got = {d["doc_id"]: d for d in out["docs"]}
    assert set(got) == {0, 3}, "unknown ids are silently absent"
    assert got[0]["url"] and got[0]["content"]


def test_cli_serve_explain_request(idx_dir):
    """{"explain": query, "doc_id": id} returns the per-term breakdown whose
    rows match IndexReader.explain (the ES _explain serving form)."""
    import json
    import subprocess
    import sys

    reader = IndexReader(idx_dir)
    top = reader.query("w0005 w0010", top_k=1)
    doc_id = top[0][0]
    req = json.dumps({"explain": "w0005 w0010", "doc_id": doc_id})
    proc = subprocess.run(
        [sys.executable, "-m", "neural_search_spark.cli", "serve",
         "--index", idx_dir],
        input=req + "\n" + json.dumps({"explain": "w0005"}) + "\n",
        capture_output=True, text=True, timeout=120, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr
    lines = [json.loads(x) for x in proc.stdout.strip().splitlines()]
    assert lines[0] == reader.explain("w0005 w0010", doc_id)
    assert sum(r["contrib"] for r in lines[0]["terms"]) == pytest.approx(
        lines[0]["score"], abs=2e-4
    )
    assert "error" in lines[1]  # missing doc_id


def test_cli_serve_dsl_request(idx_dir):
    """{"dsl": {...}} serves the cluster DSL's replica-servable subset; a
    cluster-only form returns a routing error instead of wrong results."""
    import json
    import subprocess
    import sys

    reader = IndexReader(idx_dir)
    req1 = {"dsl": {"query": {"match": {"query": "w0005 w0010"}}, "top_k": 4}}
    req2 = {"dsl": {"query": {"prefix": "w000"}, "top_k": 4}}
    req3 = {"dsl": {"query": {"match": {"query": "x"}},
                    "rescore": {"phrase": "y"}}}
    # malformed bodies must produce error LINES, never kill the replica loop
    req4 = {"dsl": {"query": {"bool": "not-a-dict"}}}
    req5 = {"explain": "w0005"}  # missing doc_id
    proc = subprocess.run(
        [sys.executable, "-m", "neural_search_spark.cli", "serve",
         "--index", idx_dir],
        input="\n".join(json.dumps(r) for r in (req1, req2, req3, req4, req5))
        + "\n" + json.dumps(req1) + "\n",
        capture_output=True, text=True, timeout=120, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr
    lines = [json.loads(x) for x in proc.stdout.strip().splitlines()]
    want1 = reader.query_dsl(req1["dsl"], positive_only=True)
    assert [(h["doc_id"], h["score"]) for h in lines[0]["hits"]] == want1
    want2 = reader.query_dsl(req2["dsl"], positive_only=True)
    assert [(h["doc_id"], h["score"]) for h in lines[1]["hits"]] == want2
    assert "cluster-side-only" in lines[2]["error"]
    assert "error" in lines[3] and "error" in lines[4]
    # the loop survived the malformed requests and still answers
    assert [(h["doc_id"], h["score"]) for h in lines[5]["hits"]] == want1
