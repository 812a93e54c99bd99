from __future__ import annotations

import pytest

from neural_search_spark.functions import urls as UR


@pytest.fixture(scope="module")
def parsed(spark):
    rows = [
        (0, "https://www.blog.example.com/a/b/page?q=1#frag", 100),
        (1, "http://example.org/", 50),
        (2, "https://single/x", 10),  # single-label host
        (3, "ftp://files.example.net/pub/data.bin", 7),
        (4, "https://example.com", 5),  # no path at all
        (5, "not a url", 1),  # garbage row: empty sentinels, never NULL
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, n_chars long")
    return UR.url_parse(df)


def test_url_parse_fields(parsed):
    by_id = {r["doc_id"]: r for r in parsed.collect()}
    r0 = by_id[0]
    assert r0["scheme"] == "https"
    assert r0["host"] == "www.blog.example.com"
    assert r0["registered_domain"] == "example.com"
    assert r0["path"] == "/a/b/page"
    assert r0["path_depth"] == 3
    assert by_id[1]["registered_domain"] == "example.org"
    assert by_id[1]["path"] == "/" and by_id[1]["path_depth"] == 0
    # single-label host: registered_domain falls back to the host itself
    assert by_id[2]["registered_domain"] == "single"
    assert by_id[3]["scheme"] == "ftp"
    # no path: empty-string sentinel, depth 0
    assert by_id[4]["path"] == "" and by_id[4]["path_depth"] == 0
    # garbage: all sentinels empty, nothing NULL (keeps groupBys total)
    r5 = by_id[5]
    assert r5["scheme"] == "" and r5["host"] == "" and r5["registered_domain"] == ""


def test_host_stats_one_row_per_domain(parsed):
    stats = {r["domain"]: r for r in UR.host_stats(parsed).collect()}
    assert stats["example.com"]["n_docs"] == 2
    assert stats["example.com"]["n_hosts"] == 2  # www.blog.… and bare host
    assert stats["example.com"]["total_chars"] == 105


def test_cap_per_domain_deterministic(parsed):
    capped = UR.cap_per_domain(parsed, max_docs=1).collect()
    kept = {r["registered_domain"]: r["doc_id"] for r in capped}
    # lowest doc_id wins per domain
    assert kept["example.com"] == 0
    assert all(r["domain_rank"] == 1 for r in capped)
    # cap=2 keeps both example.com docs
    two = UR.cap_per_domain(parsed, max_docs=2)
    assert two.where(two.registered_domain == "example.com").count() == 2


def test_url_ops_stay_jvm_side(parsed):
    # whole pipeline is codegen'd column ops — no Python workers in the plan
    plan = UR.host_stats(parsed)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan


def test_sample_per_domain_deterministic_mixture(spark):
    rows = [
        (i, f"https://example{i % 3}.com/p{i}", 10) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, n_chars long")
    parsed_urls = UR.url_parse(df)
    rates = {"example0.com": 0.5, "example1.com": 0.0}
    a = UR.sample_per_domain(parsed_urls, rates, default_rate=1.0)
    b = UR.sample_per_domain(parsed_urls, rates, default_rate=1.0)
    got_a = sorted(r["doc_id"] for r in a.collect())
    got_b = sorted(r["doc_id"] for r in b.collect())
    assert got_a == got_b  # same coin every run
    by_dom = {d: n for d, n in a.groupBy("registered_domain").count().collect()}
    total = {d: n for d, n in parsed_urls.groupBy("registered_domain").count().collect()}
    assert "example1.com" not in by_dom            # rate 0 drops everything
    kept0 = by_dom.get("example0.com", 0) / total["example0.com"]
    assert 0.25 <= kept0 <= 0.75                   # ~half survive at rate 0.5
    for d, n in total.items():                     # untouched domains intact
        if d not in rates:
            assert by_dom[d] == n
    # buckets audit column survives and is within range
    assert all(0 <= r["sample_bucket"] < 1_000_000 for r in a.collect())
