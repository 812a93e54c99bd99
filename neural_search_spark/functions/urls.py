"""URL analysis for Common-Crawl-style corpora.

Web-scale training-data pipelines are organized around the URL: per-domain
quality priors, per-domain document caps (a C4/RefinedWeb-style dedup and
bias control), and host-level stats all start from parsing the page URL.
These operators keep everything JVM-side (``regexp_extract`` / string
built-ins — whole-stage codegen, no Python), so they run at scan speed on
10^12 rows, and the parse regexes are dialect-portable (plain character
classes, no lookarounds) so the driver's DuckDB oracle applies the SAME
pattern to the SAME strings.

Input is any DataFrame with a URL string column — e.g. the input-hint corpus
``(url, warc_ts, html, text, lang)`` — and the outputs are narrow columns a
table would be clustered by in a deployment (domain-clustered layout makes
the per-domain cap a partition-local window, no shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Dialect-portable pieces (Java regex == RE2 semantics for these patterns):
# scheme = RFC 3986 ALPHA *( ALPHA / DIGIT / "+" / "-" / "." ), host = the
# authority up to the first '/', ':', '?' or '#', path = from the first '/'
# after the authority to the first '?' or '#'.
RE_SCHEME = "^([a-zA-Z][a-zA-Z0-9+.-]*)://"
RE_HOST = "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)"
RE_PATH = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)"


def url_parse(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Append (scheme, host, registered_domain, path, path_depth).

    ``registered_domain`` is the last two dot-labels of the host (example.com
    from www.blog.example.com) — the public-suffix-list refinement drops in
    as a broadcast-join lookup table without changing this plan's shape.
    ``path_depth`` counts non-empty path segments. All expressions are
    codegen'd column ops; empty-string sentinels (never NULL) keep downstream
    groupBys total.
    """
    url = F.col(url_col)
    host = F.regexp_extract(url, RE_HOST, 1)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    registered = F.when(
        n >= 2,
        F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1)),
    ).otherwise(host)
    path = F.regexp_extract(url, RE_PATH, 1)
    depth = F.size(F.filter(F.split(path, "/"), lambda s: s != ""))
    return df.select(
        "*",
        F.regexp_extract(url, RE_SCHEME, 1).alias("scheme"),
        host.alias("host"),
        registered.alias("registered_domain"),
        path.alias("path"),
        depth.cast("int").alias("path_depth"),
    )


def host_stats(
    parsed: DataFrame,
    by: str = "registered_domain",
    chars_col: str = "n_chars",
) -> DataFrame:
    """(domain, n_docs, n_hosts, total_chars, avg_path_depth): the per-domain
    profile a crawl-selection policy reads (domain frequency caps, boilerplate
    farms show up as huge n_docs with tiny char variance). ONE hash-aggregate
    shuffle keyed on the domain — scale-safe at any corpus size; skew from a
    mega-domain is bounded because partial aggregation (map-side combine)
    collapses each partition's contribution to one row per domain first.
    """
    return parsed.groupBy(F.col(by).alias("domain")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("host").alias("n_hosts"),
        F.sum(F.col(chars_col)).alias("total_chars"),
        F.avg("path_depth").alias("avg_path_depth"),
    )


def cap_per_domain(
    parsed: DataFrame,
    max_docs: int,
    by: str = "registered_domain",
    order_col: str = "doc_id",
) -> DataFrame:
    """Keep at most ``max_docs`` documents per domain (deterministic: lowest
    ``order_col`` wins — pass a quality score's negation to keep the best).

    The standard anti-bias step in web-corpus curation: without it a handful
    of template-heavy domains dominate the token budget. One window over the
    domain key; with a domain-clustered table layout the window is
    partition-local (no shuffle). A rank column (``domain_rank``) is kept so
    downstream stages can re-cut at smaller caps without recomputing.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(by).orderBy(F.asc(order_col))
    return (
        parsed.withColumn("domain_rank", F.row_number().over(w))
        .where(F.col("domain_rank") <= max_docs)
    )
