"""Deterministic hash-projection embeddings — the model-inference stand-in.

The reference encodes every query and document with a sentence-transformer
(``/root/reference/src/neural_search/core/embeddings.py:100-136``). Model
inference is outside this engine's scope (SURVEY.md §7.0) and the sandbox has
no model runtime, so this module provides the moral equivalent of the
reference's own mock encoder (its tests inject a deterministic fake model,
``/root/reference/tests/conftest.py:106-141``): a text -> unit-vector
projection computed from md5 nibble arithmetic that Spark (pure JVM
expressions, map-only stage — no Python, no shuffle) and the DuckDB oracle
rebuild bit-identically.

Scheme (``dim`` buckets, default 16):

  * token list = ``\\w+`` over ``lower(text)`` (every occurrence counts);
  * bucket(token)  = value of md5-hex nibble 1  (0..dim-1 for dim=16);
  * sign(token)    = +1 if md5-hex nibble 2 >= 8 else -1;
  * raw[d]         = Σ_tokens (bucket = d ? sign : 0)   (exact int64);
  * embedding      = raw / ||raw||_2  (all-zero stays all-zero).

Equal texts embed equally and token-overlapping texts correlate — exactly
the property the orchestration layer (hybrid fusion, reranking) needs for an
end-to-end, oracle-checkable drive. It is NOT a semantic model and is
documented as such; swapping in a real encoder is a one-line change at the
``dense_results`` injection point (plans/engine.py).

Feature hashing with a signed hash is the standard public construction
(hashing trick / SimHash-style signed projection); determinism comes from
md5, no RNG state anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMBED_DIM = 16

_TOKEN_RE = r"\w+"


def _bucket(x: Column) -> Column:
    return F.conv(F.substring(F.md5(x), 1, 1), 16, 10).cast("int")


def _sign(x: Column) -> Column:
    return F.when(
        F.conv(F.substring(F.md5(x), 2, 1), 16, 10).cast("int") >= 8,
        F.lit(1).cast("long"),
    ).otherwise(F.lit(-1).cast("long"))


def hash_embedding(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "embedding",
    dim: int = EMBED_DIM,
) -> DataFrame:
    """Append ``out_col`` (array<double>, unit L2 norm or all-zero).

    Pure projection: whole-stage-codegen column expressions, no Python, no
    shuffle — at any corpus scale this fuses into the scan stage. O(dim * L)
    per doc (one token-array pass per bucket), fine for the 16-d stand-in;
    a real encoder replaces this wholesale.
    """
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(_TOKEN_RE), 0)
    raw = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: F.aggregate(
            toks,
            F.lit(0).cast("long"),
            lambda acc, x: acc
            + F.when(_bucket(x) == d, _sign(x)).otherwise(F.lit(0).cast("long")),
        ),
    )
    out = df.withColumn("_he_raw", raw)
    nrm = F.sqrt(
        F.aggregate(
            F.col("_he_raw"), F.lit(0.0), lambda a, v: a + (v * v).cast("double")
        )
    )
    out = out.withColumn("_he_nrm", nrm)
    emb = F.transform(
        F.col("_he_raw"),
        lambda v: F.when(
            F.col("_he_nrm") > 0, v.cast("double") / F.col("_he_nrm")
        ).otherwise(F.lit(0.0)),
    )
    return out.withColumn(out_col, emb).drop("_he_raw", "_he_nrm")


def hash_cosine_reranker(corpus: DataFrame, text_col: str = "text", rounding: int = 6):
    """Deterministic rerank scorer for ``SearchEngine.search(reranker=...)``.

    Stand-in for the reference cross-encoder
    (``/root/reference/src/neural_search/core/reranker.py:53-101``): scores
    each (query, candidate) pair by the cosine of their hash embeddings —
    same orchestration contract (pairwise rescoring of the initial_k set),
    deterministic and oracle-reproducible. A real model replaces the scorer
    body with a broadcast-model mapInPandas batch scorer; the seam is
    identical.
    """
    from ..operators.similarity import cosine_col

    def rerank(candidates: DataFrame, queries: DataFrame) -> DataFrame:
        d = hash_embedding(
            corpus.select("doc_id", F.col(text_col).alias("text")), out_col="dv"
        ).select("doc_id", "dv")
        q = hash_embedding(
            queries.select("query_id", F.col("query_text").alias("text")),
            out_col="qv",
        ).select("query_id", "qv")
        return (
            candidates.join(d, "doc_id")
            .join(F.broadcast(q), "query_id")
            .select(
                "query_id",
                "doc_id",
                F.round(cosine_col(F.col("dv"), F.col("qv")), rounding).alias("score"),
            )
        )

    return rerank


def hash_embed_sql_ctes(src: str, key: str, prefix: str, dim: int = EMBED_DIM) -> str:
    """DuckDB CTE chain computing the identical embedding for ``(key, text)``
    rows of ``src``; the final CTE ``{prefix}_emb`` has columns (key, v).

    Mirrors ``hash_embedding`` construct-for-construct: same md5 nibble
    bucket/sign (strpos-table trick, as in the simhash oracle), exact int64
    bucket sums, identical normalize arithmetic.
    """
    nib1 = "strpos('0123456789abcdef', substr(md5(term), 1, 1)) - 1"
    nib2 = "strpos('0123456789abcdef', substr(md5(term), 2, 1)) - 1"
    return f"""
{prefix}_tb AS (
  SELECT {key}, {nib1} AS b,
         CASE WHEN {nib2} >= 8 THEN 1 ELSE -1 END AS s
  FROM (
    SELECT {key}, unnest(regexp_extract_all(lower(text), '\\w+')) AS term
    FROM {src}
  )
),
{prefix}_agg AS (SELECT {key}, b, sum(s) AS v FROM {prefix}_tb GROUP BY {key}, b),
{prefix}_grid AS (SELECT t.{key}, r.d FROM {src} t CROSS JOIN range({dim}) r(d)),
{prefix}_raw AS (
  SELECT g.{key}, list(coalesce(a.v, 0) ORDER BY g.d) AS e
  FROM {prefix}_grid g
  LEFT JOIN {prefix}_agg a ON a.{key} = g.{key} AND a.b = g.d
  GROUP BY g.{key}
),
{prefix}_emb AS (
  SELECT {key},
         CASE WHEN list_sum(list_transform(e, y -> (y * y)::DOUBLE)) > 0
              THEN list_transform(e, x ->
                     x / sqrt(list_sum(list_transform(e, y -> (y * y)::DOUBLE))))
              ELSE list_transform(e, x -> 0.0)
         END AS v
  FROM {prefix}_raw
)
"""


def hash_embed_py(text: str, dim: int = EMBED_DIM) -> "list[float]":
    """Pure-Python twin of ``hash_embedding`` for the serving replica.

    Bit-identical to the Spark expression chain above (asserted in
    tests/test_serve_hybrid.py): same md5 nibble bucket/sign, exact int
    bucket sums, and the same left-to-right float arithmetic for the norm
    and the divide. ``\\w`` is matched ASCII-only to agree with the Java
    regex default used by ``regexp_extract_all``.
    """
    import hashlib
    import math
    import re

    raw = [0] * dim
    for t in re.findall(r"\w+", text.lower(), flags=re.ASCII):
        h = hashlib.md5(t.encode("utf-8")).hexdigest()
        b = int(h[0], 16)
        if b < dim:
            raw[b] += 1 if int(h[1], 16) >= 8 else -1
    acc = 0.0
    for v in raw:  # left-to-right, matching F.aggregate
        acc += float(v * v)
    n = math.sqrt(acc)
    if n > 0:
        return [float(v) / n for v in raw]
    return [0.0] * dim
