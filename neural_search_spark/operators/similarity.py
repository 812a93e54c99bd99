"""Similarity search over an embedding column (array<float>).

Two paths over ``(vec_id, embedding)``:

  * ``cosine_topk``      — brute-force exact top-k: broadcast the (small)
    query set, JVM-side dot product via ``zip_with``/``aggregate`` (whole-
    stage codegen, no Python), per-query window top-k. The exactness
    baseline; at 10^12 rows it is one full scan per query batch — linear,
    shuffle-light (only the final k-row-per-query TakeOrdered), but reads
    everything.
  * ``ann_lsh_topk``     — sign-LSH (random-hyperplane) bucketed search, the
    scale path: P deterministic pseudo-random hyperplanes (md5-derived, no
    RNG state — reproducible across runs/executors) hash each vector to a
    P-bit bucket; queries probe their own bucket plus all buckets within
    ``probe_hamming`` bit flips, so only a fraction of the corpus is scored.
    Recall/latency trade via n_planes + probe_hamming; exactness is NOT
    promised (verified by a recall-vs-brute-force pytest gate instead of a
    SQL oracle).

``cosine_pairs`` — all-pairs near-duplicate detection by embedding cosine
(the embedding leg of the dedup suite in operators/dedup.py).

The reference's dense path is FAISS flat inner-product
(/root/reference/src/neural_search/storage/faiss_store.py:269-333); these
operators are the from-scratch Spark equivalents (Q4/Q11 in SURVEY.md §2.4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """Σ a[i]*b[i] in float64, left-to-right — WholeStageCodegen, no Python."""
    return F.aggregate(
        F.zip_with(a.cast("array<double>"), b.cast("array<double>"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_col(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    top_k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """(query_id, rank, vec_id, score): exact cosine top-k per query.

    ``queries`` is small (a query batch) and is broadcast; rank ties break on
    ascending vec_id, mirroring the BM25 engine's deterministic tie rule.
    """
    from pyspark.sql import Window

    scored = embeddings.crossJoin(
        F.broadcast(queries.select(query_id_col, query_vec_col))
    ).select(
        F.col(query_id_col).alias("query_id"),
        F.col(id_col).alias("vec_id"),
        cosine_col(F.col(vec_col), F.col(query_vec_col)).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select("query_id", "rank", "vec_id", "score")
    )


def cosine_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_a, id_b, cosine): all pairs with cosine >= threshold.

    Brute-force O(N^2) pair join — the exactness baseline and the verifier
    behind ``ann_lsh_topk`` bucketing at scale (where candidates come from
    shared LSH buckets instead of a cross join).
    """
    a = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            cosine_col(F.col("va"), F.col("vb")).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


# ---------------------------------------------------------------------------
# Sign-LSH (random hyperplane) bucketed ANN — the scale path
# ---------------------------------------------------------------------------


def _hyperplanes(dim: int, n_planes: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: component (p, d) is derived
    from md5(f"{p}#{d}") mapped to [-1, 1). No RNG state — any executor, any
    run, any engine rebuilds the identical planes."""
    import hashlib

    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{p}#{d}".encode()).hexdigest()
            row.append(int(h[:8], 16) / float(1 << 31) - 1.0)
        planes.append(row)
    return planes


def _bucket_col(vec: Column, planes: list[list[float]]) -> Column:
    """int bucket id: bit p = sign(vec . plane_p)."""
    bucket = F.lit(0)
    for p, plane in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(
                vec.cast("array<double>"),
                F.array(*[F.lit(c) for c in plane]),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def ann_lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    top_k: int = 10,
    n_planes: int = 8,
    probe_hamming: int = 1,
    dim: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """(query_id, rank, vec_id, score): approximate cosine top-k.

    Corpus vectors are bucketed once by P sign bits (a narrow column that
    would be precomputed/persisted in a real deployment, making query-time a
    bucket-pruned scan). Each query probes its bucket and every bucket within
    ``probe_hamming`` bit flips (multi-probe LSH), then scores candidates
    exactly and takes top-k. Approximate by design — see the recall gate in
    tests/test_similarity.py.
    """
    from pyspark.sql import Window

    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_planes)

    bucketed = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v"),
        _bucket_col(F.col(vec_col), planes).alias("bucket"),
    )

    # query-side probe set: own bucket + hamming-<=h neighbors
    probes = [0] + ([1 << p for p in range(n_planes)] if probe_hamming >= 1 else [])
    if probe_hamming >= 2:
        probes += [
            (1 << p) | (1 << q)
            for p in range(n_planes)
            for q in range(p + 1, n_planes)
        ]
    qb = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).alias("qv"),
        _bucket_col(F.col(query_vec_col), planes).alias("qbucket"),
    ).select(
        "query_id",
        "qv",
        F.explode(
            F.array(*[F.col("qbucket").bitwiseXOR(F.lit(m)) for m in probes])
        ).alias("bucket"),
    )

    scored = bucketed.join(F.broadcast(qb), "bucket").select(
        "query_id",
        "vec_id",
        cosine_col(F.col("v"), F.col("qv")).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select("query_id", "rank", "vec_id", "score")
    )
