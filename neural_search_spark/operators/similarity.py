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
    tests/test_pipeline_ops.py.
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


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — coarse k-means quantizer + cluster-pruned search
# ---------------------------------------------------------------------------


def train_ivf_centroids(
    embeddings: DataFrame,
    n_clusters: int = 16,
    n_iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Deterministic coarse quantizer: spherical k-means on the corpus.

    Init = the ``n_clusters`` lowest-id vectors (normalized) — deterministic,
    no RNG. Each Lloyd iteration is one Spark pass: a mapInPandas assignment
    against the broadcast centroid matrix, then a groupBy mean; the centroid
    matrix itself (n_clusters x dim floats) lives on the driver — tiny at any
    corpus scale. Returns a numpy array (n_clusters, dim), rows L2-normalized.
    """
    import numpy as np

    seed_rows = (
        embeddings.orderBy(id_col).limit(n_clusters).select(vec_col).collect()
    )
    C = np.array([r[0] for r in seed_rows], dtype=np.float64)
    C /= np.linalg.norm(C, axis=1, keepdims=True)

    for _ in range(n_iters):
        assigned = assign_ivf_clusters(embeddings, C, id_col, vec_col)
        sums = (
            assigned.groupBy("cluster")
            .agg(
                F.array(
                    *[
                        F.sum(F.col("v").getItem(i))
                        for i in range(C.shape[1])
                    ]
                ).alias("s"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        newC = C.copy()
        for r in sums:
            m = np.array(r["s"], dtype=np.float64)
            nrm = np.linalg.norm(m)
            if nrm > 0:
                newC[r["cluster"]] = m / nrm
        C = newC
    return C


def assign_ivf_clusters(
    embeddings: DataFrame,
    centroids,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, v (array<double> normalized), cluster): nearest centroid by
    cosine, Arrow-batched numpy argmax against the broadcast matrix."""
    import numpy as np
    import pandas as pd

    C = centroids

    def kernel(batches):
        for pdf in batches:
            M = np.stack(pdf["v"].to_numpy())
            M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
            cl = (M @ C.T).argmax(axis=1)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "v": pdf["v"], "cluster": cl.astype("int32")}
            )

    base = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).cast("array<double>").alias("v")
    )
    return base.mapInPandas(kernel, schema="vec_id long, v array<double>, cluster int")


def ann_ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    top_k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    centroids=None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """(query_id, rank, vec_id, score): IVF-pruned approximate cosine top-k.

    Corpus vectors are bucketed by nearest coarse centroid (in a deployment
    the (vec_id, cluster) column is precomputed and the table is clustered by
    it, so a probe reads only its clusters' files); each query scores only the
    ``n_probe`` nearest clusters' vectors. Recall/latency trade via
    n_clusters x n_probe; exact within the probed set.
    """
    import numpy as np

    if centroids is None:
        centroids = train_ivf_centroids(
            embeddings, n_clusters, id_col=id_col, vec_col=vec_col
        )
    assigned = assign_ivf_clusters(embeddings, centroids, id_col, vec_col)

    spark = queries.sparkSession
    q_rows = queries.select(query_id_col, query_vec_col).collect()
    probe_rows = []
    for r in q_rows:
        qv = np.asarray(r[query_vec_col], dtype=np.float64)
        qv /= max(np.linalg.norm(qv), 1e-12)
        order = np.argsort(-(centroids @ qv))[:n_probe]
        for c in order:
            probe_rows.append((r[query_id_col], int(c), qv.tolist()))
    probes = spark.createDataFrame(
        probe_rows, "query_id long, cluster int, qv array<double>"
    )

    scored = assigned.join(F.broadcast(probes), "cluster").select(
        "query_id",
        "vec_id",
        cosine_col(F.col("v"), F.col("qv")).alias("score"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select("query_id", "rank", "vec_id", "score")
    )
