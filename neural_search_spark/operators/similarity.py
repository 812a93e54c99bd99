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

from dataclasses import dataclass

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


def near_dup_pairs_lsh(
    embeddings: DataFrame,
    threshold: float = 0.3,
    n_bands: int = 4,
    n_planes: int = 6,
    dim: int | None = None,
    max_bucket_size: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_a, id_b, cosine): embedding near-dup pairs via banded sign-LSH.

    The scale path for embedding near-duplicate detection (``cosine_pairs``
    is the O(N^2) verifier): each vector gets ``n_bands`` independent
    ``n_planes``-bit sign signatures (md5-derived hyperplanes — no RNG, any
    engine rebuilds them bit-identically); candidates are pairs sharing ANY
    band's full signature (same banding contract as
    ``dedup.minhash_lsh_pairs``); each candidate's **exact** cosine is then
    computed and thresholded. Output is deterministic given the candidate
    set — the only approximation is recall (a pair agreeing on no band is
    never considered).

    Cost at N docs: one narrow (id, band, key) shuffle + a bucket self-join
    bounded by bucket_size^2 per key — never the N^2 cross join.
    ``max_bucket_size`` caps pathological buckets (mirrors
    ``minhash_lsh_pairs.max_band_size``): a bucket holding a giant cluster of
    near-identical embeddings would make the self-join quadratic in the
    cluster size; capped buckets drop out (their members still pair through
    their other bands unless every band is pathological — i.e. the vectors
    are near-identical, which exact/minhash dedup already catches).
    """
    from pyspark.sql import Window

    if dim is None:
        dim = len(embeddings.select(vec_col).first()[0])

    base = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
    sig_cols = []
    for band in range(n_bands):
        planes = _hyperplanes(dim, n_planes, salt=f"b{band}:")
        sig_cols.append(_bucket_col(F.col("v"), planes).alias(f"k{band}"))
    sigs = base.select("vec_id", *sig_cols)
    long = sigs.select(
        "vec_id",
        F.explode(
            F.array(*[
                F.struct(F.lit(band).alias("band"), F.col(f"k{band}").alias("key"))
                for band in range(n_bands)
            ])
        ).alias("bk"),
    ).select("vec_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    if max_bucket_size is not None:
        w = Window.partitionBy("band", "key")
        long = (
            long.withColumn("_sz", F.count(F.lit(1)).over(w))
            .where(F.col("_sz") <= max_bucket_size)
            .drop("_sz")
        )
    a, b = long.alias("a"), long.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b"))
        .distinct()
    )
    va = base.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
    vb = base.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", cosine_col(F.col("va"), F.col("vb")).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


# ---------------------------------------------------------------------------
# Sign-LSH (random hyperplane) bucketed ANN — the scale path
# ---------------------------------------------------------------------------


def _hyperplanes(dim: int, n_planes: int, salt: str = "") -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: component (p, d) is derived
    from md5(f"{salt}{p}#{d}") mapped to [-1, 1). No RNG state — any
    executor, any run, any engine rebuilds the identical planes. ``salt``
    keys independent plane families (one per LSH band)."""
    import hashlib

    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{salt}{p}#{d}".encode()).hexdigest()
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
    score_rounding: int | None = None,
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
    exactly and takes top-k. "Approximate" means recall only: the candidate
    set is a deterministic function of the md5-derived hyperplanes, and
    scoring within it is exact — so the output IS SQL-oracle-checkable
    (``__spark_entry__`` mirrors the buckets/probes construct-for-construct
    in DuckDB). ``score_rounding`` rounds the cosine BEFORE ranking so rank
    boundaries are decided on values both engines agree on bit-for-bit
    (the cross-engine 1-ulp reconciliation used by every oracle-gated
    ranking path). Recall-vs-brute gate: tests/test_pipeline_ops.py.
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

    raw = cosine_col(F.col("v"), F.col("qv"))
    scored = bucketed.join(F.broadcast(qb), "bucket").select(
        "query_id",
        "vec_id",
        (F.round(raw, score_rounding) if score_rounding is not None else raw).alias(
            "score"
        ),
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
    no RNG. Each Lloyd iteration is ONE Spark pass: a mapInPandas kernel that
    assigns each Arrow batch to its nearest centroid AND accumulates the
    per-cluster partial vector sums in numpy, emitting at most ``n_clusters``
    tiny (cluster, sum, count) rows per batch. The driver reduces those
    (n_partitions x n_clusters rows — KBs at any corpus scale) and
    renormalizes. No per-dimension aggregate expressions: the plan width is
    constant in ``dim``, so dim 1536+ builds the same 3-node plan as dim 16
    (the old ``F.array(*[F.sum(v[i]) ...])`` form blew up codegen past a few
    hundred dims).
    """
    import numpy as np
    import pandas as pd

    seed_rows = (
        embeddings.orderBy(id_col).limit(n_clusters).select(vec_col).collect()
    )
    C = np.array([r[0] for r in seed_rows], dtype=np.float64)
    C /= np.linalg.norm(C, axis=1, keepdims=True)
    dim = C.shape[1]

    base = embeddings.select(F.col(vec_col).cast("array<double>").alias("v"))

    for _ in range(n_iters):
        Ct = C  # rebind for closure capture per iteration

        def partial_sums(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                M = np.stack(pdf["v"].to_numpy())
                M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
                cl = (M @ Ct.T).argmax(axis=1)
                sums = np.zeros((Ct.shape[0], dim), dtype=np.float64)
                np.add.at(sums, cl, M)
                counts = np.bincount(cl, minlength=Ct.shape[0])
                present = np.flatnonzero(counts)
                yield pd.DataFrame(
                    {
                        "cluster": present.astype("int32"),
                        "s": [sums[c].tolist() for c in present],
                        "n": counts[present].astype("int64"),
                    }
                )

        rows = base.mapInPandas(
            partial_sums, schema="cluster int, s array<double>, n long"
        ).collect()
        newC = C.copy()
        total = np.zeros((C.shape[0], dim), dtype=np.float64)
        seen = np.zeros(C.shape[0], dtype=bool)
        for r in rows:
            total[r["cluster"]] += np.asarray(r["s"], dtype=np.float64)
            seen[r["cluster"]] = True
        for c in np.flatnonzero(seen):
            nrm = np.linalg.norm(total[c])
            if nrm > 0:
                newC[c] = total[c] / nrm
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


@dataclass
class IVFIndex:
    """Trained coarse quantizer + persisted cluster assignment.

    ``assigned`` is the (vec_id, v, cluster) DataFrame, persisted: in a
    deployment this is a precomputed column the table is clustered by, so a
    probe reads only its clusters' files. Build once with ``build_ivf``,
    query many times with ``ann_ivf_topk`` — no per-query retrain/reassign.
    """

    centroids: object  # numpy (n_clusters, dim), rows L2-normalized
    assigned: DataFrame  # (vec_id, v array<double> normalized-on-score, cluster)


def build_ivf(
    embeddings: DataFrame,
    n_clusters: int = 16,
    n_iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> IVFIndex:
    """Train the coarse quantizer and persist the cluster assignment."""
    centroids = train_ivf_centroids(
        embeddings, n_clusters, n_iters=n_iters, id_col=id_col, vec_col=vec_col
    )
    assigned = assign_ivf_clusters(embeddings, centroids, id_col, vec_col).persist()
    return IVFIndex(centroids=centroids, assigned=assigned)


def ann_ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    top_k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    centroids=None,
    ivf: IVFIndex | None = None,
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
    n_clusters x n_probe; exact within the probed set. Pass ``ivf`` (from
    ``build_ivf``) to reuse a trained quantizer + persisted assignment across
    query batches.
    """
    import numpy as np

    if ivf is not None:
        centroids, assigned = ivf.centroids, ivf.assigned
    else:
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


# --- exact-fold IVF (cross-engine-verifiable mode) ---------------------------


def _unit_norm_df(
    embeddings: DataFrame, id_col: str, vec_col: str, out_id: str = "vec_id"
) -> DataFrame:
    """(vec_id, v): L2-normalized float64 vectors via left-to-right folds.

    Every float op here (square-sum fold, sqrt, per-element divide) has a
    bit-identical DuckDB twin (list_sum / sqrt / list_transform), which is the
    whole point of the exact mode: no numpy pairwise summation anywhere.
    """
    v = F.col(vec_col).cast("array<double>")
    nrm = F.greatest(F.sqrt(_dot(v, v)), F.lit(1e-12))
    return embeddings.select(
        F.col(id_col).alias(out_id), F.transform(v, lambda x: x / nrm).alias("v")
    )


def train_ivf_centroids_exact(
    embeddings: DataFrame,
    n_clusters: int = 16,
    n_iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Spherical k-means with fold arithmetic only — the SQL-mirrorable twin
    of ``train_ivf_centroids``.

    Same math as the production numpy-kernel trainer (init = n_clusters
    lowest-id normalized vectors; Lloyd assign = argmax dot, ties to the
    lower cluster id; update = member-vector sum renormalized to unit length,
    empty clusters keep their previous centroid) but every float reduction is
    an explicit left-to-right fold (``F.aggregate``/``zip_with``, members
    added in vec_id order), so a DuckDB oracle built from list_sum /
    list_reduce / list_transform reproduces the centroids BIT-EXACTLY.
    numpy's pairwise summation makes the production kernel ~1e-12 different —
    same clusters in practice (asserted in pytest), but not hashable against
    SQL; this mode is what the driver CORRECTNESS entry runs.

    Scale note: one crossJoin(broadcast centroids) + one groupBy per Lloyd
    iteration, plan width constant in dim; the per-cluster ordered fold is
    the only non-partial aggregation (it collects each cluster's members into
    one task). The numpy trainer stays the 10^12-row path; this mode's job is
    cross-engine verifiability at test scale.
    """
    spark = embeddings.sparkSession
    nv = _unit_norm_df(embeddings, id_col, vec_col).persist()
    seed = nv.orderBy("vec_id").limit(n_clusters).collect()
    cents = [list(r["v"]) for r in seed]
    dim = len(cents[0])
    zero = F.array_repeat(F.lit(0.0), dim)
    from pyspark.sql import Window

    for _ in range(n_iters):
        cent_df = spark.createDataFrame(
            [(i, c) for i, c in enumerate(cents)], "cluster int, c array<double>"
        )
        w = Window.partitionBy("vec_id").orderBy(F.desc("dot"), F.asc("cluster"))
        asg = (
            nv.crossJoin(F.broadcast(cent_df))
            .select(
                "vec_id", "v", "cluster", _dot(F.col("v"), F.col("c")).alias("dot")
            )
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
        )
        agg = (
            asg.groupBy("cluster")
            .agg(
                F.sort_array(
                    F.collect_list(
                        F.struct(F.col("vec_id").alias("i"), F.col("v").alias("mv"))
                    )
                ).alias("lv")
            )
            .select(
                "cluster",
                F.aggregate(
                    F.col("lv"),
                    zero,
                    lambda acc, s: F.zip_with(acc, s["mv"], lambda a, b: a + b),
                ).alias("total"),
            )
            .select(
                "cluster",
                "total",
                F.sqrt(
                    F.aggregate(F.col("total"), F.lit(0.0), lambda a, x: a + x * x)
                ).alias("nrm"),
            )
        )
        by_cluster = {r["cluster"]: r for r in agg.collect()}
        cents = [
            [x / r["nrm"] for x in r["total"]]
            if (r := by_cluster.get(i)) is not None and r["nrm"] > 0
            else old
            for i, old in enumerate(cents)
        ]
    nv.unpersist()
    return cents


def ann_ivf_topk_exact(
    embeddings: DataFrame,
    queries: DataFrame,
    top_k: int = 10,
    n_clusters: int = 16,
    n_iters: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """(query_id, rank, vec_id, score): IVF top-k in exact-fold mode.

    Identical IVF semantics to ``ann_ivf_topk`` (train coarse quantizer,
    assign corpus under the final centroids, probe the n_probe nearest
    clusters per query, exact cosine within the probed set, ties to the lower
    vec_id) but built entirely from fold arithmetic on normalized vectors so
    the unrolled-Lloyd DuckDB oracle (SQL_ANN_TOPK_IVF in
    plans/pipeline_entry.py) reproduces every score bit-for-bit — this is
    what upgrades the driver's ann_topk_ivf entry from rows-only to a full
    value-hash check. Scores equal dot(unit_q, unit_v), which IS the cosine.
    """
    spark = embeddings.sparkSession
    cents = train_ivf_centroids_exact(
        embeddings, n_clusters, n_iters=n_iters, id_col=id_col, vec_col=vec_col
    )
    cent_df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)], "cluster int, c array<double>"
    )
    from pyspark.sql import Window

    nv = _unit_norm_df(embeddings, id_col, vec_col)
    wa = Window.partitionBy("vec_id").orderBy(F.desc("dot"), F.asc("cluster"))
    assigned = (
        nv.crossJoin(F.broadcast(cent_df))
        .select("vec_id", "v", "cluster", _dot(F.col("v"), F.col("c")).alias("dot"))
        .withColumn("rn", F.row_number().over(wa))
        .where(F.col("rn") == 1)
        .select("vec_id", "v", "cluster")
    )
    qn = _unit_norm_df(queries, query_id_col, query_vec_col, out_id="query_id")
    qn = qn.withColumnRenamed("v", "qv")
    wp = Window.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("cluster"))
    probes = (
        qn.crossJoin(F.broadcast(cent_df))
        .select("query_id", "qv", "cluster", _dot(F.col("qv"), F.col("c")).alias("dot"))
        .withColumn("rn", F.row_number().over(wp))
        .where(F.col("rn") <= n_probe)
        .select("query_id", "qv", "cluster")
    )
    scored = assigned.join(F.broadcast(probes), "cluster").select(
        "query_id", "vec_id", _dot(F.col("v"), F.col("qv")).alias("score")
    )
    wr = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= top_k)
        .select("query_id", "rank", "vec_id", "score")
    )


# --- int8 scalar quantization (the memory-bandwidth scale path) ---------------


def quantize_sq8(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, q8, scale, nrm): symmetric per-vector int8 scalar quantization —
    the FAISS ``SQ8`` / Lucene ``int8`` dense_vector storage analog.

    q8[i] = floor(v[i] / scale * 127 + 0.5) with scale = max(|v[i]|), so every
    code lies in [-127, 127] and dequantization is ``q8[i] * scale / 127``.
    ``nrm`` is the exact float64 L2 norm, kept so quantized dot products can
    be turned into approximate cosines without touching the full vectors.
    All arithmetic is engine-portable (float64 ops + ``floor``) — the driver
    oracle reproduces the codes exactly.

    At scale this is the point: a 4x-smaller scan-resident representation
    (1 byte/dim + 2 scalars) whose candidate scoring is an integer dot —
    full-precision vectors are only read for the top-candidate rescore.
    """
    v = F.col(vec_col).cast("array<double>")
    based = vectors.select(
        F.col(id_col), *keep_cols, v.alias("_v"),
        F.array_max(F.transform(v, lambda x: F.abs(x))).alias("scale"),
    )
    q = F.when(
        F.col("scale") > 0,
        F.transform(F.col("_v"), lambda x: F.floor(x / F.col("scale") * 127.0 + 0.5)),
    ).otherwise(F.transform(F.col("_v"), lambda x: F.lit(0).cast("long")))
    return based.select(
        id_col,
        *keep_cols,
        q.alias("q8"),
        "scale",
        F.sqrt(_dot(F.col("_v"), F.col("_v"))).alias("nrm"),
    )


def _int_dot(a: Column, b: Column) -> Column:
    """Exact integer dot product of two int8-code arrays (order-insensitive)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def ann_sq8_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    top_k: int = 10,
    candidates: int = 40,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    rounding: int = 6,
    quantized: DataFrame | None = None,
) -> DataFrame:
    """(query_id, rank, vec_id, score): two-stage quantized search — int8
    candidate scan, exact-cosine rescore of the top ``candidates`` per query.

    Pass ``quantized`` (a materialized :func:`quantize_sq8` output, e.g. a
    parquet table built once at ingest) to make stage 1 scan ONLY the
    4x-smaller code relation — the intended at-rest layout at scale; without
    it the codes are derived inline (correct, but the scan reads the full
    vectors anyway).

    Stage 1 scores every vector with the integer dot of the int8 codes,
    scaled back to an approximate cosine:

        approx = (dotq * scale_d * scale_q / 127^2) / (nrm_d * nrm_q)

    and cuts to ``candidates`` per query on the ``rounding``-rounded value
    (vec_id ties) — all arithmetic deterministic cross-engine. Stage 2 joins
    ONLY those candidates back to the full-precision vectors and ranks the
    exact cosine. With ``candidates >= top_k`` the result equals brute force
    whenever no true top-k vector falls below the candidate cut — the
    recall-vs-brute pytest gate pins that margin on real data; the driver
    oracle reproduces both stages exactly.
    """
    dz = (
        quantized
        if quantized is not None
        else quantize_sq8(embeddings, id_col=id_col, vec_col=vec_col)
    )
    qz = quantize_sq8(
        queries.select(
            F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("qv")
        ),
        id_col="query_id",
        vec_col="qv",
    ).select(
        "query_id", F.col("q8").alias("qq8"),
        F.col("scale").alias("qscale"), F.col("nrm").alias("qnrm"),
    )
    from pyspark.sql import Window

    approx = (
        _int_dot(F.col("q8"), F.col("qq8")).cast("double")
        * F.col("scale") * F.col("qscale") / F.lit(16129.0)
    ) / (F.col("nrm") * F.col("qnrm"))
    cand = (
        dz.crossJoin(F.broadcast(qz))
        .select(
            "query_id", F.col(id_col).alias("vec_id"),
            F.round(approx, rounding).alias("approx"),
        )
    )
    wc = Window.partitionBy("query_id").orderBy(F.desc("approx"), F.asc("vec_id"))
    kept = (
        cand.withColumn("crank", F.row_number().over(wc))
        .where(F.col("crank") <= candidates)
        .select("query_id", "vec_id")
    )
    full = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("fv")
    )
    qfull = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("qfv")
    )
    rescored = (
        kept.join(full, "vec_id")
        .join(F.broadcast(qfull), "query_id")
        .select(
            "query_id", "vec_id",
            F.round(cosine_col(F.col("fv"), F.col("qfv")), rounding).alias("score"),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        rescored.withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= top_k)
        .select("query_id", "rank", "vec_id", "score")
    )
