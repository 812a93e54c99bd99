"""Driver-contract entries for the training-data pipeline operators.

Same contract as driver_entry.py: every operator gets a (queries, oracle_sql)
pair over the driver's sf-dir tables, with identical column names and
identical rounding on both sides. The SQL mirrors the Spark expressions
construct-for-construct (same md5-derived hashing, same floor-divisions,
same double arithmetic), so the driver's order-insensitive value-hash
matches bit-for-bit after 6dp rounding.

Every entry — including IVF ANN, whose Lloyd iterations run in exact-fold
mode and are mirrored by an unrolled-CTE oracle — has a full value-hash
SQL check; "approximate" operators are additionally pinned by pytest
recall-vs-brute-force gates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import pii as PII
from ..functions import text_analysis as TA
from ..functions import urls as UR
from ..operators import dedup as DD
from ..operators import multimodal as MM
from ..operators import similarity as SIM

# --- shared SQL fragments ----------------------------------------------------

_TOKS = """
tok_arr AS (
  SELECT doc_id, text, regexp_extract_all(lower(text), '\\w+') AS t FROM documents
),
toks AS (SELECT doc_id, unnest(t) AS term FROM tok_arr)
"""

_SHINGLES = """
sh AS (
  SELECT DISTINCT doc_id,
         unnest(CASE WHEN len(t) >= 3
           THEN [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                 for i in generate_series(1, len(t) - 2)]
           ELSE CAST([] AS VARCHAR[]) END) AS shingle
  FROM tok_arr
)
"""

_JACCARD_TAIL = """
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_inter
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.doc_a
  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
  GROUP BY c.doc_a, c.doc_b
)
SELECT i.doc_a, i.doc_b,
       round(i.n_inter * 1.0 / (za.n_sh + zb.n_sh - i.n_inter), 6) AS jaccard
FROM inter i
JOIN sizes za ON za.doc_id = i.doc_a
JOIN sizes zb ON zb.doc_id = i.doc_b
WHERE i.n_inter * 1.0 / (za.n_sh + zb.n_sh - i.n_inter) >= {threshold}
"""

_DOT = (
    "list_sum(list_transform(generate_series(1, len({a})), "
    "i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE))"
)


def _cos_sql(a: str, b: str) -> str:
    return (
        f"({_DOT.format(a=a, b=b)} / "
        f"(sqrt({_DOT.format(a=a, b=a)}) * sqrt({_DOT.format(a=b, b=b)})))"
    )


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# --- dedup -------------------------------------------------------------------


def q_dedup_exact(spark, sf_dir):
    return DD.exact_dedup_groups(_docs(spark, sf_dir)).select(
        "group_hash", F.col("rep_doc_id").cast("long"), F.col("n_docs").cast("long")
    )


SQL_DEDUP_EXACT = """
SELECT md5(text) AS group_hash, min(doc_id) AS rep_doc_id, count(*) AS n_docs
FROM documents GROUP BY md5(text)
"""


def q_dedup_minhash(spark, sf_dir):
    return DD.minhash_lsh_pairs(_docs(spark, sf_dir), threshold=0.3).select(
        F.col("doc_a").cast("long"),
        F.col("doc_b").cast("long"),
        F.round("jaccard", 6).alias("jaccard"),
    )


SQL_DEDUP_MINHASH = f"""
WITH {_TOKS},
{_SHINGLES},
mh AS (
  SELECT doc_id, i, min(md5(i::VARCHAR || '#' || shingle)) AS h
  FROM sh, range(12) r(i)
  GROUP BY doc_id, i
),
bands AS (
  SELECT doc_id, i // 3 AS band, md5(string_agg(h, '#' ORDER BY i)) AS band_key
  FROM mh GROUP BY doc_id, i // 3
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
              AND a.doc_id < b.doc_id
),
{_JACCARD_TAIL.format(threshold=0.3)}
"""


def q_dedup_components(spark, sf_dir):
    """Near-dup clusters: connected components over the LSH-verified pairs;
    oracle uses WITH RECURSIVE reachability over the same pairs."""
    return DD.dedup_components(_docs(spark, sf_dir), threshold=0.3).select(
        F.col("doc_id").cast("long"), F.col("component").cast("long")
    )


# the minhash pair CTE chain with the final select folded into a `pairs` CTE
_MINHASH_PAIR_CTES = (
    SQL_DEDUP_MINHASH.strip()[len("WITH") :].rsplit("SELECT", 1)[0]
    + ",\npairs AS (SELECT"
    + SQL_DEDUP_MINHASH.strip().rsplit("SELECT", 1)[1]
    + ")"
)

SQL_DEDUP_COMPONENTS = f"""
WITH RECURSIVE {_MINHASH_PAIR_CTES},
nodes AS (
  SELECT doc_a AS doc_id FROM pairs UNION SELECT doc_b FROM pairs
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL
  SELECT doc_b AS a, doc_a AS b FROM pairs
),
reach(src, node) AS (
  SELECT doc_id, doc_id FROM nodes
  UNION
  SELECT r.src, e.b FROM reach r JOIN edges e ON e.a = r.node
)
SELECT src AS doc_id, min(node) AS component FROM reach GROUP BY src
"""


def q_dedup_ngram(spark, sf_dir):
    return DD.ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.3).select(
        F.col("doc_a").cast("long"),
        F.col("doc_b").cast("long"),
        F.round("jaccard", 6).alias("jaccard"),
    )


SQL_DEDUP_NGRAM = f"""
WITH {_TOKS},
{_SHINGLES},
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
),
{_JACCARD_TAIL.format(threshold=0.3)}
"""


def q_dedup_simhash(spark, sf_dir):
    return DD.simhash_pairs(_docs(spark, sf_dir), max_hamming=3).select(
        F.col("doc_a").cast("long"),
        F.col("doc_b").cast("long"),
        F.col("hamming").cast("long"),
    )


SQL_DEDUP_SIMHASH = f"""
WITH {_TOKS},
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
votes AS (
  SELECT doc_id, j,
         sum(tf * (2 * (((strpos('0123456789abcdef',
                                 substr(md5(term), (j // 4) + 1, 1)) - 1)
                          >> (j % 4)) & 1) - 1)) AS v
  FROM tf, range(48) r(j)
  GROUP BY doc_id, j
),
fp AS (
  SELECT doc_id,
         sum(CASE WHEN v > 0 THEN (1::BIGINT << j) ELSE 0::BIGINT END) AS fp
  FROM votes GROUP BY doc_id
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.fp, b.fp))::BIGINT AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.fp, b.fp)) <= 3
"""


# --- similarity --------------------------------------------------------------


def _query_vecs(spark, sf_dir):
    return (
        _emb(spark, sf_dir)
        .where(F.col("vec_id") < 5)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
    )


def q_ann_topk_brute(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    scored = emb.crossJoin(F.broadcast(_query_vecs(spark, sf_dir))).select(
        "query_id",
        "vec_id",
        F.round(SIM.cosine_col(F.col("embedding"), F.col("qv")), 6).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 10)
        .select(
            F.col("query_id").cast("long"),
            F.col("rank").cast("long"),
            F.col("vec_id").cast("long"),
            "score",
        )
    )


SQL_ANN_TOPK_BRUTE = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5
),
scored AS (
  SELECT q.query_id, e.vec_id,
         round({_cos_sql('e.embedding', 'q.qv')}, 6) AS score
  FROM embeddings e CROSS JOIN q
),
ranked AS (
  SELECT query_id, vec_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, rank, vec_id, score FROM ranked WHERE rank <= 10
"""


def q_emb_cosine_pairs(spark, sf_dir):
    return SIM.cosine_pairs(_emb(spark, sf_dir), threshold=0.3).select(
        F.col("id_a").cast("long"),
        F.col("id_b").cast("long"),
        F.round("cosine", 6).alias("cosine"),
    )


SQL_EMB_COSINE_PAIRS = f"""
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round({_cos_sql('a.embedding', 'b.embedding')}, 6) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE {_cos_sql('a.embedding', 'b.embedding')} >= 0.3
"""


# banded sign-LSH near-dup: the production embedding-dedup path (cosine_pairs
# is the O(N^2) verifier). The oracle reproduces the md5-derived hyperplanes
# as literal arrays and is EXACT on the candidate set — same contract as
# dedup_minhash_lsh (the only approximation is recall; the candidate
# generation itself is deterministic and mirrored construct-for-construct).
_ND_BANDS, _ND_PLANES, _ND_DIM, _ND_THRESHOLD = 4, 6, 64, 0.3


def q_emb_near_dup_lsh(spark, sf_dir):
    return SIM.near_dup_pairs_lsh(
        _emb(spark, sf_dir),
        threshold=_ND_THRESHOLD,
        n_bands=_ND_BANDS,
        n_planes=_ND_PLANES,
        dim=_ND_DIM,
    ).select(
        F.col("id_a").cast("long"),
        F.col("id_b").cast("long"),
        F.round("cosine", 6).alias("cosine"),
    )


def _near_dup_sql() -> str:
    from ..operators.similarity import _hyperplanes

    rows = []
    for band in range(_ND_BANDS):
        planes = _hyperplanes(_ND_DIM, _ND_PLANES, salt=f"b{band}:")
        for p, w in enumerate(planes):
            lit = "[" + ", ".join(repr(c) for c in w) + "]"
            rows.append(f"({band}, {p}, {lit})")
    dot = (
        f"list_sum(list_transform(generate_series(1, {_ND_DIM}), "
        "i -> e.embedding[i]::DOUBLE * pl.w[i]))"
    )
    return f"""
WITH planes(band, p, w) AS (VALUES {", ".join(rows)}),
sig AS (
  SELECT e.vec_id, pl.band,
         sum(CASE WHEN {dot} > 0 THEN (1 << pl.p) ELSE 0 END) AS key
  FROM embeddings e CROSS JOIN planes pl
  GROUP BY e.vec_id, pl.band
),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM sig a JOIN sig b ON a.band = b.band AND a.key = b.key
                       AND a.vec_id < b.vec_id
),
pairs AS (
  SELECT c.id_a, c.id_b, {_cos_sql('ea.embedding', 'eb.embedding')} AS cosine
  FROM cand c
  JOIN embeddings ea ON ea.vec_id = c.id_a
  JOIN embeddings eb ON eb.vec_id = c.id_b
)
SELECT id_a, id_b, round(cosine, 6) AS cosine
FROM pairs WHERE cosine >= {_ND_THRESHOLD}
"""


SQL_EMB_NEAR_DUP_LSH = _near_dup_sql()


_IVF_K, _IVF_ITERS, _IVF_PROBE, _IVF_TOPK, _IVF_DIM = 16, 5, 4, 10, 64


def q_ann_topk_ivf(spark, sf_dir):
    # IVF coarse-quantizer pruning in exact-fold mode: the deterministic-init
    # Lloyd iterations use left-to-right fold arithmetic only, so the
    # unrolled-Lloyd DuckDB oracle below reproduces the centroids — and every
    # probed-set cosine — bit-for-bit (same pattern that got sign-LSH its
    # full oracle). The numpy-kernel trainer (build_ivf/ann_ivf_topk) stays
    # the 10^12-row production path; centroid parity between the two modes is
    # asserted in pytest. "Approximate" remains recall-only (pytest gate
    # vs brute force).
    return SIM.ann_ivf_topk_exact(
        _emb(spark, sf_dir),
        _query_vecs(spark, sf_dir),
        top_k=_IVF_TOPK,
        n_clusters=_IVF_K,
        n_iters=_IVF_ITERS,
        n_probe=_IVF_PROBE,
        query_vec_col="qv",
    ).select(
        F.col("query_id").cast("long"),
        F.col("rank").cast("long"),
        F.col("vec_id").cast("long"),
        "score",
    )


def _ivf_sql() -> str:
    """Unrolled-Lloyd DuckDB mirror of ``ann_ivf_topk_exact``.

    Generated, not hand-written: one (assign, ordered-fold-sum, renormalize)
    CTE triple per Lloyd iteration. Bit-exactness contract with the Spark
    side: dot = list_sum over in-order products == F.aggregate(zip_with)
    fold; member sums fold in vec_id order from a zero vector ==
    sort_array(collect_list) + F.aggregate(zip_with add); renormalize =
    x / sqrt(list_sum(squares)); empty clusters keep the previous centroid.
    """

    def dot(a: str, b: str) -> str:
        return (
            f"list_sum(list_transform(generate_series(1, len({a})), "
            f"i -> {a}[i] * {b}[i]))"
        )

    def unit(col: str) -> str:
        sq = f"list_sum(list_transform({col}::DOUBLE[], y -> y::DOUBLE * y::DOUBLE))"
        return (
            f"list_transform({col}::DOUBLE[], "
            f"x -> x::DOUBLE / greatest(sqrt({sq}), 1e-12))"
        )

    zero = f"list_transform(generate_series(1, {_IVF_DIM}), i -> 0.0::DOUBLE)"
    parts = [
        f"WITH nv AS (SELECT vec_id, {unit('embedding')} AS v FROM embeddings)",
        f"""cent0 AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cluster, v AS c
  FROM (SELECT vec_id, v FROM nv ORDER BY vec_id LIMIT {_IVF_K})
)""",
    ]
    for t in range(_IVF_ITERS):
        parts.append(f"""asg{t} AS (
  SELECT vec_id, v, cluster FROM (
    SELECT nv.vec_id, nv.v, c.cluster,
           ROW_NUMBER() OVER (PARTITION BY nv.vec_id
                              ORDER BY {dot('nv.v', 'c.c')} DESC, c.cluster) AS rn
    FROM nv CROSS JOIN cent{t} c
  ) WHERE rn = 1
)""")
        parts.append(f"""agg{t} AS (
  SELECT cluster,
         list_reduce(list_prepend({zero}, list(v ORDER BY vec_id)),
                     (a, b) -> list_transform(a, (x, i) -> x + b[i])) AS total
  FROM asg{t} GROUP BY cluster
)""")
        parts.append(f"""cent{t + 1} AS (
  SELECT p.cluster,
         CASE WHEN a.cluster IS NOT NULL
                   AND sqrt(list_sum(list_transform(a.total, x -> x * x))) > 0
              THEN list_transform(a.total,
                     x -> x / sqrt(list_sum(list_transform(a.total, y -> y * y))))
              ELSE p.c END AS c
  FROM cent{t} p LEFT JOIN agg{t} a USING (cluster)
)""")
    fin = f"cent{_IVF_ITERS}"
    parts.append(f"""asg_final AS (
  SELECT vec_id, v, cluster FROM (
    SELECT nv.vec_id, nv.v, c.cluster,
           ROW_NUMBER() OVER (PARTITION BY nv.vec_id
                              ORDER BY {dot('nv.v', 'c.c')} DESC, c.cluster) AS rn
    FROM nv CROSS JOIN {fin} c
  ) WHERE rn = 1
)""")
    parts.append(
        f"qn AS (SELECT vec_id AS query_id, {unit('embedding')} AS qv "
        f"FROM embeddings WHERE vec_id < 5)"
    )
    parts.append(f"""probes AS (
  SELECT query_id, qv, cluster FROM (
    SELECT q.query_id, q.qv, c.cluster,
           ROW_NUMBER() OVER (PARTITION BY q.query_id
                              ORDER BY {dot('q.qv', 'c.c')} DESC, c.cluster) AS rn
    FROM qn q CROSS JOIN {fin} c
  ) WHERE rn <= {_IVF_PROBE}
)""")
    tail = f"""SELECT query_id, rank, vec_id, score FROM (
  SELECT p.query_id, a.vec_id,
         {dot('a.v', 'p.qv')} AS score,
         ROW_NUMBER() OVER (PARTITION BY p.query_id
                            ORDER BY {dot('a.v', 'p.qv')} DESC, a.vec_id) AS rank
  FROM asg_final a JOIN probes p USING (cluster)
) WHERE rank <= {_IVF_TOPK}"""
    return ",\n".join(parts) + "\n" + tail


SQL_ANN_TOPK_IVF = _ivf_sql()


# sign-LSH ANN: the candidate set (buckets + multi-probe flips) is a
# deterministic function of the md5-derived hyperplanes and scoring within it
# is exact, so — unlike IVF, whose iterative float k-means cannot be mirrored
# in SQL — this path gets a full oracle: DuckDB rebuilds the same planes as
# literals, the same 6-bit buckets, the same hamming<=2 probe masks, and
# ranks by the same 6dp-rounded cosine. "Approximate" remains recall-only
# (gated against brute force in pytest).
_LSH_PLANES, _LSH_DIM, _LSH_PROBE_H, _LSH_TOPK = 6, 64, 2, 10


def q_ann_topk_lsh(spark, sf_dir):
    return SIM.ann_lsh_topk(
        _emb(spark, sf_dir),
        _query_vecs(spark, sf_dir),
        top_k=_LSH_TOPK,
        n_planes=_LSH_PLANES,
        probe_hamming=_LSH_PROBE_H,
        dim=_LSH_DIM,
        score_rounding=6,
        query_vec_col="qv",
    ).select(
        F.col("query_id").cast("long"),
        F.col("rank").cast("long"),
        F.col("vec_id").cast("long"),
        "score",
    )


def _ann_lsh_sql() -> str:
    from ..operators.similarity import _hyperplanes

    planes = _hyperplanes(_LSH_DIM, _LSH_PLANES)
    rows = []
    for p, w in enumerate(planes):
        lit = "[" + ", ".join(repr(c) for c in w) + "]"
        rows.append(f"({p}, {lit})")
    masks = [0] + [1 << p for p in range(_LSH_PLANES)]
    if _LSH_PROBE_H >= 2:
        masks += [
            (1 << p) | (1 << q)
            for p in range(_LSH_PLANES)
            for q in range(p + 1, _LSH_PLANES)
        ]
    mask_rows = ", ".join(f"({m})" for m in masks)
    dot = (
        f"list_sum(list_transform(generate_series(1, {_LSH_DIM}), "
        "i -> e.embedding[i]::DOUBLE * pl.w[i]))"
    )
    return f"""
WITH planes(p, w) AS (VALUES {", ".join(rows)}),
masks(m) AS (VALUES {mask_rows}),
sig AS (
  SELECT e.vec_id,
         sum(CASE WHEN {dot} > 0 THEN (1 << pl.p) ELSE 0 END) AS key
  FROM embeddings e CROSS JOIN planes pl
  GROUP BY e.vec_id
),
probes AS (
  SELECT s.vec_id AS query_id, xor(s.key, m.m) AS bucket
  FROM sig s CROSS JOIN masks m WHERE s.vec_id < 5
),
scored AS (
  SELECT p.query_id, s.vec_id,
         round({_cos_sql('e.embedding', 'q.embedding')}, 6) AS score
  FROM probes p
  JOIN sig s ON s.key = p.bucket
  JOIN embeddings e ON e.vec_id = s.vec_id
  JOIN embeddings q ON q.vec_id = p.query_id
),
ranked AS (
  SELECT query_id, vec_id, score,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, rank, vec_id, score FROM ranked WHERE rank <= {_LSH_TOPK}
"""


SQL_ANN_TOPK_LSH = _ann_lsh_sql()


# --- text analysis -----------------------------------------------------------


def q_text_token_profile(spark, sf_dir):
    return TA.token_profile(_docs(spark, sf_dir)).select(
        F.col("doc_id").cast("long"),
        F.col("n_tokens").cast("long"),
        F.col("n_distinct").cast("long"),
        F.round("ttr", 6).alias("ttr"),
    )


SQL_TEXT_TOKEN_PROFILE = f"""
WITH {_TOKS}
SELECT doc_id, len(t)::BIGINT AS n_tokens,
       len(list_distinct(t))::BIGINT AS n_distinct,
       round(CASE WHEN len(t) > 0
             THEN len(list_distinct(t)) * 1.0 / len(t) ELSE 0.0 END, 6) AS ttr
FROM tok_arr
"""

_SW_EN = ", ".join(f"'{w}'" for w in TA.STOPWORDS["en"])


def q_text_quality(spark, sf_dir):
    return TA.quality_score(_docs(spark, sf_dir)).select(
        F.col("doc_id").cast("long"), F.round("quality", 6).alias("quality")
    )


SQL_TEXT_QUALITY = f"""
WITH {_TOKS},
c AS (
  SELECT doc_id,
         len(t) AS n_tok,
         CASE WHEN len(t) > 0
              THEN list_sum(list_transform(t, x -> strlen(x))) * 1.0 / len(t)
              ELSE 0.0 END AS mean_wl,
         CASE WHEN strlen(text) > 0
              THEN strlen(regexp_replace(lower(text), '[^a-z0-9_]', '', 'g')) * 1.0
                   / strlen(text)
              ELSE 0.0 END AS alpha_ratio,
         CASE WHEN len(t) > 0
              THEN len(list_filter(t, x -> list_contains([{_SW_EN}], x))) * 1.0 / len(t)
              ELSE 0.0 END AS stop_ratio
  FROM tok_arr
)
SELECT doc_id,
       round(0.3 * (CASE WHEN n_tok BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END)
           + 0.2 * (CASE WHEN mean_wl BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.0 END)
           + 0.3 * least(alpha_ratio / 0.8, 1.0)
           + 0.2 * least(stop_ratio / 0.3, 1.0), 6) AS quality
FROM c
"""

_BUDGET_TOKENS = 50_000


def q_select_token_budget(spark, sf_dir):
    """Token-budget curation (``operators/curation.py``): best-quality docs
    filling a 50k-token budget, 2-pass histogram split (no global sort)."""
    from ..operators.curation import select_token_budget

    docs = _docs(spark, sf_dir)
    scored = TA.quality_score(docs).join(
        TA.token_profile(docs).select("doc_id", "n_tokens"), "doc_id"
    )
    sel = select_token_budget(scored, _BUDGET_TOKENS, precision=3)
    return sel.select(
        F.col("doc_id").cast("long"),
        "quality",
        F.col("n_tokens").cast("long").alias("n_tokens"),
    )


# the oracle states the CONTRACT form — one running-total window over the
# (quality desc, doc_id) order — which the two-pass histogram implementation
# must reproduce exactly
SQL_SELECT_TOKEN_BUDGET = f"""
WITH {_TOKS},
c AS (
  SELECT doc_id,
         len(t) AS n_tok,
         CASE WHEN len(t) > 0
              THEN list_sum(list_transform(t, x -> strlen(x))) * 1.0 / len(t)
              ELSE 0.0 END AS mean_wl,
         CASE WHEN strlen(text) > 0
              THEN strlen(regexp_replace(lower(text), '[^a-z0-9_]', '', 'g')) * 1.0
                   / strlen(text)
              ELSE 0.0 END AS alpha_ratio,
         CASE WHEN len(t) > 0
              THEN len(list_filter(t, x -> list_contains([{_SW_EN}], x))) * 1.0 / len(t)
              ELSE 0.0 END AS stop_ratio
  FROM tok_arr
),
scored AS (
  SELECT doc_id,
         round(0.3 * (CASE WHEN n_tok BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END)
             + 0.2 * (CASE WHEN mean_wl BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.0 END)
             + 0.3 * least(alpha_ratio / 0.8, 1.0)
             + 0.2 * least(stop_ratio / 0.3, 1.0), 3) AS quality,
         n_tok AS n_tokens
  FROM c
),
cum AS (
  SELECT doc_id, quality, n_tokens,
         sum(n_tokens) OVER (
           ORDER BY quality DESC, doc_id ASC ROWS UNBOUNDED PRECEDING
         ) AS running
  FROM scored
)
SELECT doc_id, quality, n_tokens FROM cum WHERE running <= {_BUDGET_TOKENS}
"""


_SW_VALUES = ", ".join(
    f"('{lang}', '{w}')" for lang, ws in sorted(TA.STOPWORDS.items()) for w in ws
)


def q_text_lang_id(spark, sf_dir):
    return TA.lang_id(_docs(spark, sf_dir)).select(
        F.col("doc_id").cast("long"), "pred_lang", F.col("hits").cast("long")
    )


SQL_TEXT_LANG_ID = f"""
WITH {_TOKS},
sw(lang, word) AS (VALUES {_SW_VALUES}),
hits AS (
  SELECT doc_id, lang, count(*) AS hits
  FROM toks JOIN sw ON toks.term = sw.word
  GROUP BY doc_id, lang
),
best AS (
  SELECT doc_id, lang, hits,
         row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, lang ASC) AS rn
  FROM hits
)
SELECT d.doc_id, coalesce(b.lang, 'und') AS pred_lang,
       coalesce(b.hits, 0)::BIGINT AS hits
FROM documents d LEFT JOIN (SELECT * FROM best WHERE rn = 1) b ON d.doc_id = b.doc_id
"""


def q_text_fingerprints(spark, sf_dir):
    return TA.doc_fingerprints(_docs(spark, sf_dir)).select(
        F.col("doc_id").cast("long"), "fp"
    )


SQL_TEXT_FINGERPRINTS = f"""
WITH {_TOKS},
hs AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 4
           THEN [md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])
                 for i in generate_series(1, len(t) - 3)]
           ELSE CAST([] AS VARCHAR[]) END AS h
  FROM tok_arr
)
SELECT DISTINCT doc_id,
       unnest(CASE WHEN len(h) >= 4
         THEN [list_min(h[i:i+3]) for i in generate_series(1, len(h) - 3)]
         ELSE h END) AS fp
FROM hs
"""


def q_text_repetition(spark, sf_dir):
    return TA.repetition_profile(_docs(spark, sf_dir)).select(
        F.col("doc_id").cast("long"), "dup_token_ratio", "top_bigram_share"
    )


SQL_TEXT_REPETITION = f"""
WITH {_TOKS},
bg_t AS (
  SELECT doc_id, t,
         CASE WHEN len(t) >= 2
           THEN [t[i] || ' ' || t[i+1] for i in generate_series(1, len(t) - 1)]
           ELSE CAST([] AS VARCHAR[]) END AS bg
  FROM tok_arr
),
-- linear top-bigram count via unnest + groupBy (the Spark side uses a
-- sorted-array run-length pass; both produce the same exact integer max, so
-- the ratio is bit-identical)
bgc AS (
  SELECT doc_id, b, count(*) AS c
  FROM (SELECT doc_id, unnest(bg) AS b FROM bg_t)
  GROUP BY doc_id, b
),
bgm AS (SELECT doc_id, max(c) AS maxc FROM bgc GROUP BY doc_id)
SELECT g.doc_id,
       round(CASE WHEN len(g.t) > 0
             THEN (len(g.t) - len(list_distinct(g.t))) * 1.0 / len(g.t)
             ELSE 0.0 END, 6) AS dup_token_ratio,
       round(CASE WHEN len(g.bg) > 0
             THEN m.maxc * 1.0 / len(g.bg)
             ELSE 0.0 END, 6) AS top_bigram_share
FROM bg_t g LEFT JOIN bgm m ON g.doc_id = m.doc_id
"""


def _docs_selfdup(spark, sf_dir):
    """Documents view with PLANTED within-doc duplicate lines (the driver
    corpus is single-line): doc_id%3==0 repeats its own first line at the
    end; doc_id%4==0 appends one line twice. Mirrored verbatim in SQL."""
    d = _docs(spark, sf_dir)
    first_line = F.split(F.col("text"), "\n").getItem(0)
    text = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 3 == 0, F.concat(F.lit("\n"), first_line)).otherwise(
            F.lit("")
        ),
        F.when(
            F.col("doc_id") % 4 == 0,
            F.lit("\nrepeated line alpha\nrepeated line alpha"),
        ).otherwise(F.lit("")),
    )
    return d.select("doc_id", text.alias("text"))


def q_text_dedup_lines(spark, sf_dir):
    return TA.dedup_lines_within_doc(_docs_selfdup(spark, sf_dir)).select(
        F.col("doc_id").cast("long"), "n_lines", "n_kept", "clean_text"
    )


SQL_TEXT_DEDUP_LINES = """
WITH ml AS (
  SELECT doc_id,
         text
           || CASE WHEN doc_id % 3 = 0
                THEN chr(10) || string_split(text, chr(10))[1] ELSE '' END
           || CASE WHEN doc_id % 4 = 0
                THEN chr(10) || 'repeated line alpha'
                  || chr(10) || 'repeated line alpha' ELSE '' END AS text
  FROM documents
),
lines AS (
  SELECT doc_id,
         unnest([{'idx': i, 'line': parts[i]}
                 for i in generate_series(1, len(parts))], recursive := true)
  FROM (SELECT doc_id, string_split(text, chr(10)) AS parts FROM ml)
),
first AS (
  SELECT doc_id, line, min(idx) AS idx, count(*) AS n_occ
  FROM lines GROUP BY doc_id, line
)
SELECT doc_id, sum(n_occ)::BIGINT AS n_lines, count(*)::BIGINT AS n_kept,
       coalesce(string_agg(line, chr(10) ORDER BY idx), '') AS clean_text
FROM first GROUP BY doc_id
"""


def q_text_perplexity(spark, sf_dir):
    return TA.bigram_lm_xent(_docs(spark, sf_dir)).select(
        F.col("doc_id").cast("long"), F.col("n_bigrams").cast("long"), "xent"
    )


# ln parity: JVM and DuckDB natural logs differ by 1 ulp on some integer
# inputs, so both sides round each ln to 6dp BEFORE any arithmetic; the
# per-doc sum then folds identical doubles in position order on both
# engines (list_sum(list(... ORDER BY pos)) == sort_array+F.aggregate).
SQL_TEXT_PERPLEXITY = f"""
WITH {_TOKS},
vocab AS (SELECT count(DISTINCT term) AS v FROM toks),
bg AS (
  -- generate_series(1, len-1) is empty for len < 2, so short docs
  -- contribute no bigram rows (mirrors the Spark-side size >= 2 filter)
  SELECT doc_id, pos, w1, w2
  FROM tok_arr,
       LATERAL (SELECT unnest([{{'pos': i, 'w1': t[i], 'w2': t[i+1]}}
                               for i in generate_series(1, len(t) - 1)],
                               recursive := true)) u
),
c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY w1),
scored AS (
  SELECT b.doc_id, b.pos,
         round(ln((c12.c12 + 1)::DOUBLE), 6)
           - round(ln((c1.c1 + v.v)::DOUBLE), 6) AS lp
  FROM bg b JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN vocab v
)
SELECT doc_id, count(*) AS n_bigrams,
       round(-list_sum(list(lp ORDER BY pos)) / count(*), 6) AS xent
FROM scored GROUP BY doc_id
"""


# --- multimodal --------------------------------------------------------------


def q_media_stats(spark, sf_dir):
    media = MM.attach_fake_media(_docs(spark, sf_dir))
    return MM.media_stats(media).select(
        F.col("doc_id").cast("long"), "media_type", "byte_len", "content_md5"
    )


SQL_MEDIA_STATS = """
SELECT doc_id, 'image/fake' AS media_type, strlen(text)::BIGINT AS byte_len,
       md5(text) AS content_md5
FROM documents
"""


def q_media_decode(spark, sf_dir):
    # the decode KERNEL (Arrow batch in, typed metadata out) under the full
    # oracle: the codec call is a deterministic md5-derived fake (real
    # Pillow/av libs are absent), but the entire pipeline around it —
    # binary column, mapInPandas batching, output schema — is the real
    # integration shape, and DuckDB mirrors the fake's arithmetic exactly
    media = MM.attach_fake_media(_docs(spark, sf_dir))
    return MM.decode_media(media, decode_stub="fake")


# width/height/n_frames mirror operators/multimodal.py:_fake_decode_md5 —
# hex nibbles of md5(utf-8 text bytes), which DuckDB's md5(text) reproduces
_MD5 = "md5(text)"
SQL_MEDIA_DECODE = f"""
SELECT doc_id, 'image/fake' AS media_type, strlen(text)::BIGINT AS byte_len,
       {_MD5} AS content_md5,
       (16 + ('0x' || substr({_MD5}, 1, 4))::BIGINT % 1024)::INT AS width,
       (16 + ('0x' || substr({_MD5}, 5, 4))::BIGINT % 1024)::INT AS height,
       (1 + ('0x' || substr({_MD5}, 9, 4))::BIGINT % 64)::INT AS n_frames
FROM documents
"""


# --- line-level boilerplate removal -------------------------------------------
# C4/MassiveText-style: drop lines recurring across >= min_docs documents.
# The driver corpus is single-line, so (like the rare-term augmentation) both
# engines synthesize the SAME multi-line view: planted boilerplate lines on
# doc_id residue classes — cookie banner on 1/5 of docs, newsletter plug on
# 1/7, copyright footer on 1/11 — each far above the min_docs=3 cut, while
# every base line is unique and survives.
_BP_LINES = [
    (5, "please accept our cookie policy to continue"),
    (7, "subscribe to our weekly newsletter today"),
    (11, "copyright 2024 example site all rights reserved"),
]
_BP_MIN_DOCS = 3


def _docs_multiline(spark, sf_dir):
    d = _docs(spark, sf_dir)
    text = F.col("text")
    for mod, line in _BP_LINES:
        text = F.concat(
            text,
            F.when(F.col("doc_id") % mod == 0, F.lit("\n" + line)).otherwise(
                F.lit("")
            ),
        )
    return d.select("doc_id", text.alias("text"))


def q_text_strip_boilerplate(spark, sf_dir):
    return TA.strip_boilerplate_lines(
        _docs_multiline(spark, sf_dir), min_docs=_BP_MIN_DOCS
    ).select(F.col("doc_id").cast("long"), "n_lines", "n_kept", "clean_text")


_BP_CASES = " || ".join(
    f"CASE WHEN doc_id % {mod} = 0 THEN chr(10) || '{line}' ELSE '' END"
    for mod, line in _BP_LINES
)

SQL_TEXT_STRIP_BOILERPLATE = f"""
WITH ml AS (SELECT doc_id, text || {_BP_CASES} AS text FROM documents),
lines AS (
  SELECT doc_id,
         unnest([{{'idx': i, 'line': trim(parts[i])}}
                 for i in generate_series(1, len(parts))], recursive := true)
  FROM (SELECT doc_id, string_split(text, chr(10)) AS parts FROM ml)
),
nz AS (SELECT * FROM lines WHERE line != ''),
counts AS (SELECT line, count(DISTINCT doc_id) AS n FROM nz GROUP BY line),
boiler AS (SELECT line FROM counts WHERE n >= {_BP_MIN_DOCS}),
flagged AS (
  SELECT nz.doc_id, nz.idx, nz.line, (b.line IS NOT NULL) AS is_b
  FROM nz LEFT JOIN boiler b ON b.line = nz.line
)
SELECT doc_id, count(*)::BIGINT AS n_lines,
       sum(CASE WHEN NOT is_b THEN 1 ELSE 0 END)::BIGINT AS n_kept,
       coalesce(string_agg(CASE WHEN NOT is_b THEN line END, chr(10) ORDER BY idx),
                '') AS clean_text
FROM flagged GROUP BY doc_id
"""


# --- duplicated-span removal (ExactSubstr-style) ------------------------------
# Lee-et-al substring dedup over k-token window fingerprints. Like the other
# text-surgery entries, both engines derive the SAME view: a shared passage
# appended to doc_id % 4 == 0 docs and another to % 9 == 0, each >= k tokens,
# so cross-document duplicated spans provably exist; any naturally repeated
# k-gram in the base corpus is removed identically on both sides too.
_SPAN_K = 6
_SPAN_QUOTES = [
    (4, "the quick brown fox jumps over the lazy dog tonight"),
    (9, "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"),
]


def _docs_spanned(spark, sf_dir):
    d = _docs(spark, sf_dir)
    text = F.col("text")
    for mod, quote in _SPAN_QUOTES:
        text = F.concat(
            text,
            F.when(F.col("doc_id") % mod == 0, F.lit(" " + quote)).otherwise(
                F.lit("")
            ),
        )
    return d.select("doc_id", text.alias("text"))


def q_dedup_spans(spark, sf_dir):
    from ..operators.spans import strip_duplicated_spans

    return strip_duplicated_spans(
        _docs_spanned(spark, sf_dir), k=_SPAN_K, min_docs=2
    ).select(F.col("doc_id").cast("long"), "n_tokens", "n_removed", "clean_text")


_SPAN_CASES = " || ".join(
    f"CASE WHEN doc_id % {mod} = 0 THEN ' {quote}' ELSE '' END"
    for mod, quote in _SPAN_QUOTES
)

SQL_DEDUP_SPANS = f"""
WITH spanned AS (SELECT doc_id, text || {_SPAN_CASES} AS text FROM documents),
arr AS (SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS a FROM spanned),
wins AS (
  SELECT doc_id, u.s, md5(array_to_string(a[u.s : u.s + {_SPAN_K} - 1], ' ')) AS fp
  FROM arr, LATERAL (SELECT unnest(generate_series(1, len(a) - {_SPAN_K} + 1)) AS s) u
  WHERE len(a) >= {_SPAN_K}
),
dup AS (SELECT fp FROM wins GROUP BY fp HAVING count(DISTINCT doc_id) >= 2),
cov AS (
  SELECT DISTINCT w.doc_id, u.p
  FROM wins w JOIN dup USING (fp),
       LATERAL (SELECT unnest(generate_series(w.s, w.s + {_SPAN_K} - 1)) AS p) u
),
toks AS (
  SELECT doc_id, u.i AS pos, a[u.i] AS term
  FROM arr, LATERAL (SELECT unnest(generate_series(1, len(a))) AS i) u
),
flagged AS (
  SELECT t.doc_id, t.pos, t.term, (c.p IS NOT NULL) AS is_c
  FROM toks t LEFT JOIN cov c ON c.doc_id = t.doc_id AND c.p = t.pos
)
SELECT doc_id, count(*)::BIGINT AS n_tokens,
       sum(CASE WHEN is_c THEN 1 ELSE 0 END)::BIGINT AS n_removed,
       coalesce(string_agg(CASE WHEN NOT is_c THEN term END, ' ' ORDER BY pos),
                '') AS clean_text
FROM flagged GROUP BY doc_id
"""


# --- benchmark decontamination --------------------------------------------------
# GPT-3-style n-gram overlap: docs 0-4 stand in for the evaluation set, the
# rest is the training corpus; a training doc sharing any word 4-gram with
# the eval set is flagged with its hit count.
_DECON_K = 4


def q_decontaminate(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return DD.benchmark_contamination(
        d.where(F.col("doc_id") >= 5),
        d.where(F.col("doc_id") < 5),
        k=_DECON_K,
    ).select(F.col("doc_id").cast("long"), "n_hits")


SQL_DECONTAMINATE = f"""
WITH tok_arr AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\\w+') AS t FROM documents
),
doc_sh AS (
  SELECT DISTINCT doc_id,
         unnest(CASE WHEN len(t) >= {_DECON_K}
           THEN [t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
                 for i in generate_series(1, len(t) - {_DECON_K - 1})]
           ELSE CAST([] AS VARCHAR[]) END) AS shingle
  FROM tok_arr
),
bench AS (SELECT DISTINCT shingle FROM doc_sh WHERE doc_id < 5)
SELECT d.doc_id, count(*)::BIGINT AS n_hits
FROM doc_sh d JOIN bench b USING (shingle)
WHERE d.doc_id >= 5
GROUP BY d.doc_id
"""


# --- PII scrubbing -------------------------------------------------------------
# The driver corpus contains no PII, so both engines plant the SAME
# deterministic strings on doc_id residue classes (email on 1/6, IPv4 on 1/9,
# phone on 1/13) — every redaction branch fires and the counts are nonzero.


def _docs_with_pii(spark, sf_dir):
    d = _docs(spark, sf_dir)
    did = F.col("doc_id")
    text = F.concat(
        F.col("text"),
        F.when(
            did % 6 == 0,
            F.concat(F.lit(" contact user"), did.cast("string"), F.lit("@example.com")),
        ).otherwise(F.lit("")),
        F.when(
            did % 9 == 0,
            F.concat(
                F.lit(" from 10.0."),
                (did % 256).cast("string"),
                F.lit("."),
                (did % 100).cast("string"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 13 == 0,
            F.concat(
                F.lit(" call 555-01"),
                F.lpad((did % 100).cast("string"), 2, "0"),
            ),
        ).otherwise(F.lit("")),
    )
    return d.select("doc_id", text.alias("text"))


def q_text_scrub_pii(spark, sf_dir):
    return PII.scrub_pii(_docs_with_pii(spark, sf_dir)).select(
        F.col("doc_id").cast("long"), "clean_text", "n_emails", "n_ips", "n_phones"
    )


_PII_ML = """
pml AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 6 = 0
                 THEN ' contact user' || doc_id::VARCHAR || '@example.com'
                 ELSE '' END
         || CASE WHEN doc_id % 9 = 0
                 THEN ' from 10.0.' || (doc_id % 256)::VARCHAR || '.'
                      || (doc_id % 100)::VARCHAR
                 ELSE '' END
         || CASE WHEN doc_id % 13 = 0
                 THEN ' call 555-01' || lpad((doc_id % 100)::VARCHAR, 2, '0')
                 ELSE '' END AS text
  FROM documents
)
"""


def _pii_sql() -> str:
    from ..functions.pii import EMAIL_RE, IPV4_RE, PHONE_RE

    e, i, p = (r.replace("'", "''") for r in (EMAIL_RE, IPV4_RE, PHONE_RE))
    return f"""
WITH {_PII_ML},
st AS (
  SELECT doc_id, text,
         regexp_replace(text, '{e}', '<EMAIL>', 'g') AS t1
  FROM pml
),
st2 AS (SELECT *, regexp_replace(t1, '{i}', '<IP>', 'g') AS t2 FROM st)
SELECT doc_id,
       regexp_replace(t2, '{p}', '<PHONE>', 'g') AS clean_text,
       len(regexp_extract_all(text, '{e}'))::BIGINT AS n_emails,
       len(regexp_extract_all(t1, '{i}'))::BIGINT AS n_ips,
       len(regexp_extract_all(t2, '{p}'))::BIGINT AS n_phones
FROM st2
"""


SQL_TEXT_SCRUB_PII = _pii_sql()


# --- URL analysis --------------------------------------------------------------
# The driver documents table has no url column, so (like the rare-term
# augmentation for bm25_topk) both engines synthesize the SAME deterministic
# url per doc_id — subdomain presence, host, registered domain, and path
# depth all vary with doc_id so every parse branch is exercised.


def _docs_with_urls(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return d.withColumn(
        "url",
        F.concat(
            F.lit("https://"),
            F.when(F.col("doc_id") % 3 == 0, F.lit("www.")).otherwise(F.lit("")),
            F.lit("site"),
            (F.col("doc_id") % 37).cast("string"),
            F.lit(".example"),
            (F.col("doc_id") % 5).cast("string"),
            F.lit(".com/"),
            F.col("source"),
            F.lit("/p"),
            F.col("doc_id").cast("string"),
            F.when(F.col("doc_id") % 4 == 0, F.lit("/deep")).otherwise(F.lit("")),
        ),
    )


_URL_SQL_CTE = """
u AS (
  SELECT *,
         'https://' || CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END
         || 'site' || (doc_id % 37)::VARCHAR || '.example'
         || (doc_id % 5)::VARCHAR || '.com/' || source || '/p'
         || doc_id::VARCHAR
         || CASE WHEN doc_id % 4 = 0 THEN '/deep' ELSE '' END AS url
  FROM documents
),
parsed AS (
  SELECT *,
         regexp_extract(url, '{re_host}', 1) AS host,
         regexp_extract(url, '{re_path}', 1) AS path
  FROM u
),
dom AS (
  SELECT *,
         CASE WHEN len(string_split(host, '.')) >= 2
              THEN string_split(host, '.')[-2] || '.' || string_split(host, '.')[-1]
              ELSE host END AS registered_domain,
         len(list_filter(string_split(path, '/'), x -> x != '')) AS path_depth
  FROM parsed
)
""".format(re_host=UR.RE_HOST, re_path=UR.RE_PATH)


def q_url_host_stats(spark, sf_dir):
    parsed = UR.url_parse(_docs_with_urls(spark, sf_dir))
    return UR.host_stats(parsed).select(
        "domain",
        F.col("n_docs").cast("long"),
        F.col("n_hosts").cast("long"),
        F.col("total_chars").cast("long"),
        F.round("avg_path_depth", 6).alias("avg_path_depth"),
    )


SQL_URL_HOST_STATS = f"""
WITH {_URL_SQL_CTE}
SELECT registered_domain AS domain, count(*)::BIGINT AS n_docs,
       count(DISTINCT host)::BIGINT AS n_hosts,
       sum(n_chars)::BIGINT AS total_chars,
       round(avg(path_depth), 6) AS avg_path_depth
FROM dom GROUP BY 1
"""


def q_url_cap_per_domain(spark, sf_dir):
    parsed = UR.url_parse(_docs_with_urls(spark, sf_dir))
    return UR.cap_per_domain(parsed, max_docs=40).select(
        F.col("doc_id").cast("long"),
        "registered_domain",
        F.col("domain_rank").cast("long"),
    )


SQL_URL_CAP_PER_DOMAIN = f"""
WITH {_URL_SQL_CTE},
ranked AS (
  SELECT doc_id, registered_domain,
         row_number() OVER (PARTITION BY registered_domain ORDER BY doc_id ASC)
           AS domain_rank
  FROM dom
)
SELECT doc_id, registered_domain, domain_rank FROM ranked WHERE domain_rank <= 40
"""


_SAMPLE_RATES = {"example0.com": 0.5, "example1.com": 0.1}
_SAMPLE_DEFAULT = 0.8


def q_url_sample_domains(spark, sf_dir):
    parsed = UR.url_parse(_docs_with_urls(spark, sf_dir))
    return UR.sample_per_domain(
        parsed, _SAMPLE_RATES, default_rate=_SAMPLE_DEFAULT
    ).select(
        F.col("doc_id").cast("long"),
        "registered_domain",
        F.col("sample_bucket").cast("long"),
    )


_SAMPLE_VALUES = ", ".join(
    f"('{d}', {int(round(r * 1_000_000))})" for d, r in sorted(_SAMPLE_RATES.items())
)

SQL_URL_SAMPLE_DOMAINS = f"""
WITH {_URL_SQL_CTE},
rates(registered_domain, keep_ppm) AS (VALUES {_SAMPLE_VALUES})
SELECT doc_id, registered_domain, sample_bucket FROM (
  SELECT dom.doc_id, dom.registered_domain,
         ('0x' || substr(md5(url), 1, 8))::BIGINT % 1000000 AS sample_bucket,
         coalesce(r.keep_ppm, {int(round(_SAMPLE_DEFAULT * 1_000_000))}) AS keep_ppm
  FROM dom LEFT JOIN rates r USING (registered_domain)
) WHERE sample_bucket < keep_ppm
"""


# --- events (streaming-shaped agg, batch-verified) ---------------------------


def q_events_windowed(spark, sf_dir):
    """The windowed_event_counts aggregation (streaming/ingest.py) run in
    batch mode with exact distinct-user counts (the streaming variant uses
    approx_count_distinct for bounded state at scale)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            # string timestamps: engines serialize/sort datetime types
            # differently, strings hash identically everywhere
            F.date_format("win.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            F.col("n_events").cast("long"),
            "sum_value",
            F.col("n_users").cast("long"),
        )
    )


def q_events_sessions(spark, sf_dir):
    """Gap-based session windows per user (30-minute gap) via the built-in
    ``session_window`` — the batch analog of streaming/stateful.py's
    applyInPandasWithState operator."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("user_id").cast("long"),
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.col("n_events").cast("long"),
            "sum_value",
        )
    )


SQL_EVENTS_SESSIONS = """
WITH o AS (
  SELECT user_id, ts, value,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
),
m AS (
  SELECT user_id, ts, value,
         CASE WHEN prev IS NULL OR ts - prev > INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS new_s
  FROM o
),
s AS (
  SELECT user_id, ts, value,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, value
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM m
)
SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       count(*) AS n_events, round(sum(value), 4) AS sum_value
FROM s GROUP BY user_id, sid
"""


def q_events_daily(spark, sf_dir):
    """Daily mergeable stats — what streaming/rollup.py's continuous rollup
    serves incrementally; here the batch form with its oracle."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy(F.to_date("ts").alias("d"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.round(F.min("value"), 4).alias("min_value"),
            F.round(F.max("value"), 4).alias("max_value"),
        )
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("day"),
            "event_type",
            F.col("n_events").cast("long"),
            "sum_value",
            "min_value",
            "max_value",
        )
    )


SQL_EVENTS_DAILY = """
SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, event_type,
       count(*) AS n_events, round(sum(value), 4) AS sum_value,
       round(min(value), 4) AS min_value, round(max(value), 4) AS max_value
FROM events GROUP BY 1, 2
"""


SQL_EVENTS_WINDOWED = """
SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, count(*) AS n_events, round(sum(value), 4) AS sum_value,
       count(DISTINCT user_id) AS n_users
FROM events GROUP BY 1, 2
"""


def q_events_distinct_hll(spark, sf_dir):
    """Windowed distinct users via the mergeable HLL sketch
    (``streaming/ingest.py:windowed_distinct_hll``, batch form — the same
    plan runs under Structured Streaming with <= 2^p register rows of state
    per window, vs the unbounded set an exact distinct holds)."""
    from ..streaming.ingest import windowed_distinct_hll

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return windowed_distinct_hll(ev).select(
        "window_start", "event_type", "est_distinct"
    )


def _events_hll_sql() -> str:
    from ..operators.sketches import hll_sql

    inner = """(
  SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S')
           AS window_start,
         event_type, user_id
  FROM events
)"""
    return "WITH " + hll_sql(
        "user_id", inner, ["window_start", "event_type"]
    ).strip()


SQL_EVENTS_DISTINCT_HLL = _events_hll_sql()


# --- windowed heavy hitters (Count-Min, streaming-shaped) ---------------------

_EHH_D, _EHH_W, _EHH_K = 4, 64, 5


def q_events_heavy_hitters(spark, sf_dir):
    """Windowed top-k users via the mergeable Count-Min sketch
    (``streaming/ingest.py:windowed_heavy_hitters_cms``, batch form — the
    same single-stateful-agg plan runs under Structured Streaming with
    <= d*w counter rows of state per (window, event_type), the frequency
    twin of ``events_distinct_hll``). w=64 is far below the user-id
    cardinality so real collisions occur; the oracle reproduces the
    resulting overestimates exactly."""
    from ..streaming.ingest import windowed_heavy_hitters_cms

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cands = ev.select(F.col("user_id").cast("string").alias("val")).distinct()
    return windowed_heavy_hitters_cms(
        ev, cands, k=_EHH_K, d=_EHH_D, w=_EHH_W
    )


def _events_cms_sql() -> str:
    d, w, k = _EHH_D, _EHH_W, _EHH_K
    return f"""
WITH ev AS (
  SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S')
           AS window_start,
         event_type, user_id::VARCHAR AS val
  FROM events
),
depths AS (SELECT unnest(generate_series(0, {d - 1})) AS depth),
sketch AS (
  SELECT window_start, event_type, d.depth,
         ('0x' || substr(md5(d.depth::VARCHAR || ':' || ev.val), 1, 12))::BIGINT
           % {w} AS bucket,
         count(*)::BIGINT AS cnt
  FROM ev, depths d
  GROUP BY window_start, event_type, d.depth, bucket
),
cand AS (SELECT DISTINCT val FROM ev),
cb AS (
  SELECT c.val, d.depth,
         ('0x' || substr(md5(d.depth::VARCHAR || ':' || c.val), 1, 12))::BIGINT
           % {w} AS bucket
  FROM cand c, depths d
),
est AS (
  SELECT s.window_start, s.event_type, cb.val,
         CASE WHEN count(*) < {d} THEN 0
              ELSE min(s.cnt) END::BIGINT AS est_count
  FROM sketch s JOIN cb USING (depth, bucket)
  GROUP BY s.window_start, s.event_type, cb.val
),
-- only candidates the sketch saw rank (est_count > 0): the Spark side
-- computes the full (group x candidate) domain with zeros and applies the
-- same cut, so never-seen candidates neither rank nor mismatch
ranked AS (
  SELECT window_start, event_type,
         row_number() OVER (
           PARTITION BY window_start, event_type
           ORDER BY est_count DESC, val ASC
         )::BIGINT AS rank,
         val, est_count
  FROM est WHERE est_count > 0
)
SELECT window_start, event_type, rank, val, est_count
FROM ranked WHERE rank <= {k}
"""


SQL_EVENTS_HEAVY_HITTERS = _events_cms_sql()


# --- windowed quantiles (histogram sketch, streaming-shaped) ------------------

_EWQ_BOUNDS, _EWQ_QS, _EWQ_BINS = (0.0, 512.0), [0.5, 0.9, 0.99], 64


def q_events_windowed_quantiles(spark, sf_dir):
    """Windowed P50/P90/P99 of the event value via the mergeable histogram
    sketch (``streaming/ingest.py:windowed_quantiles_hist``, batch form —
    the same single-stateful-agg plan runs under Structured Streaming with
    <= nbins counter rows of state per (window, event_type); the pinned
    [lo, hi) frame is what streaming requires AND what makes per-window
    partials mergeable into daily rollups)."""
    from ..streaming.ingest import windowed_quantiles_hist

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return windowed_quantiles_hist(
        ev, _EWQ_BOUNDS, _EWQ_QS, nbins=_EWQ_BINS
    )


def _events_hist_sql() -> str:
    lo, hi = _EWQ_BOUNDS
    nb = _EWQ_BINS
    qvals = ", ".join(f"({float(q)})::DOUBLE" for q in _EWQ_QS)
    return f"""
WITH ev AS (
  SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M:%S')
           AS window_start,
         event_type, value::DOUBLE AS val
  FROM events
  WHERE value IS NOT NULL
),
sketch AS (
  SELECT window_start, event_type,
         least(greatest(floor((val - {float(lo)}) * {nb}
                              / ({float(hi)} - {float(lo)}))::BIGINT, 0),
               {nb - 1}) AS bin,
         count(*)::BIGINT AS cnt
  FROM ev GROUP BY window_start, event_type, bin
),
cum AS (
  SELECT window_start, event_type, bin, cnt,
         sum(cnt) OVER (PARTITION BY window_start, event_type
                        ORDER BY bin)::BIGINT AS cum,
         sum(cnt) OVER (PARTITION BY window_start, event_type)::BIGINT AS total
  FROM sketch
),
qrows AS (SELECT unnest([{qvals}]) AS q),
hit AS (
  SELECT window_start, event_type, q, bin, cnt, cum,
         ceil(q * total)::BIGINT AS tgt
  FROM cum, qrows
  WHERE cum >= ceil(q * total)::BIGINT
    AND ceil(q * total)::BIGINT >= cum - cnt + 1
)
SELECT window_start, event_type, q,
       round({float(lo)} + (bin::DOUBLE + (tgt - (cum - cnt))::DOUBLE / cnt::DOUBLE)
                  * (({float(hi)} - {float(lo)}) / {nb}), 4) AS est
FROM hit
"""


SQL_EVENTS_WINDOWED_QUANTILES = _events_hist_sql()


# --- registries --------------------------------------------------------------


# --- Composed cleaning pipeline (the end-to-end training-data path) ----------
# One entry running the REAL cleanup chain a web-scale pipeline applies in
# sequence — boilerplate strip -> within-doc line dedup -> PII scrub ->
# language/quality gate -> exact dedup — over a dirty corpus view both
# engines derive identically: planted boilerplate (mod 5/7/11), self-dup
# lines (mod 3/4), inline PII (mod 6/9/13), plus exact clones at
# doc_id + 180180 (an lcm of every planted modulus, so clones clean to
# byte-identical text and the final dedup provably drops them).

_PC_CLONE_OFF = 180180  # lcm(3,4,5,6,7,9,11,13) -> residues preserved
_PC_CLONE_MOD = 50
_PC_QUALITY_MIN = 0.5


def _docs_dirty(spark, sf_dir):
    d = _docs(spark, sf_dir).select("doc_id", "text")
    clones = d.where(F.col("doc_id") % _PC_CLONE_MOD == 0).select(
        (F.col("doc_id") + _PC_CLONE_OFF).alias("doc_id"), "text"
    )
    base = d.unionByName(clones)
    text = F.col("text")
    for mod, line in _BP_LINES:
        text = F.concat(
            text,
            F.when(F.col("doc_id") % mod == 0, F.lit("\n" + line)).otherwise(
                F.lit("")
            ),
        )
    text = F.concat(
        text,
        F.when(
            F.col("doc_id") % 3 == 0, F.concat(F.lit("\n"), F.col("text"))
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 4 == 0,
            F.lit("\nrepeated line alpha\nrepeated line alpha"),
        ).otherwise(F.lit("")),
    )
    did = F.col("doc_id")
    text = F.concat(
        text,
        F.when(
            did % 6 == 0,
            F.concat(F.lit(" contact user"), did.cast("string"), F.lit("@example.com")),
        ).otherwise(F.lit("")),
        F.when(
            did % 9 == 0,
            F.concat(
                F.lit(" from 10.0."),
                (did % 256).cast("string"),
                F.lit("."),
                (did % 100).cast("string"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            did % 13 == 0,
            F.concat(F.lit(" call 555-01"), F.lpad((did % 100).cast("string"), 2, "0")),
        ).otherwise(F.lit("")),
    )
    return base.select("doc_id", text.alias("text"))


def q_pipeline_clean(spark, sf_dir):
    """The composed cleaning chain, each stage feeding the next's text:
    every stage is the SAME operator its standalone entry gates, so this
    entry checks the composition (ordering, text reconstruction, filter
    interplay), not new logic."""
    dirty = _docs_dirty(spark, sf_dir)
    s1 = TA.strip_boilerplate_lines(dirty, min_docs=_BP_MIN_DOCS).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    s2 = TA.dedup_lines_within_doc(s1).select(
        "doc_id", F.col("clean_text").alias("text")
    )
    s3 = PII.scrub_pii(s2).select(
        "doc_id",
        F.col("clean_text").alias("text"),
        (F.col("n_emails") + F.col("n_ips") + F.col("n_phones")).alias("n_pii"),
    )
    s3 = s3.persist()
    q = TA.quality_score(s3).select("doc_id", F.round("quality", 6).alias("quality"))
    lang = TA.lang_id(s3).select("doc_id", "pred_lang")
    gated = (
        s3.join(q, "doc_id")
        .join(lang, "doc_id")
        .where((F.col("pred_lang") == "en") & (F.col("quality") >= _PC_QUALITY_MIN))
    )
    w = Window.partitionBy(F.md5(F.col("text"))).orderBy(F.asc("doc_id"))
    return (
        gated.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            F.col("doc_id").cast("long").alias("doc_id"),
            "pred_lang",
            "quality",
            F.col("n_pii").cast("long").alias("n_pii"),
            F.col("text").alias("clean_text"),
        )
    )


def _pipeline_clean_sql() -> str:
    from ..functions.pii import EMAIL_RE, IPV4_RE, PHONE_RE

    e, i, p = (r.replace("'", "''") for r in (EMAIL_RE, IPV4_RE, PHONE_RE))
    bp_cases = " || ".join(
        f"CASE WHEN doc_id % {mod} = 0 THEN chr(10) || '{line}' ELSE '' END"
        for mod, line in _BP_LINES
    )
    return f"""
WITH base AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {_PC_CLONE_OFF} AS doc_id, text
  FROM documents WHERE doc_id % {_PC_CLONE_MOD} = 0
),
dirty AS (
  SELECT doc_id,
         text || {bp_cases}
         || CASE WHEN doc_id % 3 = 0 THEN chr(10) || text ELSE '' END
         || CASE WHEN doc_id % 4 = 0
                 THEN chr(10) || 'repeated line alpha'
                   || chr(10) || 'repeated line alpha' ELSE '' END
         || CASE WHEN doc_id % 6 = 0
                 THEN ' contact user' || doc_id::VARCHAR || '@example.com'
                 ELSE '' END
         || CASE WHEN doc_id % 9 = 0
                 THEN ' from 10.0.' || (doc_id % 256)::VARCHAR || '.'
                      || (doc_id % 100)::VARCHAR ELSE '' END
         || CASE WHEN doc_id % 13 = 0
                 THEN ' call 555-01' || lpad((doc_id % 100)::VARCHAR, 2, '0')
                 ELSE '' END AS text
  FROM base
),
-- stage 1: boilerplate line removal (trimmed lines, empties dropped)
l1 AS (
  SELECT doc_id,
         unnest([{{'idx': i, 'line': trim(parts[i])}}
                 for i in generate_series(1, len(parts))], recursive := true)
  FROM (SELECT doc_id, string_split(text, chr(10)) AS parts FROM dirty)
),
nz1 AS (SELECT * FROM l1 WHERE line != ''),
boiler AS (
  SELECT line FROM nz1 GROUP BY line
  HAVING count(DISTINCT doc_id) >= {_BP_MIN_DOCS}
),
s1 AS (
  SELECT nz1.doc_id,
         coalesce(string_agg(CASE WHEN b.line IS NULL THEN nz1.line END,
                             chr(10) ORDER BY nz1.idx), '') AS text
  FROM nz1 LEFT JOIN boiler b ON b.line = nz1.line
  GROUP BY nz1.doc_id
),
-- stage 2: within-doc line dedup (keep first occurrence)
l2 AS (
  SELECT doc_id,
         unnest([{{'idx': i, 'line': parts[i]}}
                 for i in generate_series(1, len(parts))], recursive := true)
  FROM (SELECT doc_id, string_split(text, chr(10)) AS parts FROM s1)
),
first2 AS (
  SELECT doc_id, line, min(idx) AS idx FROM l2 GROUP BY doc_id, line
),
s2 AS (
  SELECT doc_id,
         coalesce(string_agg(line, chr(10) ORDER BY idx), '') AS text
  FROM first2 GROUP BY doc_id
),
-- stage 3: PII scrub (email -> ip -> phone, progressive)
p1 AS (
  SELECT doc_id, text,
         regexp_replace(text, '{e}', '<EMAIL>', 'g') AS t1
  FROM s2
),
p2 AS (SELECT *, regexp_replace(t1, '{i}', '<IP>', 'g') AS t2 FROM p1),
s3 AS (
  SELECT doc_id,
         regexp_replace(t2, '{p}', '<PHONE>', 'g') AS text,
         (len(regexp_extract_all(text, '{e}'))
          + len(regexp_extract_all(t1, '{i}'))
          + len(regexp_extract_all(t2, '{p}')))::BIGINT AS n_pii
  FROM p2
),
-- stage 4: quality + language gate over the CLEANED text
tok4 AS (
  SELECT doc_id, text, n_pii,
         regexp_extract_all(lower(text), '\\w+') AS t
  FROM s3
),
qual AS (
  SELECT doc_id,
         round(0.3 * (CASE WHEN len(t) BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END)
             + 0.2 * (CASE WHEN (CASE WHEN len(t) > 0
                       THEN list_sum(list_transform(t, x -> strlen(x))) * 1.0 / len(t)
                       ELSE 0.0 END) BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.0 END)
             + 0.3 * least((CASE WHEN strlen(text) > 0
                   THEN strlen(regexp_replace(lower(text), '[^a-z0-9_]', '', 'g')) * 1.0
                        / strlen(text) ELSE 0.0 END) / 0.8, 1.0)
             + 0.2 * least((CASE WHEN len(t) > 0
                   THEN len(list_filter(t, x -> list_contains([{_SW_EN}], x))) * 1.0
                        / len(t) ELSE 0.0 END) / 0.3, 1.0), 6) AS quality
  FROM tok4
),
toks4 AS (SELECT doc_id, unnest(t) AS term FROM tok4),
sw(lang, word) AS (VALUES {_SW_VALUES}),
lhits AS (
  SELECT doc_id, lang, count(*) AS hits
  FROM toks4 JOIN sw ON toks4.term = sw.word
  GROUP BY doc_id, lang
),
lbest AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, lang ASC) AS rn
  FROM lhits
),
lang4 AS (
  SELECT s3.doc_id, coalesce(b.lang, 'und') AS pred_lang
  FROM s3 LEFT JOIN (SELECT * FROM lbest WHERE rn = 1) b ON s3.doc_id = b.doc_id
),
gated AS (
  SELECT s3.doc_id, lang4.pred_lang, qual.quality, s3.n_pii, s3.text
  FROM s3 JOIN qual ON qual.doc_id = s3.doc_id
  JOIN lang4 ON lang4.doc_id = s3.doc_id
  WHERE lang4.pred_lang = 'en' AND qual.quality >= {_PC_QUALITY_MIN}
),
-- stage 5: exact dedup on the cleaned text (keep lowest doc_id per hash)
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id ASC) AS rn
  FROM gated
)
SELECT doc_id, pred_lang, quality, n_pii, text AS clean_text
FROM ranked WHERE rn = 1
"""


SQL_PIPELINE_CLEAN = _pipeline_clean_sql()


# --- int8 scalar-quantized ANN -------------------------------------------------

_SQ8_CAND = 40


def q_ann_topk_sq8(spark, sf_dir):
    """Two-stage scalar-quantized search (``operators/similarity.py:
    ann_sq8_topk``): int8-code candidate scan (4x smaller scan footprint,
    integer dot) -> exact-cosine rescore of the top 40 -> top-10. Both
    stages are deterministic arithmetic, so the oracle reproduces the
    quantization codes and both rankings exactly."""
    return SIM.ann_sq8_topk(
        _emb(spark, sf_dir), _query_vecs(spark, sf_dir),
        top_k=10, candidates=_SQ8_CAND,
        query_vec_col="qv",
    ).select(
        F.col("query_id").cast("long"),
        F.col("rank").cast("long"),
        F.col("vec_id").cast("long"),
        "score",
    )


def _sq8_quant_sql(src: str, id_expr: str, out_id: str) -> str:
    return f"""(
  SELECT {id_expr} AS {out_id}, scale, nrm,
         CASE WHEN scale > 0
              THEN list_transform(emb, x -> floor(x::DOUBLE / scale * 127.0 + 0.5)::BIGINT)
              ELSE list_transform(emb, x -> 0::BIGINT) END AS q8
  FROM (
    SELECT {id_expr}, emb,
           list_aggregate(list_transform(emb, x -> abs(x::DOUBLE)), 'max') AS scale,
           sqrt(list_sum(list_transform(generate_series(1, len(emb)),
                                        i -> emb[i]::DOUBLE * emb[i]::DOUBLE))) AS nrm
    FROM {src}
  )
)"""


SQL_ANN_TOPK_SQ8 = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS emb FROM embeddings WHERE vec_id < 5
),
d AS (SELECT vec_id, embedding AS emb FROM embeddings),
dz AS {_sq8_quant_sql('d', 'vec_id', 'vec_id')},
qz AS {_sq8_quant_sql('q', 'query_id', 'query_id')},
cand AS (
  SELECT qz.query_id, dz.vec_id,
         round((list_sum(list_transform(generate_series(1, len(dz.q8)),
                                        i -> dz.q8[i] * qz.q8[i]))::DOUBLE
                * dz.scale * qz.scale / 16129.0) / (dz.nrm * qz.nrm), 6) AS approx
  FROM dz CROSS JOIN qz
),
kept AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (
             PARTITION BY query_id ORDER BY approx DESC, vec_id ASC
           ) AS crank
    FROM cand
  ) WHERE crank <= {_SQ8_CAND}
),
rescored AS (
  SELECT k.query_id, k.vec_id,
         round({_cos_sql('e.embedding', 'q.emb')}, 6) AS score
  FROM kept k
  JOIN embeddings e ON e.vec_id = k.vec_id
  JOIN q ON q.query_id = k.query_id
)
SELECT query_id, rank, vec_id, score FROM (
  SELECT query_id, vec_id, score,
         row_number() OVER (
           PARTITION BY query_id ORDER BY score DESC, vec_id ASC
         ) AS rank
  FROM rescored
) WHERE rank <= 10
"""


# --- cardinality sketching (HyperLogLog) --------------------------------------


def q_sketch_cardinality(spark, sf_dir):
    """HyperLogLog distinct-count estimates (``operators/sketches.py``) over
    two value streams chosen to exercise BOTH estimator branches: per-lang
    document texts (hundreds of distincts -> linear-counting branch) and
    (doc_id, term) posting pairs (tens of thousands -> raw HLL branch).
    The sketch is deterministic arithmetic, so the oracle recomputes it
    exactly — the entry gates the estimator itself, not just its inputs."""
    from ..functions.tokenize import doc_terms as doc_terms_fn
    from ..operators.sketches import hll_cardinality

    docs = _docs(spark, sf_dir)
    texts = docs.select(
        F.concat(F.lit("text:"), F.col("lang")).alias("grp"),
        F.col("text").alias("val"),
    )
    pairs = doc_terms_fn(docs).select(
        F.lit("pairs").alias("grp"),
        F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("term")).alias("val"),
    )
    return hll_cardinality(texts.unionByName(pairs), "val", ["grp"]).select(
        "grp", "est_distinct"
    )


def _sketch_sql() -> str:
    from ..operators.sketches import hll_sql

    return (
        "WITH "
        + _TOKS.strip()
        + """,
vals AS (
  SELECT 'text:' || lang AS grp, text AS val FROM documents
  UNION ALL
  SELECT 'pairs' AS grp, doc_id::VARCHAR || ':' || term AS val
  FROM (SELECT DISTINCT doc_id, term FROM toks)
),
"""
        + hll_sql("val", "vals", ["grp"]).strip()
    )


SQL_SKETCH_CARDINALITY = _sketch_sql()


def q_sketch_cardinality_large(spark, sf_dir):
    """Large-cardinality HLL regression pin: p=8 raw-branch estimates over
    ~2x10^4 distincts per group (lineitem line keys by returnflag). At this
    magnitude a 4.4e-8 relative skew in alpha moves the estimate by ~1e-3 —
    deterministically across a 4dp rounding boundary — so this entry is red
    on any tree where ``_alpha_expr``'s asymptotic branch (sketches.py)
    regresses to DECIMAL arithmetic (the round-3 ``sketch_cardinality``
    failure), regardless of which branch the smaller entries exercise."""
    from ..operators.sketches import hll_cardinality

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    vals = li.select(
        F.col("l_returnflag").alias("grp"),
        F.concat(
            F.col("l_orderkey").cast("string"),
            F.lit(":"),
            F.col("l_partkey").cast("string"),
            F.lit(":"),
            F.col("l_linenumber").cast("string"),
        ).alias("val"),
    )
    return hll_cardinality(vals, "val", ["grp"]).select("grp", "est_distinct")


def _sketch_large_sql() -> str:
    from ..operators.sketches import hll_sql

    return (
        """WITH vals AS (
  SELECT l_returnflag AS grp,
         l_orderkey::VARCHAR || ':' || l_partkey::VARCHAR || ':'
           || l_linenumber::VARCHAR AS val
  FROM lineitem
),
"""
        + hll_sql("val", "vals", ["grp"]).strip()
    )


SQL_SKETCH_CARDINALITY_LARGE = _sketch_large_sql()


# --- frequency sketching (Count-Min heavy hitters) ----------------------------

_CMS_D, _CMS_W, _CMS_K = 4, 32, 20


def q_sketch_heavy_hitters(spark, sf_dir):
    """Count-Min Sketch heavy hitters (``operators/cms.py``) over the token
    stream of the documents corpus: build the d x w counter sketch
    (tf-weighted), estimate every distinct term's frequency from the sketch
    alone (min over depth rows), rank the top k. w=32 is deliberately
    smaller than the corpus vocabulary so bucket collisions actually occur
    at test scale — the oracle must reproduce the resulting overestimates
    bit-for-bit, which gates the sketch arithmetic itself."""
    from ..functions.tokenize import doc_terms as doc_terms_fn
    from ..operators.cms import cms_topk

    dt = doc_terms_fn(_docs(spark, sf_dir))
    cands = dt.select("term").distinct()
    return cms_topk(
        dt, "term", cands, weight_col="tf", k=_CMS_K, d=_CMS_D, w=_CMS_W
    )


def _cms_hh_sql() -> str:
    from ..operators.cms import cms_sql

    return (
        "WITH "
        + _TOKS.strip()
        + ",\n"
        + cms_sql(
            "term", "1", "toks", "term", d=_CMS_D, w=_CMS_W, k=_CMS_K
        ).strip()
    )


SQL_SKETCH_HEAVY_HITTERS = _cms_hh_sql()


# --- quantile sketching (mergeable histogram) ---------------------------------

_HIST_QS, _HIST_BINS = [0.5, 0.9, 0.99], 64


def q_sketch_quantiles(spark, sf_dir):
    """Histogram-sketch quantiles (``operators/histogram.py``) of the events
    value column per event_type — P50/P90/P99 from nbins-bounded mergeable
    partials, no per-group sort of the raw values."""
    from ..operators.histogram import hist_quantile_sketch

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return hist_quantile_sketch(
        ev, "value", _HIST_QS, group_cols=["event_type"], nbins=_HIST_BINS
    ).select("event_type", "q", "est")


def _hist_sql() -> str:
    from ..operators.histogram import hist_sql

    return (
        "WITH "
        + hist_sql(
            "value", "events", _HIST_QS, ["event_type"], nbins=_HIST_BINS
        ).strip()
    )


SQL_SKETCH_QUANTILES = _hist_sql()


# --- collocations (PMI phrase mining) ------------------------------------------

_COLL_MIN, _COLL_M = 5, 20


def q_text_collocations(spark, sf_dir):
    """PMI-ranked adjacent-token collocations
    (``functions/text_analysis.py:collocations``) over the documents
    corpus — the phrase-mining signal for shingle-vocabulary selection."""
    return TA.collocations(
        _docs(spark, sf_dir), min_count=_COLL_MIN, m=_COLL_M
    ).select("rank", "bigram", F.col("c_ab").cast("long").alias("c_ab"), "pmi")


SQL_TEXT_COLLOCATIONS = f"""
WITH {_TOKS.strip()},
bg AS (
  SELECT u.a, u.b
  FROM tok_arr, LATERAL (
    SELECT unnest(
      [{{'a': t[i], 'b': t[i+1]}} for i in generate_series(1, len(t) - 1)],
      recursive := true
    )
  ) u
),
cab AS (SELECT a, b, count(*) AS c_ab FROM bg GROUP BY a, b),
uni AS (SELECT term, count(*) AS c FROM toks GROUP BY term),
tot AS (SELECT sum(c)::DOUBLE AS t FROM uni),
btot AS (SELECT sum(c_ab)::DOUBLE AS bt FROM cab),
scored AS (
  SELECT cab.a || ' ' || cab.b AS bigram, cab.c_ab,
         round(ln((cab.c_ab::DOUBLE * (SELECT t FROM tot) * (SELECT t FROM tot))
                  / ((SELECT bt FROM btot) * ua.c::DOUBLE * ub.c::DOUBLE)),
               6) AS pmi
  FROM cab
  JOIN uni ua ON ua.term = cab.a
  JOIN uni ub ON ub.term = cab.b
  WHERE cab.c_ab >= {_COLL_MIN}
)
SELECT rank, bigram, c_ab, pmi FROM (
  SELECT bigram, c_ab, pmi,
         row_number() OVER (ORDER BY pmi DESC, bigram ASC) AS rank
  FROM scored
) WHERE rank <= {_COLL_M}
"""


# --- sequence packing (concat-and-chunk training layout) -----------------------

_PACK_BUDGET = 256


def q_pack_sequences(spark, sf_dir):
    """Concat-and-chunk packing (``operators/packing.py``): each doc's token
    span and training-chunk range in the doc_id-ordered token stream cut
    every 256 tokens. TeraSort-pattern running total — no single-partition
    window."""
    from ..functions.tokenize import doc_lengths
    from ..operators.packing import pack_sequences

    lens = doc_lengths(_docs(spark, sf_dir)).withColumnRenamed("doc_len", "n_tokens")
    return pack_sequences(lens, _PACK_BUDGET).select(
        "doc_id", "n_tokens", "tok_start", "chunk_start", "chunk_end"
    )


SQL_PACK_SEQUENCES = f"""
WITH {_TOKS.strip()},
lens AS (
  SELECT d.doc_id, count(t.term) AS n_tokens
  FROM documents d LEFT JOIN toks t ON t.doc_id = d.doc_id
  GROUP BY d.doc_id
),
cum AS (
  SELECT doc_id, n_tokens,
         coalesce(sum(n_tokens) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0)::BIGINT AS tok_start
  FROM lens
)
SELECT doc_id, n_tokens, tok_start,
       (tok_start // {_PACK_BUDGET})::BIGINT AS chunk_start,
       (CASE WHEN n_tokens = 0 THEN tok_start // {_PACK_BUDGET}
             ELSE (tok_start + n_tokens - 1) // {_PACK_BUDGET} END)::BIGINT AS chunk_end
FROM cum
"""


def q_pack_chunks(spark, sf_dir):
    """Per-chunk export manifest over the packed layout
    (``operators/packing.py:chunk_manifest``): docs touching each chunk and
    exact per-chunk token attribution (split docs contribute their overlap)."""
    from ..functions.tokenize import doc_lengths
    from ..operators.packing import chunk_manifest, pack_sequences

    lens = doc_lengths(_docs(spark, sf_dir)).withColumnRenamed("doc_len", "n_tokens")
    packed = pack_sequences(lens, _PACK_BUDGET)
    return chunk_manifest(packed, _PACK_BUDGET).select(
        "chunk_id", F.col("n_docs").cast("long"), F.col("n_tokens").cast("long")
    )


SQL_PACK_CHUNKS = f"""
WITH {_TOKS.strip()},
lens AS (
  SELECT d.doc_id, count(t.term) AS n_tokens
  FROM documents d LEFT JOIN toks t ON t.doc_id = d.doc_id
  GROUP BY d.doc_id
),
cum AS (
  SELECT doc_id, n_tokens,
         coalesce(sum(n_tokens) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0)::BIGINT AS tok_start
  FROM lens
),
packed AS (
  SELECT doc_id, n_tokens, tok_start,
         (tok_start // {_PACK_BUDGET})::BIGINT AS chunk_start,
         (CASE WHEN n_tokens = 0 THEN tok_start // {_PACK_BUDGET}
               ELSE (tok_start + n_tokens - 1) // {_PACK_BUDGET} END)::BIGINT AS chunk_end
  FROM cum
),
spans AS (
  SELECT p.doc_id, p.n_tokens, p.tok_start, u.chunk_id
  FROM packed p, LATERAL (
    SELECT unnest(generate_series(p.chunk_start, p.chunk_end)) AS chunk_id
  ) u
  WHERE p.n_tokens > 0
)
SELECT chunk_id, count(*) AS n_docs,
       sum(greatest(
         least(tok_start + n_tokens, (chunk_id + 1) * {_PACK_BUDGET})
           - greatest(tok_start, chunk_id * {_PACK_BUDGET}),
         0))::BIGINT AS n_tokens
FROM spans
GROUP BY chunk_id
"""


def q_pack_export(spark, sf_dir):
    """Materialized training sequences (``operators/packing.py:
    export_chunks``): each 256-token chunk's text assembled from the
    overlapping documents' token slices in stream order — the export side
    of the packing layout, end-to-end."""
    from ..functions.tokenize import doc_lengths, tokenize_udf
    from ..operators.packing import export_chunks, pack_sequences

    docs = _docs(spark, sf_dir)
    lens = doc_lengths(docs).withColumnRenamed("doc_len", "n_tokens")
    packed = pack_sequences(lens, _PACK_BUDGET)
    toks = docs.select("doc_id", tokenize_udf(F.col("text")).alias("tokens"))
    return export_chunks(toks, packed, _PACK_BUDGET).select(
        "chunk_id", "n_tokens", "text"
    )


SQL_PACK_EXPORT = f"""
WITH {_TOKS.strip()},
lens AS (
  SELECT d.doc_id, count(t2.term) AS n_tokens
  FROM documents d LEFT JOIN toks t2 ON t2.doc_id = d.doc_id
  GROUP BY d.doc_id
),
cum AS (
  SELECT doc_id, n_tokens,
         coalesce(sum(n_tokens) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0)::BIGINT AS tok_start
  FROM lens
),
packed AS (
  SELECT doc_id, n_tokens, tok_start,
         (tok_start // {_PACK_BUDGET})::BIGINT AS chunk_start,
         (CASE WHEN n_tokens = 0 THEN tok_start // {_PACK_BUDGET}
               ELSE (tok_start + n_tokens - 1) // {_PACK_BUDGET} END)::BIGINT AS chunk_end
  FROM cum
),
spans AS (
  SELECT p.doc_id, p.tok_start, p.n_tokens, u.chunk_id
  FROM packed p, LATERAL (
    SELECT unnest(generate_series(p.chunk_start, p.chunk_end)) AS chunk_id
  ) u
  WHERE p.n_tokens > 0
),
pieces AS (
  SELECT s.chunk_id, s.tok_start,
         ta.t[greatest(s.tok_start, s.chunk_id * {_PACK_BUDGET}) - s.tok_start + 1 :
              least(s.tok_start + s.n_tokens, (s.chunk_id + 1) * {_PACK_BUDGET})
                - s.tok_start] AS piece
  FROM spans s JOIN tok_arr ta ON ta.doc_id = s.doc_id
)
SELECT chunk_id,
       sum(len(piece))::BIGINT AS n_tokens,
       string_agg(array_to_string(piece, ' '), ' ' ORDER BY tok_start) AS text
FROM pieces GROUP BY chunk_id
"""


# --- deterministic train/val/test split ---------------------------------------


def q_split_train_eval(spark, sf_dir):
    """Keyed-hash split assignment (``operators/splits.py``): md5-ppm bucket
    of the doc_id thresholded by cumulative fractions — stable across runs,
    engines, and corpus growth. The entry returns every doc's assignment
    plus the bucket, so the gate pins the hash arithmetic AND the
    threshold boundaries, not just the aggregate proportions."""
    from ..operators.splits import split_bucket, split_train_eval

    docs = _docs(spark, sf_dir)
    return split_train_eval(docs, key_col="doc_id").select(
        "doc_id", split_bucket(F.col("doc_id"), "split-v1").alias("bucket"), "split"
    )


def _split_sql() -> str:
    from ..operators.splits import split_sql_case

    bucket = "('0x' || substr(md5('split-v1:' || doc_id::VARCHAR), 1, 8))::BIGINT % 1000000"
    return f"""
SELECT doc_id, {bucket} AS bucket, {split_sql_case("doc_id")} AS split
FROM documents
"""


SQL_SPLIT_TRAIN_EVAL = _split_sql()


def pipeline_queries() -> dict:
    return {
        "dedup_exact": q_dedup_exact,
        "dedup_minhash_lsh": q_dedup_minhash,
        "dedup_ngram_jaccard": q_dedup_ngram,
        "dedup_components": q_dedup_components,
        "dedup_simhash": q_dedup_simhash,
        "dedup_spans": q_dedup_spans,
        "decontaminate": q_decontaminate,
        "ann_topk_brute": q_ann_topk_brute,
        "ann_topk_lsh": q_ann_topk_lsh,
        "ann_topk_ivf": q_ann_topk_ivf,
        "ann_topk_sq8": q_ann_topk_sq8,
        "emb_cosine_pairs": q_emb_cosine_pairs,
        "emb_near_dup_lsh": q_emb_near_dup_lsh,
        "text_token_profile": q_text_token_profile,
        "text_quality": q_text_quality,
        "select_token_budget": q_select_token_budget,
        "split_train_eval": q_split_train_eval,
        "text_lang_id": q_text_lang_id,
        "text_fingerprints": q_text_fingerprints,
        "text_repetition": q_text_repetition,
        "text_perplexity": q_text_perplexity,
        "text_dedup_lines": q_text_dedup_lines,
        "text_strip_boilerplate": q_text_strip_boilerplate,
        "text_scrub_pii": q_text_scrub_pii,
        "pipeline_clean": q_pipeline_clean,
        "media_stats": q_media_stats,
        "media_decode": q_media_decode,
        "url_host_stats": q_url_host_stats,
        "url_cap_per_domain": q_url_cap_per_domain,
        "url_sample_domains": q_url_sample_domains,
        "events_windowed": q_events_windowed,
        "events_sessions": q_events_sessions,
        "events_daily": q_events_daily,
        "events_distinct_hll": q_events_distinct_hll,
        "events_heavy_hitters": q_events_heavy_hitters,
        "events_windowed_quantiles": q_events_windowed_quantiles,
        "sketch_cardinality": q_sketch_cardinality,
        "sketch_cardinality_large": q_sketch_cardinality_large,
        "sketch_heavy_hitters": q_sketch_heavy_hitters,
        "sketch_quantiles": q_sketch_quantiles,
        "text_collocations": q_text_collocations,
        "pack_sequences": q_pack_sequences,
        "pack_chunks": q_pack_chunks,
        "pack_export": q_pack_export,
    }


def pipeline_oracles() -> dict:
    return {
        "dedup_exact": SQL_DEDUP_EXACT,
        "dedup_minhash_lsh": SQL_DEDUP_MINHASH,
        "dedup_ngram_jaccard": SQL_DEDUP_NGRAM,
        "dedup_components": SQL_DEDUP_COMPONENTS,
        "dedup_simhash": SQL_DEDUP_SIMHASH,
        "dedup_spans": SQL_DEDUP_SPANS,
        "decontaminate": SQL_DECONTAMINATE,
        "ann_topk_brute": SQL_ANN_TOPK_BRUTE,
        "ann_topk_lsh": SQL_ANN_TOPK_LSH,
        "ann_topk_sq8": SQL_ANN_TOPK_SQ8,
        "emb_cosine_pairs": SQL_EMB_COSINE_PAIRS,
        "emb_near_dup_lsh": SQL_EMB_NEAR_DUP_LSH,
        "text_token_profile": SQL_TEXT_TOKEN_PROFILE,
        "text_quality": SQL_TEXT_QUALITY,
        "select_token_budget": SQL_SELECT_TOKEN_BUDGET,
        "split_train_eval": SQL_SPLIT_TRAIN_EVAL,
        "text_lang_id": SQL_TEXT_LANG_ID,
        "text_fingerprints": SQL_TEXT_FINGERPRINTS,
        "text_repetition": SQL_TEXT_REPETITION,
        "text_perplexity": SQL_TEXT_PERPLEXITY,
        "text_dedup_lines": SQL_TEXT_DEDUP_LINES,
        "text_strip_boilerplate": SQL_TEXT_STRIP_BOILERPLATE,
        "text_scrub_pii": SQL_TEXT_SCRUB_PII,
        "pipeline_clean": SQL_PIPELINE_CLEAN,
        "media_stats": SQL_MEDIA_STATS,
        "media_decode": SQL_MEDIA_DECODE,
        "url_host_stats": SQL_URL_HOST_STATS,
        "url_cap_per_domain": SQL_URL_CAP_PER_DOMAIN,
        "url_sample_domains": SQL_URL_SAMPLE_DOMAINS,
        "events_windowed": SQL_EVENTS_WINDOWED,
        "events_sessions": SQL_EVENTS_SESSIONS,
        "events_daily": SQL_EVENTS_DAILY,
        "events_distinct_hll": SQL_EVENTS_DISTINCT_HLL,
        "events_heavy_hitters": SQL_EVENTS_HEAVY_HITTERS,
        "events_windowed_quantiles": SQL_EVENTS_WINDOWED_QUANTILES,
        # ann_topk_ivf runs in exact-fold mode, so even the iterative
        # k-means is mirrored (unrolled Lloyd CTEs, bit-exact folds).
        "ann_topk_ivf": SQL_ANN_TOPK_IVF,
        "sketch_cardinality": SQL_SKETCH_CARDINALITY,
        "sketch_cardinality_large": SQL_SKETCH_CARDINALITY_LARGE,
        "sketch_heavy_hitters": SQL_SKETCH_HEAVY_HITTERS,
        "sketch_quantiles": SQL_SKETCH_QUANTILES,
        "text_collocations": SQL_TEXT_COLLOCATIONS,
        "pack_sequences": SQL_PACK_SEQUENCES,
        "pack_chunks": SQL_PACK_CHUNKS,
        "pack_export": SQL_PACK_EXPORT,
    }


def bench_queries() -> dict:
    """The pipeline subset timed by bench.py."""
    return {
        "dedup_minhash_lsh": q_dedup_minhash,
        "dedup_simhash": q_dedup_simhash,
        "ann_topk_brute": q_ann_topk_brute,
        "text_quality": q_text_quality,
        "select_token_budget": q_select_token_budget,
        "text_fingerprints": q_text_fingerprints,
        "text_repetition": q_text_repetition,
        "text_perplexity": q_text_perplexity,
        "text_dedup_lines": q_text_dedup_lines,
    }
