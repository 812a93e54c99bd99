"""Deduplication operators for large-scale training-data pipelines.

Four families, all expressed as declarative DataFrame plans over a
``(doc_id, text)`` corpus (JVM-side expressions only — no Python in the hot
path), each with an exactly-matching ANSI-SQL oracle (see
``plans/pipeline_entry.py``):

  * ``exact_dedup``        — hash-groupBy on md5(text); one shuffle.
  * ``minhash_lsh_pairs``  — word-shingle MinHash signatures, banded LSH
    candidate generation, exact Jaccard verification of candidates.
  * ``simhash_pairs``      — 48-bit tf-weighted SimHash fingerprints, banded
    (4 x 12-bit) pair join; **exact** for hamming distance <= 3 by pigeonhole
    (4 bands, <= 3 differing bits => >= 1 band identical).
  * ``ngram_jaccard_pairs``— exact shingle-set Jaccard via a shared-shingle
    join (the brute-force baseline minhash_lsh approximates).

Scale notes (10^12 docs):
  * every op is a groupBy/join on a hash-distributed key — no driver-side
    state, no collect; AQE handles residual skew.
  * the LSH band join's worst skew is a band_key shared by a near-duplicate
    *cluster* (e.g. boilerplate pages). The candidate join is bounded by
    cluster_size^2 per key; mitigation at scale is a pre-count + cap on
    band_key group size (``max_band_size``), dropping pathological keys
    (standard practice; dropped keys are all-identical boilerplate anyway).
  * determinism: every pseudo-random choice (minhash permutations, simhash
    bit projections) is an md5 of term/shingle text — byte-identical across
    executors, runs, and the DuckDB oracle. No RNG state anywhere.

The reference has no dedup surface (nearest analog: upsert-by-id,
/root/reference/src/neural_search/storage/faiss_store.py:113-166); these are
the pipeline operators the north-star corpus (Common-Crawl-style pages)
needs before indexing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# DuckDB RE2 and Java regex agree on ASCII \w; the bit-exact-Python tokenizer
# (functions/tokenize.py) is the BM25 contract — dedup shingling is defined
# JVM-side for scale and mirrored verbatim in the SQL oracles.
_TOKEN_RE = r"\w+"


def tokens_col(text: Column) -> Column:
    """array<string> of lowercase word tokens (JVM regex, group 0)."""
    return F.regexp_extract_all(F.lower(text), F.lit(_TOKEN_RE), 0)


def _shingles_df(corpus: DataFrame, k: int) -> DataFrame:
    """(doc_id, shingle) distinct: word k-gram shingles 'w1 w2 ... wk'."""
    k_parts = ", ".join(f"t[i+{j}]" for j in range(k))
    sh = F.when(
        F.size(F.col("t")) >= k,
        F.expr(f"transform(sequence(0, size(t) - {k}), i -> concat_ws(' ', {k_parts}))"),
    ).otherwise(F.array().cast("array<string>"))
    return (
        corpus.select("doc_id", tokens_col(F.col("text")).alias("t"))
        .select("doc_id", F.explode(sh).alias("shingle"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_groups(corpus: DataFrame, text_col: str = "text") -> DataFrame:
    """(group_hash, rep_doc_id, n_docs): one row per distinct text.

    ``rep_doc_id`` = min doc_id of the group (the kept representative).
    One hash-partitioned groupBy — the canonical exact-dedup at any scale.
    """
    return (
        corpus.select(F.md5(F.col(text_col)).alias("group_hash"), "doc_id")
        .groupBy("group_hash")
        .agg(
            F.min("doc_id").alias("rep_doc_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


def exact_dedup(corpus: DataFrame, text_col: str = "text") -> DataFrame:
    """The deduplicated corpus: keeps the min-doc_id row per distinct text."""
    reps = exact_dedup_groups(corpus, text_col).select(
        F.col("rep_doc_id").alias("doc_id")
    )
    return corpus.join(reps, "doc_id")


# ---------------------------------------------------------------------------
# MinHash + banded LSH
# ---------------------------------------------------------------------------


def minhash_signatures(
    corpus: DataFrame, n_hashes: int = 12, k: int = 3
) -> DataFrame:
    """(doc_id, i, h): minhash value per (doc, hash-function i).

    Hash family i is "md5 of i#shingle", minimized lexicographically — a
    random permutation of the shingle space per i, reproducible anywhere md5
    exists (the DuckDB oracle uses the identical expression).

    Shape: all n_hashes mins are computed as separate aggregates in ONE
    groupBy(doc_id) pass (map-side partial mins, one shuffle of n_docs rows),
    instead of exploding every shingle n_hashes-fold — at 10^12 docs that
    explode would shuffle n_hashes x total-shingle volume.
    """
    sh = _shingles_df(corpus, k)
    hashed = sh.select(
        "doc_id",
        *[
            F.md5(F.concat_ws("#", F.lit(str(i)), F.col("shingle"))).alias(f"hv{i}")
            for i in range(n_hashes)
        ],
    )
    mins = hashed.groupBy("doc_id").agg(
        *[F.min(f"hv{i}").alias(f"h{i}") for i in range(n_hashes)]
    )
    # melt back to the (doc_id, i, h) long form the band/oracle logic uses
    stack_expr = ", ".join(f"{i}, h{i}" for i in range(n_hashes))
    return mins.selectExpr(
        "doc_id", f"stack({n_hashes}, {stack_expr}) AS (i, h)"
    )


def minhash_band_keys(signatures: DataFrame, rows_per_band: int = 3) -> DataFrame:
    """(doc_id, band, band_key): md5 of the band's concatenated minhashes."""
    banded = signatures.withColumn(
        "band", (F.col("i") / rows_per_band).cast("int")
    )
    return banded.groupBy("doc_id", "band").agg(
        F.md5(
            F.concat_ws(
                "#",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("i", "h"))),
                    lambda s: s["h"],
                ),
            )
        ).alias("band_key")
    )


def minhash_lsh_pairs(
    corpus: DataFrame,
    threshold: float = 0.5,
    n_hashes: int = 12,
    rows_per_band: int = 3,
    k: int = 3,
    max_band_size: int | None = None,
) -> DataFrame:
    """(doc_a, doc_b, jaccard): near-dup pairs found by banded MinHash LSH.

    Candidates = pairs sharing >= 1 band key; each candidate's **exact**
    shingle-set Jaccard is then computed and thresholded, so the output is
    deterministic (the only approximation is recall: a pair sharing no band
    is never considered — the standard LSH contract).

    ``max_band_size`` is the head-skew guard for web scale: a band key shared
    by a giant boilerplate cluster makes the self-join quadratic in the
    cluster size; capping drops keys above the bound (their docs still pair
    through their OTHER bands unless every band is pathological — i.e. the
    documents are near-identical boilerplate, exactly the case where exact
    dedup already catches them). None = exact behavior, no key dropped.
    """
    bands = minhash_band_keys(minhash_signatures(corpus, n_hashes, k), rows_per_band)
    if max_band_size is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("band", "band_key")
        bands = bands.withColumn("_sz", F.count(F.lit(1)).over(w)).where(
            F.col("_sz") <= max_band_size
        ).drop("_sz")
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sized = _shingle_jaccard(corpus, cand, k)
    return sized.where(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact baseline)
# ---------------------------------------------------------------------------


def _shingle_jaccard(corpus: DataFrame, pairs: DataFrame, k: int) -> DataFrame:
    """Exact Jaccard for given (doc_a, doc_b) pairs over k-shingle sets."""
    sh = _shingles_df(corpus, k)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    inter = (
        pairs.join(sh.select(F.col("doc_id").alias("doc_a"), "shingle"), "doc_a")
        .join(
            sh.select(F.col("doc_id").alias("doc_b"), "shingle"),
            ["doc_b", "shingle"],
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("n_inter").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_inter"))
            ).alias("jaccard"),
        )
    )


def ngram_jaccard_pairs(
    corpus: DataFrame, threshold: float = 0.5, k: int = 3
) -> DataFrame:
    """(doc_a, doc_b, jaccard): ALL pairs with shingle Jaccard >= threshold.

    Exact (no LSH): candidates are generated by the shared-shingle join
    itself — a pair with jaccard > 0 shares >= 1 shingle, so nothing is
    missed. Cost is Σ_shingle df(shingle)^2; at web scale this op is the
    *verifier* behind minhash_lsh_pairs, not a standalone full-corpus scan.
    """
    sh = _shingles_df(corpus, k)
    cand = (
        sh.alias("a")
        .join(sh.alias("b"), "shingle")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    return _shingle_jaccard(corpus, cand, k).where(F.col("jaccard") >= threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 48
SIMHASH_BANDS = 4  # 12 bits each; exact for hamming <= SIMHASH_BANDS - 1


def simhash_fingerprints(corpus: DataFrame) -> DataFrame:
    """(doc_id, fp): 48-bit tf-weighted SimHash as a bigint.

    Bit j of fp is set iff Σ_terms tf * (2*bit_j(md5(term)) - 1) > 0, where
    bit_j(md5) = bit (j % 4) of hex digit (j / 4) of the term's md5 — fully
    portable (the SQL oracle spells the identical arithmetic).
    """
    toks = corpus.select(
        "doc_id", F.explode(tokens_col(F.col("text"))).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    tf = tf.withColumn("h", F.md5(F.col("term")))
    bits = tf.select(
        "doc_id",
        "tf",
        "h",
        F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))).alias("j"),
    )
    # hex digit j/4 of md5(term), bit j%4 of that digit
    bit = F.expr(
        "shiftright(instr('0123456789abcdef', substring(h, cast(j / 4 as int) + 1, 1)) - 1, "
        "cast(j % 4 as int))"
    ).bitwiseAND(F.lit(1))
    votes = bits.select(
        "doc_id", "j", (F.col("tf") * (bit * 2 - 1)).alias("vote")
    ).groupBy("doc_id", "j").agg(F.sum("vote").alias("v"))
    return votes.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("v") > 0, F.expr("shiftleft(cast(1 as bigint), j)")).otherwise(
                F.lit(0).cast("long")
            )
        ).alias("fp")
    )


def simhash_pairs(corpus: DataFrame, max_hamming: int = 3) -> DataFrame:
    """(doc_a, doc_b, hamming): pairs with SimHash hamming distance <= 3.

    Banded join: fps agreeing on >= 1 of 4 12-bit bands are candidates; by
    pigeonhole any pair with <= 3 differing bits shares a band, so for
    max_hamming <= 3 this is EXACT while joining on a 12-bit key instead of
    a full cross product.
    """
    if max_hamming >= SIMHASH_BANDS:
        raise ValueError("banded simhash join is only exact for max_hamming < n_bands")
    fps = simhash_fingerprints(corpus)
    width = SIMHASH_BITS // SIMHASH_BANDS
    banded = fps.select(
        "doc_id",
        "fp",
        F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BANDS - 1))).alias("band"),
    ).withColumn(
        "band_val",
        F.expr(f"shiftright(fp, band * {width})").bitwiseAND(F.lit((1 << width) - 1)),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.fp").alias("fp_a"),
            F.col("b.fp").alias("fp_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return (
        cand.select("doc_a", "doc_b", ham.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# Near-duplicate clustering: connected components over dup pairs
# ---------------------------------------------------------------------------


def connected_components(pairs: DataFrame, max_iter: int = 25) -> DataFrame:
    """(doc_id, component): component = min doc_id reachable via dup pairs.

    Min-label propagation: each iteration every node takes the min of its own
    and its neighbors' labels — converges in O(component diameter) rounds,
    and near-dup clusters are shallow (a few hops), so a handful of
    iterations suffices even at web scale. Each round is one join + one
    groupBy on the edge list; lineage is truncated per round
    (localCheckpoint) so plans stay flat. Deterministic: the representative
    is always the min doc_id of the component.

    (For adversarial long-chain graphs the classic large-star/small-star
    alternation bounds rounds at O(log n); not needed for dedup clusters.)
    """
    edges = (
        pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .unionByName(
            pairs.select(F.col("doc_b").alias("a"), F.col("doc_a").alias("b"))
        )
        .distinct()
    )
    edges = edges.localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("a").alias("doc_id"))
        .distinct()
        .withColumn("component", F.col("doc_id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        msgs = edges.join(
            labels.withColumnRenamed("doc_id", "a"), "a"
        ).select(F.col("b").alias("doc_id"), "component")
        new_labels = (
            labels.unionByName(msgs)
            .groupBy("doc_id")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .where(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def dedup_components(
    corpus: DataFrame,
    threshold: float = 0.5,
    n_hashes: int = 12,
    rows_per_band: int = 3,
    k: int = 3,
) -> DataFrame:
    """(doc_id, component): near-dup cluster assignment for every doc that
    participates in at least one LSH-verified duplicate pair. Keeping
    ``min(doc_id)`` per component is the standard train-data dedup policy."""
    pairs = minhash_lsh_pairs(corpus, threshold, n_hashes, rows_per_band, k)
    return connected_components(pairs)


# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------


def benchmark_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    k: int = 4,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_hits): training docs sharing >= 1 word k-gram with an
    evaluation set — the standard pre-training decontamination pass (GPT-3
    style n-gram overlap: a train doc that contains benchmark text must be
    dropped or the eval is meaningless).

    ``benchmark`` is any (doc_id, text) frame; its distinct shingles are
    BROADCAST — eval sets are thousands of docs against a 10^12-doc corpus,
    so the corpus-side shingle stream never shuffles for the probe; the only
    shuffle is the per-doc hit count. ``n_hits`` counts distinct
    contaminated shingles per training doc.
    """
    doc_sh = _shingles_df(corpus.select("doc_id", F.col(text_col).alias("text")), k)
    bench_sh = (
        _shingles_df(benchmark.select("doc_id", F.col(text_col).alias("text")), k)
        .select("shingle")
        .distinct()
    )
    return (
        doc_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )
