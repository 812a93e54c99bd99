"""Text-analysis operators for training-data pipelines, all JVM-side.

Every function is a declarative Column/DataFrame plan (no Python UDFs), so
Catalyst fuses it into the scan stage — at 10^12 docs these run at full
whole-stage-codegen throughput with zero shuffles (token_profile /
quality_score / lang_id are per-row; fingerprints add one explode).

  * ``token_profile``    — token count, distinct terms, type-token ratio.
  * ``quality_score``    — heuristic quality in [0,1] from length, mean word
    length, alpha ratio, stopword ratio (Gopher/C4-style filters).
  * ``lang_id``          — stopword-hit language guess over a small built-in
    function-word table (broadcast join + argmax), n-gram-heuristic class.
  * ``doc_fingerprints`` — winnowing document fingerprints: k-gram md5
    hashes, min per sliding window of w, distinct (Schleimer et al.'s
    winnowing, the standard local-fingerprint scheme); array ops only.
  * ``dedup_lines_within_doc`` — C4-style within-page repeated-line
    removal (one explode + two shuffles, order-preserving reassembly).
  * ``bigram_lm_xent`` — CCNet-style perplexity filtering: self-trained
    add-one bigram LM, per-doc cross-entropy (two count aggregates + two
    joins + one ordered fold; the only op here with shuffles by design).

Each has a line-for-line DuckDB oracle in plans/pipeline_entry.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TOKEN_RE = r"\w+"

# tiny function-word lists; enough to separate the heuristic's classes.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "de": ["der", "die", "und", "das", "von", "zu", "mit", "ist", "den", "nicht"],
    "fr": ["le", "la", "et", "les", "des", "en", "du", "que", "une", "dans"],
    "es": ["el", "la", "de", "que", "los", "en", "un", "por", "con", "una"],
}


def tokens_col(text: Column) -> Column:
    return F.regexp_extract_all(F.lower(text), F.lit(_TOKEN_RE), 0)


def token_profile(corpus: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_distinct, ttr): per-doc token statistics."""
    t = tokens_col(F.col(text_col))
    return corpus.select(
        "doc_id",
        F.size(t).alias("n_tokens"),
        F.size(F.array_distinct(t)).alias("n_distinct"),
        F.when(F.size(t) > 0, F.size(F.array_distinct(t)) / F.size(t))
        .otherwise(F.lit(0.0))
        .alias("ttr"),
    )


def quality_components(corpus: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality signals (each in [0,1] or a raw count).

    * length_ok   — 1 if 10 <= n_tokens <= 100000 (C4-style bounds)
    * mean_wl_ok  — 1 if mean token length in [3, 10] (Gopher)
    * alpha_ratio — fraction of characters that are word characters
    * stop_ratio  — fraction of tokens that are English stopwords
    """
    t = tokens_col(F.col(text_col))
    text = F.col(text_col)
    n_tok = F.size(t)
    total_tok_chars = F.aggregate(
        F.transform(t, lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
    )
    mean_wl = F.when(n_tok > 0, total_tok_chars.cast("double") / n_tok).otherwise(F.lit(0.0))
    n_word_chars = F.length(F.regexp_replace(F.lower(text), r"[^a-z0-9_]", ""))
    alpha_ratio = F.when(
        F.length(text) > 0, n_word_chars.cast("double") / F.length(text)
    ).otherwise(F.lit(0.0))
    sw = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.filter(t, lambda x: F.array_contains(sw, x)))
    stop_ratio = F.when(n_tok > 0, n_stop.cast("double") / n_tok).otherwise(F.lit(0.0))
    return corpus.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        mean_wl.alias("mean_word_len"),
        alpha_ratio.alias("alpha_ratio"),
        stop_ratio.alias("stop_ratio"),
        F.when((n_tok >= 10) & (n_tok <= 100000), 1.0).otherwise(0.0).alias("length_ok"),
        F.when((mean_wl >= 3.0) & (mean_wl <= 10.0), 1.0).otherwise(0.0).alias("mean_wl_ok"),
    )


def quality_score(corpus: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, quality): weighted combination of the quality components."""
    c = quality_components(corpus, text_col)
    score = (
        0.3 * F.col("length_ok")
        + 0.2 * F.col("mean_wl_ok")
        + 0.3 * F.least(F.col("alpha_ratio") / 0.8, F.lit(1.0))
        + 0.2 * F.least(F.col("stop_ratio") / 0.3, F.lit(1.0))
    )
    return c.select("doc_id", score.alias("quality"))


def lang_id(corpus: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, pred_lang, hits): language with most function-word hits.

    Tie/zero-hit rule: highest hits wins, ties break on ascending lang code;
    docs with zero hits in every list get pred_lang='und'. The stopword
    table is broadcast (it would stay tiny at any corpus scale).
    """
    spark = corpus.sparkSession
    rows = [(lang, w) for lang, ws in STOPWORDS.items() for w in ws]
    swdf = spark.createDataFrame(rows, "lang string, word string")
    toks = corpus.select(
        "doc_id", F.explode(tokens_col(F.col(text_col))).alias("word")
    )
    hits = (
        toks.join(F.broadcast(swdf), "word")
        .groupBy("doc_id", "lang")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("hits"), F.asc("lang"))
    best = (
        hits.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("doc_id", F.col("lang").alias("pred_lang"), "hits")
    )
    return (
        corpus.select("doc_id")
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("pred_lang"), F.lit("und")).alias("pred_lang"),
            F.coalesce(F.col("hits"), F.lit(0)).alias("hits"),
        )
    )


def doc_fingerprints(
    corpus: DataFrame, k: int = 4, window: int = 4, text_col: str = "text"
) -> DataFrame:
    """(doc_id, fp): distinct winnowing fingerprints (md5 hex of k-grams).

    k-gram hashes h_0..h_{n-1}; fingerprint set = { min(h_i..h_{i+w-1}) for
    each window }. All array ops (transform/slice/array_min) — order is the
    in-document order, no window-function shuffle needed.
    """
    k_parts = ", ".join(f"t[i+{j}]" for j in range(k))
    hashes = F.when(
        F.size(F.col("t")) >= k,
        F.expr(
            f"transform(sequence(0, size(t) - {k}), i -> md5(concat_ws(' ', {k_parts})))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    mins = F.when(
        F.size(F.col("h")) >= window,
        F.expr(
            f"transform(sequence(0, size(h) - {window}), "
            f"i -> array_min(slice(h, i + 1, {window})))"
        ),
    ).otherwise(F.col("h"))
    return (
        corpus.select("doc_id", tokens_col(F.col(text_col)).alias("t"))
        .select("doc_id", hashes.alias("h"))
        .select("doc_id", F.explode(mins).alias("fp"))
        .distinct()
    )


def repetition_profile(corpus: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, dup_token_ratio, top_bigram_share): Gopher-style repetition
    signals — the fraction of tokens that are repeats of an earlier token,
    and the share of all bigrams taken by the single most frequent bigram.
    Boilerplate/spam pages score high on both; all array expressions, no
    shuffle, no Python."""
    bigrams = F.when(
        F.size(F.col("t")) >= 2,
        F.expr(
            "transform(sequence(0, size(t) - 2), i -> concat_ws(' ', t[i], t[i+1]))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    # share of the most frequent bigram: sort the bigram array, then one
    # linear run-length pass (aggregate with struct state) — O(L log L) per
    # doc, shuffle-free. (The distinct-rescan form is O(L^2) per doc: a
    # 100k-token page would cost ~10^10 comparisons in a single row.)
    top_share = F.when(
        F.size(F.col("bg")) > 0,
        F.expr(
            "aggregate(array_sort(bg), "
            "named_struct('prev', cast(null as string), 'run', 0L, 'best', 0L), "
            "(acc, x) -> named_struct("
            "  'prev', x, "
            "  'run', if(acc.prev <=> x, acc.run + 1L, 1L), "
            "  'best', greatest(acc.best, if(acc.prev <=> x, acc.run + 1L, 1L))), "
            "acc -> acc.best) / cast(size(bg) as double)"
        ),
    ).otherwise(F.lit(0.0))
    dup_ratio = (
        F.when(
            F.size("t") > 0,
            (F.size("t") - F.size(F.array_distinct("t"))) / F.size("t"),
        )
        .otherwise(F.lit(0.0))
    )
    return (
        corpus.select("doc_id", tokens_col(F.col(text_col)).alias("t"))
        .select("doc_id", F.col("t"), bigrams.alias("bg"))
        .select(
            "doc_id",
            F.round(dup_ratio, 6).alias("dup_token_ratio"),
            F.round(top_share, 6).alias("top_bigram_share"),
        )
    )


# ---------------------------------------------------------------------------
# Line-level boilerplate removal (C4 / MassiveText-style)
# ---------------------------------------------------------------------------


def line_doc_counts(
    corpus: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(line, n_docs): distinct documents containing each normalized line.

    The corpus-wide pass behind line-level boilerplate removal (C4 discards
    repeated 3-sentence spans; MassiveText/RefinedWeb discard lines that
    recur across documents — cookie banners, nav bars, footers). Lines are
    ``trim``-normalized; empties dropped. ONE explode + one hash aggregate
    keyed on the line; map-side partial aggregation collapses the ultra-
    frequent boilerplate keys before the shuffle, so the mega-key skew is
    bounded. At 10^12 docs, key on ``md5(line)`` instead of the raw string
    to cut shuffle width — same plan shape.
    """
    lines = (
        corpus.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.col(text_col), "\n")).alias("raw"),
        )
        .select("doc_id", F.trim(F.col("raw")).alias("line"))
        .where(F.col("line") != "")
    )
    return (
        lines.distinct()  # count each doc once per line
        .groupBy("line")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def strip_boilerplate_lines(
    corpus: DataFrame,
    min_docs: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_lines, n_kept, clean_text): drop every line that occurs in
    >= ``min_docs`` distinct documents, preserving the surviving lines'
    original order.

    Two shuffles total at any scale: the ``line_doc_counts`` aggregate and
    the per-doc reassembly groupBy. The boilerplate join is keyed on the
    line; when ``min_docs`` is high the boilerplate set is small enough to
    broadcast. Documents whose every line is blank are not emitted (there is
    nothing to clean); the driver entry's corpus has none.
    """
    boiler = (
        line_doc_counts(corpus, text_col, id_col)
        .where(F.col("n_docs") >= min_docs)
        .select("line", F.lit(True).alias("is_boiler"))
    )
    lines = (
        corpus.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(F.split(F.col(text_col), "\n")).alias("idx", "raw"),
        )
        .select("doc_id", "idx", F.trim(F.col("raw")).alias("line"))
        .where(F.col("line") != "")
    )
    flagged = lines.join(boiler, "line", "left").select(
        "doc_id", "idx", "line",
        F.coalesce(F.col("is_boiler"), F.lit(False)).alias("is_boiler"),
    )
    parts = F.array_sort(F.collect_list(F.struct("idx", "line", "is_boiler")))
    kept = F.filter(parts, lambda x: ~x["is_boiler"])
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(F.when(~F.col("is_boiler"), 1).otherwise(0)).cast("long").alias("n_kept"),
        F.concat_ws("\n", F.transform(kept, lambda x: x["line"])).alias("clean_text"),
    )


def bigram_lm_xent(
    corpus: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_bigrams, xent): bigram-LM cross-entropy per token — the
    CCNet-style perplexity-filtering signal (ppl = e^xent).

    Trains an add-one-smoothed bigram model ON the corpus itself (the public
    CCNet recipe scores with a KenLM n-gram model; self-training keeps the
    operator dependency-free and the semantics identical: low xent = fluent /
    templated text, high xent = noise) and scores every document:

        P(w2|w1) = (C(w1 w2) + 1) / (C(w1 ·) + V)
        xent     = -(1/n) Σ_positions ln P

    Plan shape at 10^12 docs: two count aggregates (bigram, history — both
    map-side-combined, one row per key), two shuffle joins back onto the
    bigram stream keyed on (w1,w2) / w1 — Zipf head tokens make the probe
    side skewed, which AQE skew-split handles since the build sides are
    pre-aggregated — and one per-doc fold. No Python anywhere.

    Cross-engine determinism (same discipline as the rest of this module):
    every ln is taken on an INTEGER argument and rounded to 6dp before any
    arithmetic (JVM StrictMath and DuckDB libm lns differ by 1 ulp on ~3% of
    integer inputs; rounded to 6dp they agreed on all of 1..200000), and the
    per-doc sum folds the rounded values in token-position order
    (sort_array(collect_list) + F.aggregate == DuckDB list_sum(list(... ORDER
    BY pos))), so the driver's value-hash matches bit-for-bit.

    Docs with fewer than two tokens have no bigrams and are not emitted.
    """
    t = tokens_col(F.col(text_col))
    toks = corpus.select(F.col(id_col).alias("doc_id"), t.alias("t")).where(
        F.size("t") >= 2
    )
    vocab = toks.select(F.explode("t").alias("term")).select(
        F.countDistinct("term")
    ).collect()[0][0]
    bgarr = F.zip_with(
        F.slice(F.col("t"), 1, F.size("t") - 1),
        F.slice(F.col("t"), 2, F.size("t") - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    bg = toks.select("doc_id", F.posexplode(bgarr).alias("pos", "b")).select(
        "doc_id", "pos", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2")
    )
    c12 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    c1 = bg.groupBy("w1").agg(F.count("*").alias("c1"))
    scored = (
        bg.join(c12, ["w1", "w2"])
        .join(c1, ["w1"])
        .select(
            "doc_id",
            "pos",
            (
                F.round(F.log(F.col("c12") + 1), 6)
                - F.round(F.log(F.col("c1") + F.lit(int(vocab))), 6)
            ).alias("lp"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sort_array(F.collect_list(F.struct("pos", "lp"))).alias("lv"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.round(
                -F.aggregate(F.col("lv"), F.lit(0.0), lambda a, s: a + s["lp"])
                / F.col("n_bigrams"),
                6,
            ).alias("xent"),
        )
    )


def dedup_lines_within_doc(
    corpus: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_lines, n_kept, clean_text): drop repeated lines WITHIN each
    document, keeping the first occurrence in original order.

    The within-page half of the classic cleanup pair (C4 deduplicates
    repeated paragraphs inside a page; MassiveText repeated lines) —
    ``strip_boilerplate_lines`` handles the cross-document half. Linear in
    document length: one explode, a first-occurrence groupBy, and an
    ordered reassembly groupBy — deliberately NOT the per-row
    ``array_position`` form, which is O(L²) in a single task on a
    100k-line page (the straggler class the repetition profile had to be
    cured of). Duplicate blank lines collapse too (matches C4, which
    treats any repeated paragraph the same).
    """
    lines = corpus.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("idx", "line"),
    )
    first = lines.groupBy("doc_id", "line").agg(
        F.min("idx").alias("idx"), F.count("*").alias("n_occ")
    )
    return (
        first.groupBy("doc_id")
        .agg(
            F.sum("n_occ").alias("n_lines"),
            F.count("*").alias("n_kept"),
            F.concat_ws(
                "\n",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("idx", "line"))),
                    lambda s: s["line"],
                ),
            ).alias("clean_text"),
        )
        .select(
            "doc_id",
            F.col("n_lines").cast("long").alias("n_lines"),
            F.col("n_kept").cast("long").alias("n_kept"),
            "clean_text",
        )
    )


def collocations(
    corpus: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    m: int = 20,
    rounding: int = 6,
) -> DataFrame:
    """(rank, bigram, c_ab, pmi): corpus-level collocations — adjacent-token
    bigrams ranked by pointwise mutual information

        pmi = ln( P(ab) / (P(a) P(b)) )
            = ln( (c_ab * T * T) / (B * c_a * c_b) )

    with c_ab the bigram occurrence count (within-document adjacency only),
    c_a/c_b unigram occurrence counts, T total tokens, B total bigrams. The
    standard phrase-mining / shingle-vocabulary signal for web corpora
    (which multiword units deserve their own index term); ``min_count``
    suppresses the low-frequency PMI explosion, ties break on the bigram
    string.

    Scale shape: one explode + two partial-agg counts (bigram, unigram) —
    both vocabulary-bounded after aggregation; the final top-m window runs
    over the min_count-filtered bigram table (vocabulary-sized, corpus-size
    independent), never over corpus rows. All arithmetic is one ln over a
    ratio of exact counts, rounded — cross-engine reproducible.
    """
    toks = corpus.select(tokens_col(F.col(text_col)).alias("t"))
    # guard: slice() rejects a negative length, so docs with < 2 tokens
    # (incl. empty text) must not reach the bigram transform
    pairs = (
        toks.where(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(slice(t, 1, size(t) - 1),"
                    " (x, i) -> struct(x AS a, element_at(t, i + 2) AS b))"
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
    )
    # one tokenize pass feeds both counts; the aggregated tables are
    # vocabulary-bounded, so the scalar totals read them, not the corpus
    cab = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c_ab")).persist()
    uni = (
        toks.select(F.explode("t").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist()
    )
    total_t = float(uni.agg(F.sum("c")).collect()[0][0] or 0)
    total_b = float(cab.agg(F.sum("c_ab")).collect()[0][0] or 0)

    ua = uni.select(F.col("term").alias("a"), F.col("c").alias("c_a"))
    ub = uni.select(F.col("term").alias("b"), F.col("c").alias("c_b"))
    pmi = F.round(
        F.log(
            (F.col("c_ab").cast("double") * F.lit(total_t) * F.lit(total_t))
            / (F.lit(total_b) * F.col("c_a").cast("double") * F.col("c_b").cast("double"))
        ),
        rounding,
    )
    scored = (
        cab.where(F.col("c_ab") >= min_count)
        .join(ua, "a")
        .join(ub, "b")
        .select(
            F.concat(F.col("a"), F.lit(" "), F.col("b")).alias("bigram"),
            "c_ab",
            pmi.alias("pmi"),
        )
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("pmi"), F.asc("bigram"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= m)
        .select(F.col("rank").cast("long").alias("rank"), "bigram", "c_ab", "pmi")
    )
