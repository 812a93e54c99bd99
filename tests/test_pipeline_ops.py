"""Unit tests for the training-data pipeline operators: dedup families,
similarity search, text analysis, multimodal plumbing.

Dedup tests use a corpus with *injected* duplicates (exact copies and
near-copies with small edits) so the interesting paths are exercised — the
driver testdata has no duplicate texts at all.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from neural_search_spark.functions import text_analysis as TA
from neural_search_spark.operators import dedup as DD
from neural_search_spark.operators import multimodal as MM
from neural_search_spark.operators import similarity as SIM


@pytest.fixture(scope="module")
def dup_corpus(spark):
    base = [
        "the quick brown fox jumps over the lazy dog near the river bank today",
        "a completely different document about spark sql window functions and joins",
        "neural search engines combine sparse and dense retrieval for better recall",
        "short doc",
    ]
    rows = []
    for i, t in enumerate(base):
        rows.append((i, t))
    rows.append((10, base[0]))  # exact dup of 0
    rows.append((11, base[0]))  # another exact dup of 0
    # near-dup of 0: one word changed
    rows.append((12, base[0].replace("lazy", "sleepy")))
    # near-dup of 2: word appended
    rows.append((13, base[2] + " indeed"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark, dup_corpus):
    groups = {r["rep_doc_id"]: r["n_docs"] for r in DD.exact_dedup_groups(dup_corpus).collect()}
    assert groups[0] == 3  # doc 0 + exact dups 10, 11
    assert groups[1] == 1
    deduped = DD.exact_dedup(dup_corpus)
    kept = {r["doc_id"] for r in deduped.collect()}
    assert 0 in kept and 10 not in kept and 11 not in kept
    assert 12 in kept  # near-dup is NOT an exact dup


def test_ngram_jaccard_finds_near_dups(spark, dup_corpus):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in DD.ngram_jaccard_pairs(dup_corpus, threshold=0.3).collect()
    }
    assert pairs[(0, 10)] == 1.0  # exact dups: jaccard 1
    assert pairs[(0, 12)] > 0.5  # one-word edit
    assert pairs[(2, 13)] > 0.5  # appended word
    assert (1, 2) not in pairs  # unrelated docs


def test_minhash_lsh_recall_on_near_dups(spark, dup_corpus):
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in DD.ngram_jaccard_pairs(dup_corpus, threshold=0.5).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in DD.minhash_lsh_pairs(dup_corpus, threshold=0.5).collect()
    }
    # LSH output is a subset of the exact pairs (precision 1 by construction:
    # candidates are verified with exact jaccard)...
    assert lsh <= exact
    # ...and at jaccard >= 0.5 with 4 bands x 3 rows recall should be total
    # on this tiny corpus (P[share a band] ~ 1 - (1 - j^3)^4 = 0.93 at j=0.8)
    assert (0, 10) in lsh and (0, 11) in lsh


def test_simhash_identical_and_near(spark, dup_corpus):
    fps = {r["doc_id"]: r["fp"] for r in DD.simhash_fingerprints(dup_corpus).collect()}
    assert fps[0] == fps[10] == fps[11]  # identical text -> identical fp
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in DD.simhash_pairs(dup_corpus, max_hamming=3).collect()
    }
    assert pairs[(0, 10)] == 0
    assert (1, 2) not in pairs


def test_simhash_banded_join_is_exact(spark, dup_corpus):
    """The 4-band join must find exactly the pairs a brute-force cross join
    finds at hamming <= 3 (pigeonhole guarantee)."""
    fps = DD.simhash_fingerprints(dup_corpus)
    a = fps.alias("a")
    b = fps.alias("b")
    brute = (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.fp").bitwiseXOR(F.col("b.fp"))).alias("hamming"),
        )
        .where(F.col("hamming") <= 3)
    )
    want = {(r["doc_a"], r["doc_b"], r["hamming"]) for r in brute.collect()}
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in DD.simhash_pairs(dup_corpus, max_hamming=3).collect()
    }
    assert got == want
    with pytest.raises(ValueError):
        DD.simhash_pairs(dup_corpus, max_hamming=4)


# --- similarity --------------------------------------------------------------


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


@pytest.fixture(scope="module")
def emb_queries(emb):
    return emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def test_cosine_topk_self_is_rank1(spark, emb, emb_queries):
    res = SIM.cosine_topk(emb, emb_queries, top_k=5)
    rank1 = {r["query_id"]: (r["vec_id"], r["score"]) for r in res.where("rank = 1").collect()}
    for qid, (vid, score) in rank1.items():
        assert vid == qid  # a vector's nearest neighbor is itself
        assert score == pytest.approx(1.0, abs=1e-9)


def test_cosine_topk_matches_numpy(spark, emb, emb_queries):
    import numpy as np

    rows = emb.orderBy("vec_id").collect()
    ids = [r["vec_id"] for r in rows]
    M = np.array([r["embedding"] for r in rows], dtype=np.float64)
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    got = SIM.cosine_topk(emb, emb_queries, top_k=10).collect()
    by_q: dict = {}
    for r in sorted(got, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append((r["vec_id"], r["score"]))
    for q in range(5):
        sims = M @ M[ids.index(q)]
        order = sorted(range(len(ids)), key=lambda i: (-sims[i], ids[i]))[:10]
        want = [(ids[i], sims[i]) for i in order]
        assert [v for v, _ in by_q[q]] == [v for v, _ in want]
        for (_, gs), (_, ws) in zip(by_q[q], want):
            assert gs == pytest.approx(ws, rel=1e-9)


def test_ann_lsh_recall_beats_random_sampling(spark, emb, emb_queries):
    n_planes, probe = 6, 2
    brute = {(r["query_id"], r["vec_id"]) for r in SIM.cosine_topk(emb, emb_queries, top_k=10).collect()}
    ann = {
        (r["query_id"], r["vec_id"])
        for r in SIM.ann_lsh_topk(
            emb, emb_queries, top_k=10, n_planes=n_planes, probe_hamming=probe
        ).collect()
    }
    recall = len(ann & brute) / len(brute)
    n_probes = 1 + n_planes + n_planes * (n_planes - 1) // 2
    probe_fraction = n_probes / 2**n_planes
    # the gate: better than scoring a random probe_fraction of the corpus
    assert recall >= min(1.0, 1.3 * probe_fraction), (recall, probe_fraction)


def test_cosine_pairs_symmetric_threshold(spark, emb):
    pairs = SIM.cosine_pairs(emb, threshold=0.3).collect()
    for r in pairs:
        assert r["id_a"] < r["id_b"]
        assert r["cosine"] >= 0.3


# --- text analysis -----------------------------------------------------------


def test_token_profile_basics(spark, dup_corpus):
    prof = {r["doc_id"]: r for r in TA.token_profile(dup_corpus).collect()}
    assert prof[3]["n_tokens"] == 2
    assert prof[3]["n_distinct"] == 2
    assert prof[0]["n_tokens"] == 14
    assert prof[0]["ttr"] == pytest.approx(prof[0]["n_distinct"] / 14)


def test_quality_score_bounds_and_signal(spark, dup_corpus):
    q = {r["doc_id"]: r["quality"] for r in TA.quality_score(dup_corpus).collect()}
    for v in q.values():
        assert 0.0 <= v <= 1.0
    # the stopword-rich English sentence outscores the 2-token fragment
    assert q[0] > q[3]


def test_lang_id_english_and_und(spark):
    df = spark.sparkContext.parallelize(
        [
            (0, "the cat and the dog went to the house in the morning"),
            (1, "der hund und die katze von dem haus mit den kindern"),
            (2, "zzz qqq xxx"),
        ]
    ).toDF(["doc_id", "text"])
    out = {r["doc_id"]: r["pred_lang"] for r in TA.lang_id(df).collect()}
    assert out[0] == "en"
    assert out[1] == "de"
    assert out[2] == "und"


def test_fingerprints_detect_shared_passages(spark, dup_corpus):
    fp = TA.doc_fingerprints(dup_corpus)
    by_doc: dict = {}
    for r in fp.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[0] == by_doc[10]  # identical docs: identical fingerprint set
    # near-dup still shares fingerprints with the original (a mid-document
    # edit invalidates every window covering the edited k-gram, so on a
    # 14-token doc only the prefix/suffix windows survive)
    inter = len(by_doc[0] & by_doc[12])
    union = len(by_doc[0] | by_doc[12])
    assert inter / union >= 0.25
    # unrelated docs share none
    assert not (by_doc[1] & by_doc[2])


# --- multimodal --------------------------------------------------------------


def test_media_plumbing_deterministic(spark, dup_corpus):
    media = MM.attach_fake_media(dup_corpus)
    a = {tuple(r) for r in MM.decode_media(media, decode_stub="fake").collect()}
    b = {tuple(r) for r in MM.decode_media(media, decode_stub="fake").collect()}
    assert a == b and len(a) == dup_corpus.count()
    stats = {r["doc_id"]: r for r in MM.media_stats(media).collect()}
    texts = {r["doc_id"]: r["text"] for r in dup_corpus.collect()}
    import hashlib

    for doc_id, text in texts.items():
        assert stats[doc_id]["byte_len"] == len(text.encode())
        assert stats[doc_id]["content_md5"] == hashlib.md5(text.encode()).hexdigest()


def test_media_decode_error_stub_marks_integration_point(spark, dup_corpus):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import PythonException

    media = MM.attach_fake_media(dup_corpus)
    with pytest.raises((PythonException, Py4JJavaError), match="NotImplementedError"):
        MM.decode_media(media, decode_stub="error").collect()


def test_frame_sample_plan(spark, dup_corpus):
    media = MM.attach_fake_media(dup_corpus)
    decoded = MM.decode_media(media, decode_stub="fake")
    frames = MM.frame_sample_plan(decoded, every_n=8)
    n_frames = {r["doc_id"]: r["n_frames"] for r in decoded.collect()}
    got: dict = {}
    for r in frames.collect():
        got.setdefault(r["doc_id"], []).append(r["frame_idx"])
    for doc_id, idxs in got.items():
        assert idxs == list(range(0, max(n_frames[doc_id] - 1, 0) + 1, 8))


def test_connected_components_hand_built(spark):
    """Chain, triangle, isolated pair: every node gets the min doc_id of its
    component, regardless of edge direction or discovery order."""
    pairs = spark.createDataFrame(
        # chain 1-2-3-4 (diameter 3), triangle 10-11-12, pair 20-21
        [(2, 1), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (21, 20)],
        "doc_a long, doc_b long",
    )
    got = {
        r["doc_id"]: r["component"]
        for r in DD.connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_dedup_components_groups_exact_dups(spark, dup_corpus):
    comp = {
        r["doc_id"]: r["component"]
        for r in DD.dedup_components(dup_corpus, threshold=0.5).collect()
    }
    # docs 0, 10, 11 (exact copies) and 12 (near-dup) form one cluster, rep 0
    assert comp[0] == comp[10] == comp[11] == comp[12] == 0
    # 2 and its near-dup 13 cluster with rep 2
    assert comp[2] == comp[13] == 2
    # unrelated docs are not members (no pair -> absent)
    assert 1 not in comp and 3 not in comp


def test_ann_ivf_recall_beats_sampling(spark, emb, emb_queries):
    n_clusters, n_probe = 16, 4
    brute = {
        (r["query_id"], r["vec_id"])
        for r in SIM.cosine_topk(emb, emb_queries, top_k=10).collect()
    }
    ann = {
        (r["query_id"], r["vec_id"])
        for r in SIM.ann_ivf_topk(
            emb, emb_queries, top_k=10, n_clusters=n_clusters, n_probe=n_probe
        ).collect()
    }
    recall = len(ann & brute) / len(brute)
    scan_fraction = n_probe / n_clusters
    assert recall >= min(1.0, 2.0 * scan_fraction), (recall, scan_fraction)


def test_ivf_exact_mode_matches_numpy_trainer(spark, emb, emb_queries):
    """The exact-fold trainer (driver-entry mode, SQL-mirrorable) and the
    production numpy-kernel trainer run the same Lloyd math with different
    summation orders — centroids must agree to float-accumulation noise and
    the pruned top-k must be (near-)identical."""
    import numpy as np

    C_np = SIM.train_ivf_centroids(emb, n_clusters=8, n_iters=3)
    C_ex = np.array(SIM.train_ivf_centroids_exact(emb, n_clusters=8, n_iters=3))
    assert C_ex.shape == C_np.shape
    assert np.allclose(C_ex, C_np, atol=1e-9), np.max(np.abs(C_ex - C_np))

    exact = {
        (r["query_id"], r["rank"], r["vec_id"])
        for r in SIM.ann_ivf_topk_exact(
            emb, emb_queries, top_k=10, n_clusters=8, n_iters=3, n_probe=3
        ).collect()
    }
    prod = {
        (r["query_id"], r["rank"], r["vec_id"])
        for r in SIM.ann_ivf_topk(
            emb,
            emb_queries,
            top_k=10,
            n_probe=3,
            ivf=SIM.build_ivf(emb, n_clusters=8, n_iters=3),
        ).collect()
    }
    # identical probes + identical assignment modulo 1-ulp boundary flips
    overlap = len(exact & prod) / max(len(prod), 1)
    assert overlap >= 0.9, (overlap, len(exact), len(prod))


def test_ivf_exact_is_rank1_self(spark, emb, emb_queries):
    res = SIM.ann_ivf_topk_exact(
        emb, emb_queries, top_k=5, n_clusters=8, n_iters=2, n_probe=3
    )
    for r in res.where("rank = 1").collect():
        assert r["vec_id"] == r["query_id"]
        assert abs(r["score"] - 1.0) < 1e-9


def test_near_dup_lsh_subset_of_brute_and_recall(spark):
    """LSH near-dup pairs must be a subset of the brute-force pairs with
    identical cosines (precision is exact — only recall is approximate), and
    recall on genuine near-duplicates (cosine >= 0.95) must clear 0.7."""
    import numpy as np

    rng = np.random.default_rng(11)
    rows = []
    for i in range(40):
        v = rng.standard_normal(32)
        rows.append((2 * i, v.tolist()))
        rows.append((2 * i + 1, (v + 0.12 * rng.standard_normal(32)).tolist()))  # near-dup
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    brute = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in SIM.cosine_pairs(emb, threshold=0.9).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in SIM.near_dup_pairs_lsh(
            emb, threshold=0.9, n_bands=4, n_planes=6, dim=32
        ).collect()
    }
    assert set(lsh) <= set(brute)
    for k, v in lsh.items():
        assert v == pytest.approx(brute[k], abs=1e-12)
    genuine = {k for k, v in brute.items() if v >= 0.95}
    if genuine:
        recall = len(set(lsh) & genuine) / len(genuine)
        assert recall >= 0.7, recall


def test_near_dup_lsh_bucket_cap(spark):
    """max_bucket_size drops pathological buckets; output stays a subset."""
    import numpy as np

    rng = np.random.default_rng(3)
    v = rng.standard_normal(16)
    rows = [(i, (v + 0.01 * rng.standard_normal(16)).tolist()) for i in range(12)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    full = {(r["id_a"], r["id_b"]) for r in SIM.near_dup_pairs_lsh(emb, 0.9, dim=16).collect()}
    capped = {
        (r["id_a"], r["id_b"])
        for r in SIM.near_dup_pairs_lsh(emb, 0.9, dim=16, max_bucket_size=4).collect()
    }
    assert capped <= full
    assert len(full) == 66  # 12-clone cluster: all C(12,2) pairs found
    assert len(capped) < len(full)  # every band-bucket holds all 12 -> dropped


def test_ivf_training_is_deterministic(spark, emb):
    import numpy as np

    a = SIM.train_ivf_centroids(emb, n_clusters=8, n_iters=3)
    b = SIM.train_ivf_centroids(emb, n_clusters=8, n_iters=3)
    assert np.allclose(a, b, atol=0)


def test_ivf_training_wide_vectors(spark):
    """Plan width is constant in dim (the kernel does the per-dimension work
    in numpy), so training at dim 1024 must work — the old per-dimension
    aggregate-expression form blew up codegen past a few hundred dims."""
    import numpy as np

    dim, n = 1024, 120
    rng = np.random.default_rng(7)
    rows = [(i, rng.standard_normal(dim).tolist()) for i in range(n)]
    emb_wide = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    C = SIM.train_ivf_centroids(emb_wide, n_clusters=8, n_iters=2)
    assert C.shape == (8, dim)
    assert np.allclose(np.linalg.norm(C, axis=1), 1.0)
    # assignment covers every vector exactly once
    ivf = SIM.build_ivf(emb_wide, n_clusters=8, n_iters=2)
    assert ivf.assigned.count() == n
    assert ivf.assigned.select("vec_id").distinct().count() == n


def test_ivf_index_reuse_matches_fresh(spark, emb, emb_queries):
    """ann_ivf_topk(ivf=...) (persisted assignment, no retrain) returns the
    identical result to the train-per-call path."""
    ivf = SIM.build_ivf(emb, n_clusters=16, n_iters=5)
    fresh = SIM.ann_ivf_topk(emb, emb_queries, top_k=10, n_clusters=16, n_probe=4)
    reused = SIM.ann_ivf_topk(emb, emb_queries, top_k=10, n_probe=4, ivf=ivf)
    assert sorted(map(tuple, fresh.collect())) == sorted(map(tuple, reused.collect()))


def test_minhash_band_size_cap(spark):
    """max_band_size drops pathological boilerplate band-keys: a 6-copy
    cluster's quadratic pair-set shrinks under the cap, genuine 2-doc pairs
    survive, and the uncapped run is always a superset."""
    rows = [(i, "identical boilerplate page content repeated everywhere exactly") for i in range(6)]
    rows += [(10, "a distinct real document about spark window functions and joins"),
             (11, "a distinct real document about spark window functions and joins here")]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")

    full = {(r["doc_a"], r["doc_b"]) for r in DD.minhash_lsh_pairs(corpus, threshold=0.5).collect()}
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in DD.minhash_lsh_pairs(corpus, threshold=0.5, max_band_size=3).collect()
    }
    assert capped <= full
    assert (10, 11) in capped  # the genuine near-dup pair survives the cap
    # the 6-clone cluster's 15 pairs are dropped (every band is pathological)
    assert not any(a < 6 and b < 6 for a, b in capped)
    assert sum(1 for a, b in full if a < 6 and b < 6) == 15


def test_repetition_profile_signals(spark):
    df = spark.createDataFrame(
        [(0, "spam spam spam spam spam spam"),
         (1, "all words here are fully distinct tokens"),
         (2, "x")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in TA.repetition_profile(df).collect()}
    assert got[0]["dup_token_ratio"] == pytest.approx(5 / 6)
    assert got[0]["top_bigram_share"] == 1.0  # every bigram is 'spam spam'
    assert got[1]["dup_token_ratio"] == 0.0
    assert got[2]["top_bigram_share"] == 0.0  # no bigrams in a 1-token doc


def test_repetition_profile_long_doc_linear(spark):
    """The top-bigram pass is O(L log L) per doc (sorted run-length), so a
    web-page-sized document must complete in bounded time — the old
    distinct-rescan form was O(L^2) and would burn ~10^9 comparisons here."""
    import time

    # 60k tokens, vocabulary of 37 -> heavy repetition, worst case for the
    # old quadratic rescan (many distinct bigrams x long array)
    words = " ".join(f"w{i % 37}" for i in range(60_000))
    df = spark.createDataFrame([(0, words)], "doc_id long, text string")
    t0 = time.time()
    row = TA.repetition_profile(df).collect()[0]
    elapsed = time.time() - t0
    assert elapsed < 30, f"long-doc repetition took {elapsed:.1f}s — not linear"
    # every (w_i, w_{i+1}) bigram repeats ~once per 37-token cycle
    assert row["dup_token_ratio"] == pytest.approx((60_000 - 37) / 60_000)
    assert row["top_bigram_share"] == pytest.approx(1 / 37, rel=1e-2)


def test_strip_boilerplate_lines(spark):
    """C4/MassiveText-style line removal: lines recurring in >= min_docs
    documents vanish; unique lines survive in original order."""
    boiler = "accept our cookie policy"
    rows = [
        (0, f"unique intro zero\n{boiler}\nunique body zero"),
        (1, f"{boiler}\nunique body one"),
        (2, f"unique body two\n  {boiler}  "),  # trim-normalized match
        (3, "all unique here\nno shared lines"),
        (4, f"{boiler}"),  # nothing but boilerplate -> empty clean_text
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    counts = {r["line"]: r["n_docs"] for r in TA.line_doc_counts(df).collect()}
    assert counts[boiler] == 4  # one count per doc, not per occurrence
    out = {r["doc_id"]: r for r in TA.strip_boilerplate_lines(df, min_docs=3).collect()}
    assert out[0]["clean_text"] == "unique intro zero\nunique body zero"
    assert (out[0]["n_lines"], out[0]["n_kept"]) == (3, 2)
    assert out[1]["clean_text"] == "unique body one"
    assert out[2]["clean_text"] == "unique body two"
    assert out[3]["clean_text"] == rows[3][1] and out[3]["n_kept"] == 2
    assert out[4]["clean_text"] == "" and out[4]["n_kept"] == 0


def test_benchmark_contamination(spark):
    """GPT-3-style n-gram decontamination: train docs sharing a word k-gram
    with the eval set are flagged; clean docs are not."""
    bench = spark.createDataFrame(
        [(100, "the capital of france is paris everyone knows")],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [
            (0, "trivia page the capital of france is paris obviously leaked"),
            (1, "completely unrelated text about spark shuffle partitions"),
            (2, "of france is paris tail overlap only"),  # one shared 4-gram chain
        ],
        "doc_id long, text string",
    )
    hits = {r["doc_id"]: r["n_hits"] for r in
            DD.benchmark_contamination(train, bench, k=4).collect()}
    assert 0 in hits and 2 in hits and 1 not in hits
    assert hits[0] == 3  # 'the capital of france', 'capital of france is', 'of france is paris'
    assert hits[2] == 1  # 'of france is paris'


def test_bigram_lm_xent_orders_fluency(spark):
    """Templated/repetitive text scores lower cross-entropy than
    unique-vocabulary noise under the self-trained bigram LM; short docs
    (< 2 tokens) are excluded; n_bigrams = n_tokens - 1."""
    rows = [
        (0, "the cat sat on the mat " * 20),          # repetitive, fluent
        (1, "the cat sat on the mat " * 20),          # identical twin
        (2, " ".join(f"zz{i:03d}" for i in range(120))),  # all-unique noise
        (3, "solo"),                                  # 1 token -> excluded
        (4, ""),                                      # 0 tokens -> excluded
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in TA.bigram_lm_xent(docs).collect()}
    assert set(out) == {0, 1, 2}
    assert out[0]["xent"] == out[1]["xent"]  # deterministic, content-only
    assert out[0]["xent"] < out[2]["xent"]   # repetition -> low xent
    assert out[0]["n_bigrams"] == 6 * 20 - 1
    assert out[2]["n_bigrams"] == 119
    for r in out.values():
        assert r["xent"] > 0


def test_dedup_lines_within_doc(spark):
    rows = [
        (0, "alpha\nbeta\nalpha\ngamma\nbeta"),  # 2 dup lines dropped
        (1, "one line only"),
        (2, "x\nx\nx\nx"),                        # collapses to a single line
        (3, "a\n\nb\n\nc"),                       # duplicate blanks collapse too
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in TA.dedup_lines_within_doc(docs).collect()}
    assert out[0]["clean_text"] == "alpha\nbeta\ngamma"
    assert (out[0]["n_lines"], out[0]["n_kept"]) == (5, 3)
    assert out[1]["clean_text"] == "one line only"
    assert out[2]["clean_text"] == "x"
    assert (out[2]["n_lines"], out[2]["n_kept"]) == (4, 1)
    assert out[3]["clean_text"] == "a\n\nb\nc"


def test_strip_duplicated_spans(spark):
    from neural_search_spark.operators.spans import (
        duplicated_span_starts,
        strip_duplicated_spans,
    )

    rows = [
        (0, "alpha beta gamma delta unique zero text here"),
        (1, "other words alpha beta gamma delta more stuff"),
        (2, "totally different content with nothing shared"),
        (3, "short doc"),
        (4, "alpha beta gamma delta"),
        (5, "x y alpha beta gamma delta z alpha beta gamma delta w"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: (r.n_tokens, r.n_removed, r.clean_text)
        for r in strip_duplicated_spans(docs, k=3).collect()
    }
    # every doc keeps a row, even untouched or fully-covered ones
    assert set(out) == {0, 1, 2, 3, 4, 5}
    # "alpha beta gamma delta" recurs across docs: both 3-windows inside it
    # are duplicated, so all 4 tokens go wherever the span appears
    assert out[0] == (8, 4, "unique zero text here")
    assert out[1] == (8, 4, "other words more stuff")
    assert out[2] == (6, 0, rows[2][1])  # unique doc untouched
    assert out[3] == (2, 0, "short doc")  # shorter than k: no windows
    assert out[4] == (4, 4, "")  # fully covered -> empty, row kept
    assert out[5] == (12, 8, "x y z w")  # two occurrences both removed
    # the dup-start table only lists windows recurring across >= 2 docs
    starts = duplicated_span_starts(docs, k=3).collect()
    assert all(r.doc_id in {0, 1, 4, 5} for r in starts)


def test_strip_duplicated_spans_min_docs_threshold(spark):
    from neural_search_spark.operators.spans import strip_duplicated_spans

    rows = [
        (0, "p q r s t"),
        (1, "p q r s t"),
        (2, "p q r s t"),
        (3, "solo text lives here fine"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # threshold above the duplicate count: nothing is removed
    out = {r.doc_id: r.n_removed for r in strip_duplicated_spans(docs, 3, min_docs=4).collect()}
    assert out == {0: 0, 1: 0, 2: 0, 3: 0}
    out = {r.doc_id: r.n_removed for r in strip_duplicated_spans(docs, 3, min_docs=3).collect()}
    assert out == {0: 5, 1: 5, 2: 5, 3: 0}


def test_span_fingerprint_plan_shapes(spark):
    from neural_search_spark.operators.spans import strip_duplicated_spans

    docs = spark.createDataFrame(
        [(i, f"w{i} common tail words everywhere here now") for i in range(20)],
        "doc_id long, text string",
    )
    plan = (
        strip_duplicated_spans(docs, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # distinct-doc count per fingerprint must partially aggregate map-side,
    # and nothing in the pipeline may degenerate to a cartesian product
    assert "partial_count" in plan or "HashAggregate" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pipeline_clean_every_stage_is_nonvacuous(spark):
    """The composed cleaning entry must show EACH stage doing real work on
    the driver testdata: clones dropped by the final dedup, boilerplate
    lines gone, PII redacted, and the quality/lang gate cutting docs."""
    from neural_search_spark.plans.pipeline_entry import (
        _PC_CLONE_OFF,
        _docs_dirty,
        q_pipeline_clean,
    )

    sf_dir = "/root/testdata/sf0.001"
    dirty_n = _docs_dirty(spark, sf_dir).count()
    out = q_pipeline_clean(spark, sf_dir)
    rows = out.collect()
    ids = {r["doc_id"] for r in rows}
    # stage 5: every clone cleans to its original's bytes -> all dropped
    assert all(d < _PC_CLONE_OFF for d in ids), "clones must dedup away"
    # gate: some docs are cut (clones + any und/low-quality docs)
    assert 0 < len(rows) < dirty_n
    # stage 1: no boilerplate line survives AS A LINE (a doc whose last line
    # is boilerplate + an appended PII suffix keeps that composite line —
    # it's a distinct df=1 string, by construction on both engines)
    bp = "please accept our cookie policy to continue"
    assert not any(
        l == bp for r in rows for l in r["clean_text"].split("\n")
    )
    assert any(r["doc_id"] % 5 == 0 for r in rows), "mod-5 docs survive minus the line"
    # stage 3: at least one doc had PII redacted, and no raw email survives
    assert any(r["n_pii"] > 0 for r in rows)
    assert not any("@example.com" in r["clean_text"] for r in rows)
    assert any("<EMAIL>" in r["clean_text"] for r in rows if r["n_pii"])
    # stage 2: the mod-3 self-duplicate line is gone for a clean mod-3 doc
    # (pick one with no PII suffix so the dup line was byte-identical)
    cand = [
        r for r in rows
        if r["doc_id"] % 3 == 0 and r["doc_id"] % 6 != 0
        and r["doc_id"] % 9 != 0 and r["doc_id"] % 13 != 0
    ]
    assert cand, "need a PII-free mod-3 doc"
    for r in cand:
        lines = r["clean_text"].split("\n")
        assert len(lines) == len(set(lines)), r["doc_id"]


def test_ann_sq8_recall_and_codes(spark, emb, emb_queries):
    """int8 scalar quantization on ~real embeddings: (a) the two-stage search
    recovers (nearly) the brute top-10 — rescore makes stage-1 error survivable
    only below the candidate cut; (b) codes are valid int8 and dequantize back
    within half a quantization step."""
    brute = {
        (r["query_id"], r["vec_id"])
        for r in SIM.cosine_topk(emb, emb_queries, top_k=10).collect()
    }
    sq8 = {
        (r["query_id"], r["vec_id"])
        for r in SIM.ann_sq8_topk(emb, emb_queries, top_k=10, candidates=40).collect()
    }
    recall = len(sq8 & brute) / len(brute)
    assert recall >= 0.95, recall

    qz = SIM.quantize_sq8(emb).collect()
    full = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    for r in qz[:50]:
        assert all(-127 <= c <= 127 for c in r["q8"])
        v = full[r["vec_id"]]
        if r["scale"] == 0:
            assert all(c == 0 for c in r["q8"])
            continue
        step = r["scale"] / 127.0
        for c, x in zip(r["q8"], v):
            assert abs(c * step - x) <= step / 2 + 1e-12


def test_collocations_pmi_ranks_bound_pairs_first(spark):
    """A pair that ONLY occurs together ('los angeles') must out-PMI a pair of
    frequent words that co-occur incidentally, regardless of raw counts."""
    from neural_search_spark.functions.text_analysis import collocations

    rows = []
    for i in range(30):
        rows.append((i, "visit los angeles today"))          # bound pair, c=30
    for i in range(30, 90):
        rows.append((i, "the data the data the system"))     # frequent, loose
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = collocations(docs, min_count=5, m=10).collect()
    by_bigram = {r["bigram"]: (r["rank"], r["c_ab"], r["pmi"]) for r in got}
    assert "los angeles" in by_bigram
    assert by_bigram["los angeles"][1] == 30
    la_rank = by_bigram["los angeles"][0]
    for bg in ("the data", "data the"):
        if bg in by_bigram:
            assert la_rank < by_bigram[bg][0]
            assert by_bigram["los angeles"][2] > by_bigram[bg][2]


def test_ann_sq8_prequantized_identical(spark, emb, emb_queries):
    """Passing a materialized quantize_sq8 table (the at-rest layout) must
    give exactly the inline-derivation result."""
    inline = SIM.ann_sq8_topk(emb, emb_queries, top_k=10, candidates=40).collect()
    pre = SIM.quantize_sq8(emb).persist()
    via_table = SIM.ann_sq8_topk(
        emb, emb_queries, top_k=10, candidates=40, quantized=pre
    ).collect()
    assert sorted(map(tuple, via_table)) == sorted(map(tuple, inline))


def test_collocations_tolerates_empty_and_short_docs(spark):
    """Docs with < 2 tokens (incl. empty text) must not crash the bigram
    transform (slice() rejects negative lengths) nor perturb the counts."""
    from neural_search_spark.functions.text_analysis import collocations

    base = [(i, "visit los angeles today") for i in range(10)]
    with_empties = base + [(100, ""), (101, "   "), (102, "single")]
    got_a = {r["bigram"]: r["c_ab"] for r in collocations(
        spark.createDataFrame(base, "doc_id long, text string"), min_count=2).collect()}
    got_b = {r["bigram"]: r["c_ab"] for r in collocations(
        spark.createDataFrame(with_empties, "doc_id long, text string"), min_count=2).collect()}
    assert got_a == got_b
    assert got_a["los angeles"] == 10
