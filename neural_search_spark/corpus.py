"""Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1).

Schema matches the BASELINE.json input_hint exactly:
    (url string, warc_ts timestamp, html binary, text string, lang string)

Generation is fully seeded (numpy default_rng(seed)); two calls with the same
(n_docs, seed) produce byte-identical tables — no wall clock, no external data.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

VOCAB_SIZE = 2000
_SPECIAL_WORDS = ["Müller", "naïve", "foo_bar", "42nd", "Hello,World!", "ÉCOLE", "東京"]
_EPOCH = dt.datetime(2026, 1, 1, tzinfo=dt.timezone.utc)


def _vocab() -> list[str]:
    return [f"w{i:04d}" for i in range(VOCAB_SIZE)]


def make_corpus_pdf(n_docs: int = 1000, seed: int = 42) -> pd.DataFrame:
    """Zipf-sampled corpus with tokenizer-parity landmines injected."""
    rng = np.random.default_rng(seed)
    vocab = np.array(_vocab())

    # Zipf(a=1.3) ranks clipped to vocab; rank 1 -> vocab[0] (the head term).
    lengths = rng.integers(20, 401, size=n_docs)
    texts: list[str] = []
    for i in range(n_docs):
        ranks = np.minimum(rng.zipf(1.3, size=lengths[i]), VOCAB_SIZE) - 1
        words = list(vocab[ranks])
        # Head term in >=60% of docs => df > N/2 => negative raw idf =>
        # exercises the epsilon-floor path (FIXTURES.md §1).
        if i % 10 < 6 and vocab[0] not in words:
            words[0] = vocab[0]
        # ~5% of docs get mixed-case/punct/digit/underscore/non-ASCII words
        # to exercise tokenizer parity.
        if i % 20 == 0:
            k = int(rng.integers(1, 4))
            for j in range(k):
                pos = int(rng.integers(0, len(words)))
                words[pos] = _SPECIAL_WORDS[(i + j) % len(_SPECIAL_WORDS)]
        texts.append(" ".join(words))

    urls = [f"https://site{i % 97}.example/page/{i:08d}" for i in range(n_docs)]
    warc_ts = [_EPOCH + dt.timedelta(seconds=i) for i in range(n_docs)]
    html = [
        b"<html><head><title>T%d</title></head><body><p>" % i
        + texts[i].encode("utf-8")
        + b"</p></body></html>"
        for i in range(n_docs)
    ]
    langs = []
    other = ["de", "fr", "es"]
    for i in range(n_docs):
        langs.append("en" if i % 10 != 9 else other[(i // 10) % 3])

    return pd.DataFrame(
        {"url": urls, "warc_ts": warc_ts, "html": html, "text": texts, "lang": langs}
    )


def corpus_df(spark, n_docs: int = 1000, seed: int = 42):
    """Synthetic corpus as a Spark DataFrame (input_hint schema)."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), False),
            T.StructField("html", T.BinaryType(), False),
            T.StructField("text", T.StringType(), False),
            T.StructField("lang", T.StringType(), False),
        ]
    )
    return spark.createDataFrame(make_corpus_pdf(n_docs, seed), schema=schema)


def write_corpus_parquet(spark, path: str, n_docs: int, seed: int = 42, partitions: int = 8) -> None:
    corpus_df(spark, n_docs, seed).repartition(partitions, "url").write.mode(
        "overwrite"
    ).parquet(path)


# --- Reference query set (FIXTURES.md §2) ------------------------------------
# Fixed verbatim so reruns are identical. Covers: frequent terms, rare terms,
# unknown terms (contribute 0), repeated terms (per-occurrence scoring),
# mixed-case/punctuation (tokenizer parity), and a no-match query.

REFERENCE_QUERIES: list[tuple[int, str, int]] = [
    (0, "w0000 w0001", 10),
    (1, "w0001 w0002 w0003", 10),
    (2, "w0005 w0010 w0020 w0100", 10),
    (3, "w1999", 10),  # rare tail term
    (4, "w1500 w1750", 10),
    (5, "zzz_not_in_corpus", 10),  # unknown term -> empty
    (6, "w0000 zzz_not_in_corpus", 10),  # known + unknown mix
    (7, "w0002 w0002", 10),  # repeated term, per-occurrence
    (8, "W0000 W0001", 10),  # uppercase -> lowered
    (9, "w0003, w0004!", 10),  # punctuation stripped by \\w+
    (10, "foo_bar", 10),  # underscore token
    (11, "42nd", 10),  # digit-leading token
    (12, "müller", 10),  # non-ASCII \\w
    (13, "naïve", 10),
    (14, "hello,world!", 10),  # splits into two tokens
    (15, "w0000", 1),  # k=1 bound
    (16, "w0000 w0001 w0002", 100),  # k=100 bound
    (17, "w0007 w0008 w0009", 10),
    (18, "w0050 w0150 w0250", 10),
    (19, "w0000 w0000 w0001", 10),  # repeat + distinct
    (20, "w0012 w0345", 10),
    (21, "w0666 w0777 w0888", 10),
    (22, "the quick brown fox", 10),  # all unknown -> empty
    (23, "w0004 w0040 w0400", 10),
    (24, "東京 w0001", 10),  # CJK \\w token + known term
]


def queries_pdf() -> pd.DataFrame:
    return pd.DataFrame(
        [{"query_id": q, "query_text": t, "top_k": k} for q, t, k in REFERENCE_QUERIES]
    )


def queries_df(spark):
    return spark.createDataFrame(queries_pdf())


def write_scale_corpus(
    spark, path: str, n_docs: int, seed: int = 42, partitions: int = 64
) -> None:
    """Distributed deterministic corpus generator for scaling benchmarks.

    ``make_corpus_pdf`` builds the corpus on the driver (fine for test
    fixtures, a non-starter past ~100k docs); this generates per-partition
    with an rng seeded by (seed, partition_id) over ``spark.range``'s
    deterministic contiguous id ranges — the same (n_docs, seed, partitions)
    triple produces identical rows on any cluster size. Schema matches the
    input_hint corpus; ``html`` is left empty (the build never reads it, and
    the point of this corpus is to feed the tokenize/index path, not the
    extraction invariant — that is make_corpus_pdf's job).
    """
    import numpy as np

    base = spark.range(0, n_docs, 1, partitions)

    def kernel(batches):
        from pyspark import TaskContext

        rng = np.random.default_rng((seed, TaskContext.get().partitionId()))
        vocab = np.array(_vocab())
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            lengths = rng.integers(20, 401, size=len(ids))
            ranks = np.minimum(rng.zipf(1.3, size=int(lengths.sum())), VOCAB_SIZE) - 1
            words = vocab[ranks]
            texts = []
            off = 0
            for ln in lengths:
                texts.append(" ".join(words[off : off + ln]))
                off += int(ln)
            langs = [
                "en" if int(i) % 10 != 9 else ["de", "fr", "es"][(int(i) // 10) % 3]
                for i in ids
            ]
            yield pd.DataFrame(
                {
                    "url": [f"https://site{int(i) % 97}.example/page/{int(i):09d}" for i in ids],
                    "warc_ts": pd.Timestamp("2024-01-01") + pd.to_timedelta(ids, unit="s"),
                    "html": [b""] * len(ids),
                    "text": texts,
                    "lang": langs,
                }
            )

    schema = "url string, warc_ts timestamp, html binary, text string, lang string"
    base.mapInPandas(kernel, schema=schema).write.mode("overwrite").parquet(path)
