from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neural_search_spark.corpus import corpus_df, make_corpus_pdf  # noqa: E402
from neural_search_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    s = get_spark("neural-search-spark-tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_pdf_small():
    """200-doc deterministic synthetic corpus (pandas)."""
    return make_corpus_pdf(n_docs=200, seed=42)


@pytest.fixture(scope="session")
def corpus_small(spark):
    df = corpus_df(spark, n_docs=200, seed=42)
    df = df.repartition(8, "url")
    df.persist()
    df.count()
    return df
