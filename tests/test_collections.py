"""Named-collection catalog (index/collections.py) — mirrors the behaviors the
reference pins in tests/test_api/test_collections.py (create / duplicate-create
error / exists / list / stats / delete / missing-collection error), expressed
over index roots."""

from __future__ import annotations

import json
import subprocess
import sys

import pytest

from neural_search_spark.config import IndexLayout
from neural_search_spark.corpus import write_corpus_parquet
from neural_search_spark.index.build import build_index
from neural_search_spark.index.collections import CollectionCatalog
from neural_search_spark.index.docmap import assign_doc_ids


@pytest.fixture(scope="module")
def catalog(spark, tmp_path_factory):
    """A base dir with one BUILT collection ('web') and one reserved ('empty')."""
    root = tmp_path_factory.mktemp("collections")
    cat = CollectionCatalog(str(root / "base"))
    corpus_path = str(root / "corpus")
    write_corpus_parquet(spark, corpus_path, n_docs=150)
    corpus = assign_doc_ids(spark.read.parquet(corpus_path))
    cat_path = cat.create("web")
    build_index(
        corpus, cat_path, id_col="doc_id",
        layout=IndexLayout(docs_per_shard=64, block_size=16), n_buckets=4,
    )
    cat.create("empty")
    return cat


def test_create_exists_built(catalog):
    assert catalog.exists("web") and catalog.is_built("web")
    assert catalog.exists("empty") and not catalog.is_built("empty")
    assert not catalog.exists("nope")


def test_duplicate_create_raises(catalog):
    with pytest.raises(ValueError, match="already exists"):
        catalog.create("web")


@pytest.mark.parametrize("bad", ["", "../up", "a/b", "a\\b", ".", "x" * 200])
def test_invalid_names_rejected(catalog, bad):
    with pytest.raises(ValueError, match="invalid collection name"):
        catalog.path(bad)


def test_list_sorted(catalog):
    assert catalog.list() == ["empty", "web"]


def test_stats_built_and_reserved(catalog):
    s = catalog.stats("web")
    assert s["built"] and s["n_docs"] == 150 and s["vocabulary"] > 0
    assert s["n_shards"] >= 2 and s["postings_bytes"] > 0 and s["snapshot"]
    assert catalog.stats("empty") == {"name": "empty", "built": False}
    with pytest.raises(KeyError, match="does not exist"):
        catalog.stats("nope")


def test_delete_roundtrip(catalog):
    catalog.create("tmp")
    assert catalog.delete("tmp") is True
    assert catalog.delete("tmp") is False  # reference: boolean, not error


def test_cli_collections(catalog):
    """The CLI verbs over the same base: list shows stats lines; exists and
    delete round-trip; a missing name is an error line + exit 1."""
    def run(*argv):
        return subprocess.run(
            [sys.executable, "-m", "neural_search_spark.cli", "collections",
             *argv, "--base", catalog.base],
            capture_output=True, text=True, timeout=60, cwd="/root/repo",
        )

    p = run("list")
    assert p.returncode == 0, p.stderr
    rows = [json.loads(l) for l in p.stdout.strip().splitlines()]
    assert [r["name"] for r in rows] == ["empty", "web"]
    assert rows[1]["n_docs"] == 150

    p = run("exists", "--name", "web")
    assert json.loads(p.stdout)["built"] is True

    p = run("stats", "--name", "nope")
    assert p.returncode == 1 and "does not exist" in json.loads(p.stdout)["error"]

    p = run("create", "--name", "viacli")
    assert p.returncode == 0 and catalog.exists("viacli")
    p = run("delete", "--name", "viacli")
    assert json.loads(p.stdout)["deleted"] is True
