"""Named-collection catalog over index roots.

Reference parity: the vector-store collection surface —
``/root/reference/src/neural_search/storage/vector_store.py:15-77`` and
``/root/reference/src/neural_search/storage/faiss_store.py:61-111``
(create_collection / delete_collection / list_collections /
collection_exists / get_collection_stats over NAMED collections). In this
engine a collection is a built index directory under one base path; the
catalog is pure filesystem + parquet-footer metadata, so it needs no Spark
session and works identically on the cluster driver and a serving replica.

Scale note: every call here touches only per-collection metadata files
(``corpus_stats`` one row, ``_metrics`` one row per shard-wave, the
checkpoint manifest) — never posting data — so the catalog stays O(#collections)
regardless of corpus size.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import shutil
from dataclasses import dataclass

_NAME_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9._-]{0,127}$")


def _check_name(name: str) -> str:
    """Collection names are path-safe slugs; anything else (separators,
    traversal, empty) is a caller error — mirrors the reference's implicit
    contract where names become store keys."""
    if not isinstance(name, str) or not _NAME_RE.match(name):
        raise ValueError(
            f"invalid collection name {name!r}: expected "
            "[A-Za-z0-9][A-Za-z0-9._-]{0,127}"
        )
    return name


@dataclass(frozen=True)
class CollectionCatalog:
    """Catalog of named index collections under ``base``.

    ``create`` reserves the name (empty directory — the analog of the
    reference's create_collection before any upsert); ``build_index`` /
    ``add_documents`` pointed at ``path(name)`` make it *built* (the
    ``_checkpoint.json`` atomic rename is the commit point this catalog
    trusts, same as IndexReader.refresh).
    """

    base: str

    # -- paths ---------------------------------------------------------------

    def path(self, name: str) -> str:
        return os.path.join(self.base, _check_name(name))

    # -- lifecycle -----------------------------------------------------------

    def create(self, name: str) -> str:
        """Reserve ``name``; error if it already exists (reference
        vector_store.create_collection raises on duplicates)."""
        p = self.path(name)
        if os.path.exists(p):
            raise ValueError(f"collection {name!r} already exists")
        os.makedirs(p)
        return p

    def exists(self, name: str) -> bool:
        return os.path.isdir(self.path(name))

    def is_built(self, name: str) -> bool:
        """True once an index build/maintenance commit landed."""
        return os.path.exists(os.path.join(self.path(name), "_checkpoint.json"))

    def delete(self, name: str) -> bool:
        """Drop the collection (returns False if absent, like the
        reference's delete_collection boolean)."""
        p = self.path(name)
        if not os.path.isdir(p):
            return False
        shutil.rmtree(p)
        return True

    # -- introspection --------------------------------------------------------

    def list(self) -> list[str]:
        """Sorted names of all collections (built or reserved)."""
        if not os.path.isdir(self.base):
            return []
        return sorted(
            n
            for n in os.listdir(self.base)
            if _NAME_RE.match(n) and os.path.isdir(os.path.join(self.base, n))
        )

    def stats(self, name: str) -> dict:
        """One stats dict per collection — the get_collection_stats analog.

        Built collections report corpus stats + physical layout from the
        index's own metadata tables; reserved-but-unbuilt ones report
        ``{"built": False}`` so callers can distinguish "empty" from
        "missing" (missing raises KeyError, as the reference raises its
        CollectionNotFound)."""
        import pyarrow.parquet as pq

        p = self.path(name)
        if not os.path.isdir(p):
            raise KeyError(f"collection {name!r} does not exist")
        if not self.is_built(name):
            return {"name": name, "built": False}
        srow = pq.read_table(os.path.join(p, "corpus_stats")).to_pylist()[0]
        out = {
            "name": name,
            "built": True,
            "n_docs": int(srow["n_docs"]),
            "avgdl": round(float(srow["avgdl"]), 4),
            "vocabulary": pq.read_table(
                os.path.join(p, "term_stats"), columns=["term"]
            ).num_rows,
            "analyzer": srow.get("analyzer", "standard"),
        }
        with open(os.path.join(p, "_checkpoint.json"), "rb") as f:
            out["snapshot"] = hashlib.md5(f.read()).hexdigest()
        try:
            m = pq.read_table(os.path.join(p, "_metrics")).to_pylist()
            out["n_shards"] = len({r["shard"] for r in m})
            out["postings_bytes"] = int(
                sum(r["deltas_bytes"] + r["tfs_bytes"] for r in m)
            )
        except Exception:  # noqa: BLE001 — metrics are best-effort extras
            pass
        return out

    def stats_all(self) -> list[dict]:
        return [self.stats(n) for n in self.list()]


def main_lines(catalog: CollectionCatalog, verb: str, name: str | None) -> list[str]:
    """CLI body shared with ``cli.py collections``: one JSON line per result."""
    if verb == "list":
        return [json.dumps(s) for s in catalog.stats_all()]
    if name is None:
        raise ValueError(f"collections {verb} requires --name")
    if verb == "create":
        return [json.dumps({"created": name, "path": catalog.create(name)})]
    if verb == "exists":
        return [
            json.dumps(
                {
                    "name": name,
                    "exists": catalog.exists(name),
                    "built": catalog.is_built(name),
                }
            )
        ]
    if verb == "stats":
        return [json.dumps(catalog.stats(name))]
    if verb == "delete":
        return [json.dumps({"deleted": catalog.delete(name), "name": name})]
    raise ValueError(f"unknown collections verb {verb!r}")
