"""Benchmark harness (driver contract).

Runs the headline workloads at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: {"metric", "value", "unit", "queries", "sf", ...extras}.

Headline workloads:
  * index_build   — full sharded compressed inverted-index build (phase 1
                    stats + phase 2 posting-block encode) over ``documents``
  * wand_topk     — block-max WAND top-k for the fixed query set on the
                    physical index (the per-query serving path)
  * df_batch_topk — batch BM25 via the queries-join-postings DataFrame plan
                    (the Q10 bulk path; one shuffle for all queries)

plus (as implemented) the training-data-pipeline operators: dedup,
similarity search, text analysis — each timed as its own entry.

``python bench.py --scaling`` additionally re-runs the index build at
local[8] vs local[32] (the sandbox stand-in for N vs 4N executors) and
reports throughput at both plus scaling efficiency; see BASELINE.md.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F


def _sf_from_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else 0.0


def _fresh_spark(master: str, cores: int):
    from neural_search_spark.session import get_spark

    return get_spark("neural-search-spark-bench", master=master, shuffle_partitions=cores)


def run_suite(spark, sf_dir: str, cores: int) -> dict[str, float]:
    """Run each headline workload once; return {name: seconds}."""
    from neural_search_spark.config import DEFAULT_LAYOUT, IndexLayout
    from neural_search_spark.index.build import build_index
    from neural_search_spark.plans.driver_entry import (
        _queries_df,
        q_bm25_topk_all,
    )
    from neural_search_spark.query.bm25_wand import bm25_topk_wand

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumn(
        "url", F.concat(F.lit("doc://"), F.col("doc_id"))
    )
    n_docs = docs.count()
    # size shards so the WAND stage parallelizes across cores at this SF
    # (at 10^12 docs the default 65536-doc shard span gives ~15M shards)
    span = max(64, n_docs // max(1, cores * 4))
    layout = IndexLayout(docs_per_shard=span, block_size=DEFAULT_LAYOUT.block_size)

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}
    out_dir = tempfile.mkdtemp(prefix="nss_bench_idx_")
    try:
        t0 = time.time()
        index = build_index(docs, out_dir, id_col="doc_id", layout=layout)
        timings["index_build"] = time.time() - t0
        extras["index_build_docs_per_sec"] = n_docs / timings["index_build"]

        queries = _queries_df(spark)
        t0 = time.time()
        n = bm25_topk_wand(index, queries, positive_only=False).count()
        timings["wand_topk"] = time.time() - t0
        assert n > 0

        t0 = time.time()
        n = q_bm25_topk_all(spark, sf_dir).count()
        timings["df_batch_topk"] = time.time() - t0
        assert n > 0

        # training-data pipeline operators (added incrementally; gate on import)
        try:
            from neural_search_spark.plans import pipeline_entry

            for name, fn in pipeline_entry.bench_queries().items():
                t0 = time.time()
                fn(spark, sf_dir).count()
                timings[name] = time.time() - t0
        except ImportError:
            pass
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
    timings.update({f"_{k}": v for k, v in extras.items()})
    return timings


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    scaling = "--scaling" in sys.argv

    spark = _fresh_spark(f"local[{cores}]", cores)
    timings = run_suite(spark, sf_dir, cores)
    extras = {k[1:]: v for k, v in timings.items() if k.startswith("_")}
    queries = {k: round(v, 3) for k, v in timings.items() if not k.startswith("_")}
    total = sum(queries.values())

    result = {
        "metric": "index-build + bm25-topk + pipeline ops wall time",
        "value": round(total, 3),
        "unit": "sec",
        "queries": queries,
        "sf": _sf_from_dir(sf_dir),
        "cores": cores,
        "docs_per_sec": round(extras.get("index_build_docs_per_sec", 0.0), 1),
    }

    if scaling:
        spark.stop()
        scale_points = {}
        for n in (8, 32):
            sp = _fresh_spark(f"local[{n}]", n)
            t = run_suite(sp, sf_dir, n)
            scale_points[n] = {k: round(v, 3) for k, v in t.items() if not k.startswith("_")}
            sp.stop()
        t8 = sum(scale_points[8].values())
        t32 = sum(scale_points[32].values())
        # efficiency = speedup achieved / core ratio
        result["scaling"] = {
            "local8_sec": round(t8, 3),
            "local32_sec": round(t32, 3),
            "speedup": round(t8 / t32, 3),
            "core_ratio": 4.0,
            "efficiency": round((t8 / t32) / 4.0, 3),
            "per_query": {str(k): v for k, v in scale_points.items()},
        }

    print(json.dumps(result))


if __name__ == "__main__":
    main()
