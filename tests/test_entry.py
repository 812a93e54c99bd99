"""Replicates the driver's correctness gate locally: every queries() entry is
compared to its oracle_sql() via DuckDB at sf0.01 (row count, column names,
order-insensitive values)."""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _normalize(rows, cols):
    out = []
    for row in rows:
        vals = []
        for c in sorted(cols):
            v = row[c]
            if isinstance(v, float):
                v = round(v, 9)
                if v == -0.0:
                    v = 0.0
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


@pytest.mark.parametrize("name", sorted(entry_mod.queries().keys()))
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql().get(name)
    sdf = q(spark, SF_DIR)
    srows = [r.asDict() for r in sdf.collect()]
    if sql is None:
        assert len(srows) >= 0  # rows-only check
        return
    odf = duck.execute(sql).fetchdf()
    ocols = list(odf.columns)
    scols = sdf.columns
    assert sorted(scols) == sorted(ocols), f"{name}: columns {scols} vs {ocols}"
    orows = odf.to_dict("records")
    assert len(srows) == len(orows), f"{name}: rowcount {len(srows)} vs {len(orows)}"
    sn, on = _normalize(srows, scols), _normalize(orows, ocols)
    for a, b in zip(sn, on):
        for x, y in zip(a, b):
            if isinstance(x, float) and isinstance(y, float):
                assert math.isclose(x, y, rel_tol=1e-7, abs_tol=1e-9), f"{name}: {a} vs {b}"
            else:
                assert x == y, f"{name}: {a} vs {b}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"query_id", "rank", "doc_id", "score"}
