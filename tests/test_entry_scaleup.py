"""Opt-in scale-up sweep: the driver-faithful oracle comparison of
``tests/test_entry.py``, re-run at sf0.1 — 10x the scale the driver gate
verifies at — over EVERY fully-oracled entry (rows-only entries skip: there
is no value oracle to scale up).

Skipped unless ``NSS_SWEEP_SF_DIR`` is set (the default suite already runs
all 101 entries at sf0.01; this exists to evidence that correctness holds
one decade up, not to slow the gate):

    NSS_SWEEP_SF_DIR=/root/testdata/sf0.1 python -m pytest tests/test_entry_scaleup.py -q
"""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

from test_entry import TABLES, _normalize

SF_DIR = os.environ.get("NSS_SWEEP_SF_DIR")

pytestmark = pytest.mark.skipif(
    SF_DIR is None,
    reason="scale-up sweep is opt-in: set NSS_SWEEP_SF_DIR (e.g. /root/testdata/sf0.1)",
)

# every entry with a full value oracle (rows-only entries have nothing to
# compare one decade up)
SCALEUP_ENTRIES = sorted(
    n for n in entry_mod.queries() if entry_mod.oracle_sql().get(n) is not None
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", SCALEUP_ENTRIES)
def test_query_matches_oracle_at_scaleup(spark, duck, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql().get(name)
    assert sql is not None, f"{name}: scale-up subset must be fully oracled"
    sdf = q(spark, SF_DIR)
    srows = [r.asDict() for r in sdf.collect()]
    odf = duck.execute(sql).fetchdf()
    ocols = list(odf.columns)
    scols = sdf.columns
    assert sorted(scols) == sorted(ocols), f"{name}: columns {scols} vs {ocols}"
    orows = odf.to_dict("records")
    assert len(srows) == len(orows), f"{name}: rowcount {len(srows)} vs {len(orows)}"
    sn, on = _normalize(srows, scols), _normalize(orows, ocols)
    for a, b in zip(sn, on):
        assert a == b, f"{name}: {a} vs {b}"
