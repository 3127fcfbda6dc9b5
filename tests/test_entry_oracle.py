"""Replicates the driver's correctness gate locally: run every
__spark_entry__ query next to its DuckDB oracle and compare row counts
+ order-insensitive values (columns sorted by name).

Runs at sf0.01 by default (the driver's own gate scale). Set
``SPARK_GRAFT_ORACLE_SF01=1`` to ALSO run every oracle query at sf0.1 —
the bench scale — so correctness is pinned at both scales BENCH.md
reports (round-4 verdict: "second-scale correctness, not just perf").

Kernel-backed queries without an oracle get the rows-only check here too,
plus invariant assertions where cheap.
"""

from __future__ import annotations

import math
import os
from decimal import Decimal

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
SF_DIRS = [SF_DIR]
if os.environ.get("SPARK_GRAFT_ORACLE_SF01") == "1":
    SF_DIRS.append("/root/testdata/sf0.1")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module", params=SF_DIRS,
                ids=lambda p: p.rsplit("/", 1)[-1])
def sf_dir(request):
    return request.param


@pytest.fixture(scope="module")
def ddb(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    yield con
    con.close()


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, Decimal):
                v = float(v)
            if isinstance(v, float):
                v = round(v, 6)
                if math.isclose(v, 0.0, abs_tol=1e-9):
                    v = 0.0
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return out


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql().keys()))
def test_query_matches_oracle(spark, sf_dir, ddb, name):
    q = entrymod.queries()[name]
    sdf = q(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    res = ddb.sql(entrymod.oracle_sql()[name])
    orows = res.fetchall()
    ocols = res.columns

    assert sorted(scols) == sorted(ocols), f"{name}: column mismatch {scols} vs {ocols}"
    assert len(srows) == len(orows), f"{name}: {len(srows)} vs {len(orows)} rows"
    sn, on = _normalize(srows, scols), _normalize(orows, ocols)
    mismatches = [(a, b) for a, b in zip(sn, on) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


def test_rows_only_queries(spark, sf_dir):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    for name in qs:
        if name in oracles:
            continue
        df = qs[name](spark, sf_dir)
        assert df.count() > 0, f"{name}: empty result"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) == 500
    assert set(df.columns) == {"doc_id", "cluster_id"}
