"""Mimics the driver's correctness gate: run every ``queries()`` entry
on Spark and its ``oracle_sql()`` twin on DuckDB over the same parquet
tables; compare row count, column names, and (order-insensitively)
values. Floats must match exactly after the queries' own rounding —
that's what a value-hash comparison requires."""

from __future__ import annotations

import math
from pathlib import Path

import duckdb
import pytest

import __spark_entry__ as entry_mod

import os

SF_DIR = os.environ.get("LIGRA_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = Path(SF_DIR) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    yield con
    con.close()


def _normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 9)
                if v == -0.0:
                    v = 0.0
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return out


ORACLE_KEYS = sorted(entry_mod.oracle_sql())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(entry_mod.oracle_sql()[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()

    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    assert len(srows) == len(drows), (
        f"{name}: row count {len(srows)} (spark) vs {len(drows)} (duckdb)"
    )
    snorm = _normalize(srows, scols)
    dnorm = _normalize(drows, dcols)
    mismatches = [
        (a, b) for a, b in zip(snorm, dnorm) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


def test_rows_only_queries_run(spark):
    """Entries without oracle SQL still must run and return rows."""
    qs = entry_mod.queries()
    for name in sorted(set(qs) - set(entry_mod.oracle_sql())):
        df = qs[name](spark, SF_DIR)
        assert df.count() > 0, f"{name} returned no rows"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["id", "rank", "out_deg", "in_deg"]


def test_all_oracle_keys_have_queries():
    assert set(entry_mod.oracle_sql()) <= set(entry_mod.queries())
