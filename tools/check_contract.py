#!/usr/bin/env python
"""Driver-style correctness gate, runnable standalone.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB over the same parquet tables, compares
row count, column names, and an order-insensitive value hash (columns
sorted by name, rows stringified and sorted — the driver's
canonicalization), and prints per-query timing.

Usage: python tools/check_contract.py [sf_dir] [query ...]
       (default sf_dir /root/testdata/sf0.01; default = all queries)
"""

from __future__ import annotations

import hashlib
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entry  # noqa: E402
from ligra_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(str(r[i]) for i in order) for r in rows)
    digest = hashlib.md5(str(out).encode()).hexdigest()
    return digest, len(out), sorted(cols)


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    names = [a for a in args if "/" not in a]
    spark = get_spark("check_contract")
    queries, oracles = entry.queries(), entry.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    fails = []
    t0 = time.time()
    for name in names or queries:
        t1 = time.time()
        try:
            sdf = queries[name](spark, sf_dir)
            s_hash, s_n, s_cols = canon([tuple(r) for r in sdf.collect()], sdf.columns)
            cur = con.execute(oracles[name])
            o_hash, o_n, o_cols = canon(
                cur.fetchall(), [d[0] for d in cur.description]
            )
            ok = s_hash == o_hash and s_cols == o_cols and s_n == o_n
            detail = "" if ok else f" rows {s_n}/{o_n} cols {s_cols}/{o_cols}"
        except Exception as ex:  # noqa: BLE001
            ok, detail = False, f" error: {ex}"[:160]
        if not ok:
            fails.append(name)
        print(f"{name}: {'OK' if ok else 'FAIL'} {time.time() - t1:.1f}s{detail}",
              flush=True)
    print(f"TOTAL {time.time() - t0:.1f}s; {len(fails)} failures {fails}")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
