"""Driver-mimicking correctness check: run every __spark_entry__ query on
Spark and its oracle on DuckDB at the given sf dir; compare row count,
sorted-column value multiset, and report per-query status.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from kiwi_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def normalize(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = round(v, 6)
            vals.append(repr(v))
        out.append("|".join(vals))
    return sorted(out)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        started = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name:34s} spark error: {exc}")
            failures += 1
            continue
        wall = time.time() - started
        if name not in oracles:
            print(f"rows  {name:34s} {len(srows):7d} rows   {wall:6.1f}s (no oracle)")
            continue
        try:
            ddf = con.sql(oracles[name])
            drows = ddf.fetchall()
            dcols = [d[0] for d in ddf.description]
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name:34s} duckdb error: {exc}")
            failures += 1
            continue
        if sorted(scols) != sorted(dcols):
            print(f"FAIL  {name:34s} columns {sorted(scols)} vs {sorted(dcols)}")
            failures += 1
            continue
        sn = normalize([tuple(r) for r in srows], scols)
        dn = normalize(drows, dcols)
        if len(sn) != len(dn):
            print(f"FAIL  {name:34s} rowcount {len(sn)} vs {len(dn)}")
            failures += 1
            continue
        if sn != dn:
            diff = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
            print(f"FAIL  {name:34s} value mismatch, e.g. {diff}")
            failures += 1
            continue
        print(f"OK    {name:34s} {len(sn):7d} rows   {wall:6.1f}s")

    spark.stop()
    print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
