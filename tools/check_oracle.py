"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01, compare row
count, column names, and an order-insensitive value multiset.

Usage: python tools/check_oracle.py [name ...]
"""

from __future__ import annotations

import decimal
import math
import sys

sys.path.insert(0, ".")

import duckdb

import __spark_entry__ as E
from wikidata_dump_processor_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if isinstance(v, decimal.Decimal):
        return f"{v.normalize():f}"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def multiset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(
        "\x01".join(norm_cell(r[i]) for i in order) for r in rows
    )
    return out


def main():
    only = set(sys.argv[1:])
    spark = get_spark("oracle-check", cpus=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    qs, oracles = E.queries(), E.oracle_sql()
    failures = []
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        try:
            df = fn(spark, SF_DIR)
            rows = df.collect()
            cols = df.columns
        except Exception as ex:
            failures.append((name, f"spark error: {ex}"))
            print(f"FAIL {name}: spark error {str(ex)[:200]}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(rows)} rows)")
            if len(rows) == 0:
                failures.append((name, "0 rows"))
            continue
        try:
            res = con.sql(oracles[name])
            drows = res.fetchall()
            dcols = res.columns
        except Exception as ex:
            failures.append((name, f"duckdb error: {ex}"))
            print(f"FAIL {name}: duckdb error {str(ex)[:200]}")
            continue
        if sorted(cols) != sorted(dcols):
            failures.append((name, f"schema {sorted(cols)} vs {sorted(dcols)}"))
            print(f"FAIL {name}: schema {sorted(cols)} vs {sorted(dcols)}")
            continue
        if len(rows) != len(drows):
            failures.append((name, f"rowcount {len(rows)} vs {len(drows)}"))
            print(f"FAIL {name}: rowcount {len(rows)} vs {len(drows)}")
            continue
        ms, md = multiset(rows, cols), multiset(drows, dcols)
        if ms != md:
            diff = [(a, b) for a, b in zip(ms, md) if a != b][:3]
            failures.append((name, f"values differ, e.g. {diff}"))
            print(f"FAIL {name}: values differ, e.g. {diff}")
            continue
        print(f"PASS {name}: {len(rows)} rows hash-match")
    print(f"\n{len(failures)} failures" if failures else "\nALL PASS")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
