"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01, compare row
count, column names, and the pandas-converted value multiset.

STRICT mode (the default, matching the driver): Spark results go through
``toPandas()`` and DuckDB results through ``.df()``; cells are compared by
``repr`` of the pandas-held value with NO numeric normalization — so
``Decimal('100.10')`` vs ``100.1`` (float) is a FAIL, exactly like the
driver's value hash.  This is what caught the round-1 a1/a3/a6/j4/j5/p7/
p12/w2 type-drift mismatches.

Usage: python tools/check_oracle.py [name ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

import duckdb
import numpy as np
import pandas as pd

import __spark_entry__ as E
from wikidata_dump_processor_spark.session import get_spark

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def cell_repr(v):
    # pandas-level repr: floats/ints/Decimals/str keep their native repr so
    # any cross-engine dtype drift shows up as a mismatch (driver-faithful)
    if v is None:
        return "<null>"
    if isinstance(v, float) and np.isnan(v):
        return "<null>"
    if v is pd.NaT:
        return "<null>"
    return f"{type(v).__name__}:{v!r}"


def canon(pdf: pd.DataFrame) -> list[str]:
    cols = sorted(pdf.columns)
    rows = [
        "\x01".join(cell_repr(r[c]) for c in cols)
        for _, r in pdf.iterrows()
    ]
    return sorted(rows)


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
            pdf = df.toPandas()
        except Exception as ex:
            failures.append((name, f"spark error: {ex}"))
            print(f"FAIL {name}: spark error {str(ex)[:300]}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(pdf)} rows)")
            if len(pdf) == 0:
                failures.append((name, "0 rows"))
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as ex:
            failures.append((name, f"duckdb error: {ex}"))
            print(f"FAIL {name}: duckdb error {str(ex)[:300]}")
            continue
        if sorted(pdf.columns) != sorted(ddf.columns):
            failures.append((name, "schema"))
            print(f"FAIL {name}: schema {sorted(pdf.columns)} vs {sorted(ddf.columns)}")
            continue
        if len(pdf) != len(ddf):
            failures.append((name, f"rowcount {len(pdf)} vs {len(ddf)}"))
            print(f"FAIL {name}: rowcount {len(pdf)} vs {len(ddf)}")
            continue
        try:
            ms, md = canon(pdf), canon(ddf)
        except Exception as ex:
            failures.append((name, f"canon error: {ex}"))
            print(f"FAIL {name}: canon error {str(ex)[:300]}")
            continue
        if ms != md:
            diff = [(a, b) for a, b in zip(ms, md) if a != b][:2]
            failures.append((name, "values"))
            print(f"FAIL {name}: values differ, e.g. {diff}")
            continue
        print(f"PASS {name}: {len(pdf)} rows strict-match")
    print(f"\n{len(failures)} failures: {[n for n, _ in failures]}" if failures else "\nALL PASS")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
