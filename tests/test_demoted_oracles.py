"""Strict driver-style oracle checks for the queries demoted out of the
driver's 50-slot gate (queries_catalog.PYTEST_ORACLES).

The external correctness gate runs at most 50 queries (see the
50-query-cap note in queries_catalog.py); round 5 filled the catalog to
58, so the 8 slots whose SURVEY §2 rows are ALSO covered by another
green driver slot or a dedicated pytest moved here.  The check is the
driver's own compare, not a weaker one: Spark result via ``toPandas``
vs DuckDB via ``.df()`` on the same parquet tables, identical column
sets, and a repr-level value multiset with NO numeric normalization
(the same strictness that caught the round-1 type-drift mismatches).
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

from wikidata_dump_processor_spark.queries_catalog import PYTEST_ORACLES

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _cell(v):
    if v is None:
        return "<null>"
    if isinstance(v, float) and np.isnan(v):
        return "<null>"
    if v is pd.NaT:
        return "<null>"
    return f"{type(v).__name__}:{v!r}"


def _canon(pdf: pd.DataFrame) -> list[str]:
    cols = sorted(pdf.columns)
    return sorted(
        "\x01".join(_cell(r[c]) for c in cols) for _, r in pdf.iterrows()
    )


@pytest.fixture(scope="module")
def ddb():
    # the demoted oracles' SQL reads the golden parquet fixtures directly
    # (e.g. bgp1 self-joins .golden/n2000/triples.parquet) — build them
    # here so the suite is self-sufficient on a fresh checkout instead of
    # relying on a prior driver run having materialized .golden/
    from wikidata_dump_processor_spark.golden import ensure_golden

    ensure_golden()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(PYTEST_ORACLES))
def test_demoted_query_matches_oracle(spark, ddb, name):
    fn, sql = PYTEST_ORACLES[name]
    assert sql is not None, f"{name} registered driver=False without SQL"
    got = fn(spark, SF_DIR).toPandas()
    want = ddb.sql(sql).df()
    assert sorted(got.columns) == sorted(want.columns), name
    assert len(got) == len(want), name
    assert _canon(got) == _canon(want), name
