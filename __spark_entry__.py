"""Driver contract for the spark-graft builder (PySpark target).

``entry``: flagship KG-construction run (pages -> byte-identical text ->
triples -> canonicalized graph) on the deterministic synthetic corpus.
``queries``/``oracle_sql``: operator inventory from SURVEY.md §2 over the
driver test tables, DuckDB-oracle-checked where ANSI-SQL-expressible;
KG/trie/variant/iterative operators are rows-only (correctness carried by
tests/ golden oracle — see tests/test_triples.py P/R gate).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from wikidata_dump_processor_spark.queries_catalog import ORACLE_SQL, SPARK_QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full KG construction on the sf0.001-scale synthetic
    corpus; returns the canonicalized (subj, pred, obj, src_url) triples."""
    from wikidata_dump_processor_spark import datagen
    from wikidata_dump_processor_spark.operators.canonicalize import (
        canonical_map,
        rewrite_triples,
    )
    from wikidata_dump_processor_spark.operators.text_extract import extract_text
    from wikidata_dump_processor_spark.operators.triples import (
        extract_triples,
        parse_entities,
    )

    pages = datagen.gen_pages(spark, datagen.sf_to_n_pages("sf0.001"))
    triples = extract_triples(parse_entities(extract_text(pages)))
    return rewrite_triples(triples, canonical_map(triples))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    # KG-query oracles read golden parquet fixtures (a pure-Python
    # re-derivation of the pipeline's expected output over the same
    # deterministic corpus) — make sure they exist before the driver
    # executes the SQL.  Idempotent, ~2 s, no Spark involved.
    from wikidata_dump_processor_spark.golden import ensure_golden

    ensure_golden()
    return dict(ORACLE_SQL)
