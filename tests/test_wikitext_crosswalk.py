"""Wikitext analysis (U2), person table (wdq3), geonames join (J1),
inverted index (A8/A9)."""

import pytest
from pyspark.sql import functions as F

from wikidata_dump_processor_spark import datagen
from wikidata_dump_processor_spark.operators.crosswalk import (
    geonames_gnd_join,
    inverted_index,
    parse_wikidata_time,
    person_table,
)
from wikidata_dump_processor_spark.operators.text_extract import extract_text
from wikidata_dump_processor_spark.operators import triples as TR
from wikidata_dump_processor_spark.operators.wikitext import (
    analyze_heading_tokens,
    analyze_pages_wikitext,
    analyze_wiki_text,
)


def test_analyze_wiki_text_reference_semantics():
    # empty list -> 'empty' (Text.pm:12)
    assert analyze_wiki_text([])["type"] == "empty"
    # well-formed heading with one-token macro
    res = analyze_wiki_text(["== English ({{lang|en}}) ==", "body text"])
    assert res["type"] == "unknown" and not res["errors"]
    h = res["headings"][0]
    assert h["level"] == 2 and h["words"] == ["English"]
    assert h["macros"] == [["lang", "en"]]
    # heading mismatch -> error, line skipped (Text.pm:28-32)
    res = analyze_wiki_text(["== Broken ==="])
    assert len(res["errors"]) == 1 and "heading mismatch" in res["errors"][0]
    assert not res["headings"]


def test_multi_token_macro_spanning():
    # macro spanning tokens until '}}' (Text.pm:69-81)
    words, macros = analyze_heading_tokens(["word", "{{a|b", "c", "d}}", "tail"])
    assert words == ["word", "tail"]
    assert macros == [["a", "b c d"]]


def test_wikitext_over_pages(spark):
    df = spark.createDataFrame(
        [
            ("u1", "== Deutsch ({{Sprache|Deutsch}}) ==\ntext\n=== Sub ==="),
            ("u2", "no headings here"),
            ("u3", "== Bad ==="),
        ],
        "url string, text string",
    )
    rows = analyze_pages_wikitext(df).collect()
    by_url = {}
    for r in rows:
        by_url.setdefault(r.url, []).append(r)
    assert {r.heading_level for r in by_url["u1"]} == {2, 3}
    assert by_url["u2"][0].heading_level is None and by_url["u2"][0].n_errors == 0
    assert by_url["u3"][0].n_errors == 1


@pytest.fixture(scope="module")
def kg(spark):
    parsed = TR.parse_entities(extract_text(datagen.gen_pages(spark, 300)))
    items = TR.items_table(parsed).cache()
    triples = TR.extract_triples(parsed).cache()
    auth = TR.authctrl_table(TR.with_preferred_label(TR.item_entities(parsed))).cache()
    return parsed, items, triples, auth


def test_person_table(spark, kg):
    parsed, items, triples, auth = kg
    labels = TR.labels_table(TR.with_authctrl(TR.with_preferred_label(TR.item_entities(parsed))))
    persons = person_table(auth, labels).cache()
    rows = persons.collect()
    assert rows, "fixture has humans"
    assert all(r.P31 == "Q5" for r in rows)
    # P569x: raw wikidata time string recovered from the JSON-encoded struct
    with_dob = [r for r in rows if r.P569x is not None]
    assert with_dob and all(r.P569x.startswith("+19") for r in with_dob)
    assert any(r.P214 is not None for r in rows)  # VIAF column populated


def test_parse_wikidata_time(spark):
    df = spark.createDataFrame(
        [("+1952-03-11T00:00:00Z",), ("-0044-03-15T00:00:00Z",), ("junk",)], "t string"
    )
    year, ts = parse_wikidata_time(F.col("t"))
    got = df.select(year.alias("y"), ts.alias("ts")).collect()
    assert got[0].y == 1952 and got[0].ts is not None
    assert got[1].y == -44 and got[1].ts is None  # BCE: year only
    assert got[2].y is None and got[2].ts is None


def test_geonames_gnd_join(spark, kg):
    parsed, items, triples, auth = kg
    out = geonames_gnd_join(triples, items).collect()
    # fixture: P1566 on i%5==2, P227 on humans with i%6==0 -> small overlap
    p1566_subjects = {r.subj for r in triples.filter(F.col("pred") == "P1566").collect()}
    p227_subjects = {r.subj for r in triples.filter(F.col("pred") == "P227").collect()}
    expected = p1566_subjects & p227_subjects
    assert {r.id for r in out} == expected
    for r in out:
        assert r.P1566_val is not None and r.P227_val is not None


def test_inverted_index_layout_routing(spark, kg):
    parsed, items, triples, auth = kg
    props = TR.props_catalog(parsed)
    idx = inverted_index(triples, props, hot_threshold=50).collect()
    by_pred = {r.pred: r for r in idx}
    assert by_pred["P31"].layout == "bitmap"  # hot
    cold = [r for r in idx if r.layout == "list"]
    assert cold
    for r in idx:
        assert r.subjects == sorted(r.subjects)
        assert r.n == len(r.subjects)


def test_inverted_index_scale_paths(spark, kg, tmp_path):
    """The 100-TB contract: mega-predicates are NEVER materialized as one
    array — entries are flat (pred, subj) rows written partitioned by
    pred; arrays exist only below array_cap."""
    from wikidata_dump_processor_spark.operators.crosswalk import (
        inverted_index_entries,
        inverted_index_stats,
        write_inverted_index,
    )

    parsed, items, triples, auth = kg
    props = TR.props_catalog(parsed)
    # array_cap=1: every pred is "too hot" for an array -> subjects NULL
    capped = inverted_index(triples, props, hot_threshold=50, array_cap=1).collect()
    assert capped and all(r.subjects is None for r in capped)
    # stats plan has no collect_set / array aggregation anywhere
    plan = inverted_index_stats(triples, props)._jdf.queryExecution().toString()
    assert "collect_set" not in plan and "ObjectHashAggregate" not in plan
    # entries roundtrip through the partitioned write
    out = str(tmp_path / "inv_idx")
    write_inverted_index(triples, out)
    back = spark.read.parquet(out)
    assert back.count() == inverted_index_entries(triples).count()
    assert set(back.columns) == {"pred", "subj"}


def test_bitmap_index_counts_match_stats(spark, kg):
    """A9: the bitmap index's per-pred bit counts equal the flat index's
    distinct-subject counts, with no array materialization."""
    from wikidata_dump_processor_spark.operators.crosswalk import (
        bitmap_index,
        inverted_index_stats,
    )

    parsed, items, triples, auth = kg
    props = TR.props_catalog(parsed)
    bm = bitmap_index(triples)
    per_pred = {
        r.pred: r.total
        for r in bm.groupBy("pred").agg(F.sum("n_bits").alias("total")).collect()
    }
    stats = {r.pred: r.n for r in inverted_index_stats(triples, props).collect()}
    # mention preds (url subjects) have no numeric id -> absent from bitmap
    for pred, total in per_pred.items():
        assert total == stats[pred], pred
    assert per_pred  # non-trivial
