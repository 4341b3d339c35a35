"""Byte-identical text extraction (wkt1.pl:153-295 semantics)."""

import re

from wikidata_dump_processor_spark import datagen
from wikidata_dump_processor_spark.operators.text_extract import extract_page, extract_text

PAGE = """<mediawiki>
  <namespace key="0" case="first-letter">Main</namespace>
  <page>
    <title>T1</title>
    <ns>0</ns>
    <id>7</id>
    <revision>
      <id>99</id>
      <sha1>abc</sha1>
      <text xml:space="preserve">line one
line two
last line</text>
    </revision>
  </page>
</mediawiki>"""


def test_multiline_fragment_close():
    fr = extract_page(PAGE)
    assert fr["title"] == "T1" and fr["ns"] == "0" and fr["id"] == "7"
    assert fr["rev_id"] == "99" and fr["rev_sha1"] == "abc"
    # wkt1.pl:239-246: close-tag line contributes only the fragment
    assert fr["text"] == "line one\nline two\nlast line"
    assert fr["namespaces"] == [{"ns_id": "0", "ns_case": "first-letter", "ns_name": "Main"}]


def test_empty_text_selfclose():
    # wkt1.pl:216-218: <text xml:space="preserve" /> => empty body
    doc = PAGE.replace(
        '<text xml:space="preserve">line one\nline two\nlast line</text>',
        '<text xml:space="preserve" />',
    )
    assert extract_page(doc)["text"] == ""


def test_single_line_close():
    # wkt1.pl:224: open+close on one line; close tag removed in place
    doc = PAGE.replace(
        '<text xml:space="preserve">line one\nline two\nlast line</text>',
        '<text xml:space="preserve">only line</text>',
    )
    assert extract_page(doc)["text"] == "only line"


def test_close_tag_mid_line_first_occurrence_removed():
    # perl s#</text># removes the FIRST occurrence, state stays 2
    doc = PAGE.replace(
        '<text xml:space="preserve">line one\nline two\nlast line</text>',
        '<text xml:space="preserve">a</text>b</text>',
    )
    assert extract_page(doc)["text"] == "ab</text>"


def test_frame_field_last_wins():
    doc = PAGE.replace("<ns>0</ns>", "<ns>0</ns>\n    <ns>4</ns>")
    assert extract_page(doc)["ns"] == "4"


def test_no_page_returns_none():
    assert extract_page("<mediawiki>\n</mediawiki>")["text"] is None


def test_distributed_extraction_byte_identical(spark):
    """The mapInPandas operator reproduces expected_text byte-for-byte for
    every url, including pages whose `text` column was null (html-only)."""
    n = 200
    pages = datagen.gen_pages(spark, n)
    rows = extract_text(pages).select("url", "text").collect()
    assert len(rows) == n
    for r in rows:
        i = int(re.search(r"Page_(\d+)$", r.url).group(1))
        assert (r.text or "") == datagen.expected_text(i), f"byte mismatch for page {i}"
