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


def _multipage_stream(idxs):
    """One XML stream holding the <page> frames of datagen pages `idxs`
    (per-page <mediawiki> wrappers stripped, like a real dump)."""
    inner = []
    for i in idxs:
        inner += datagen.page_xml(i).split("\n")[1:-1]
    return "\n".join(["<mediawiki>"] + inner + ["</mediawiki>"])


def test_split_page_documents_pure():
    from wikidata_dump_processor_spark.operators.text_extract import (
        split_page_documents,
    )

    idxs = list(range(1, 13))  # covers empty-text, single-line, heading pages
    chunks = split_page_documents(_multipage_stream(idxs))
    assert len(chunks) == len(idxs)
    for i, c in zip(idxs, chunks):
        fr = extract_page(c)
        ref = extract_page(datagen.page_xml(i))
        assert fr["text"] == ref["text"], i  # byte-identical per frame
        assert fr["title"] == ref["title"] and fr["id"] == ref["id"]
    # single-page / pageless docs pass through unchanged
    assert split_page_documents(PAGE) == [PAGE]
    assert split_page_documents("no pages here") == ["no pages here"]


def test_split_namespace_lines_accumulate():
    # a namespace row BETWEEN pages is state-0 context for every later
    # frame (wkt1.pl:176-180: %ns accumulates over the stream)
    from wikidata_dump_processor_spark.operators.text_extract import (
        split_page_documents,
    )

    lines = _multipage_stream([1, 2]).split("\n")
    close = [k for k, ln in enumerate(lines) if ln.strip() == "</page>"]
    lines.insert(close[0] + 1, '  <namespace key="4" case="first-letter">Project</namespace>')
    chunks = split_page_documents("\n".join(lines))
    assert len(chunks) == 2
    ns0 = extract_page(chunks[0])["namespaces"]
    ns1 = extract_page(chunks[1])["namespaces"]
    assert not any(n["ns_id"] == "4" for n in ns0)
    assert any(n["ns_id"] == "4" for n in ns1)


def test_split_page_close_inside_text_body():
    # state 3 treats a literal </page> line as body (wkt1.pl:239-246);
    # the splitter must not cut the frame there — it runs the same state
    # machine, so only a state-1 </page> flushes.
    from wikidata_dump_processor_spark.operators.text_extract import (
        split_page_documents,
    )

    body_doc = PAGE.replace(
        '<text xml:space="preserve">line one\nline two\nlast line</text>',
        '<text xml:space="preserve">a\n</page>\nb\nlast</text>',
    )
    # two-page stream so splitting actually engages
    stream = "\n".join(
        body_doc.split("\n")[:-1] + datagen.page_xml(2).split("\n")[1:]
    )
    chunks = split_page_documents(stream)
    assert len(chunks) == 2
    assert extract_page(chunks[0])["text"] == "a\n</page>\nb\nlast"
    assert extract_page(chunks[1])["text"] == datagen.expected_text(2)


def test_split_preamble_bounded():
    # chunk k carries ONLY namespace lines from state 0 — a big non-ns
    # preamble is not duplicated into every chunk (total bytes grow
    # O(pages + preamble), not O(pages × preamble))
    from wikidata_dump_processor_spark.operators.text_extract import (
        split_page_documents,
    )

    junk = ["  <siteinfo>JUNK-%04d</siteinfo>" % i for i in range(1000)]
    ns_row = '  <namespace key="0" case="first-letter">Main</namespace>'
    lines = _multipage_stream(list(range(1, 9))).split("\n")
    stream = "\n".join(lines[:1] + junk + [ns_row] + lines[1:])
    chunks = split_page_documents(stream)
    assert len(chunks) == 8
    for c in chunks:
        assert "JUNK-" not in c  # non-ns preamble dropped from every chunk
        assert '<namespace key="0"' in c  # ns catalog still carried
    assert sum(len(c) for c in chunks) < len(stream) + sum(map(len, chunks[:1]))


def test_html_undecodable_with_text_hint(spark):
    """An html-bearing row whose bytes fail utf-8 decode emits text=None
    + a utf8 diag — the pre-filled text hint is never used for html rows
    (invariant enforced in the kernel, not just the JVM projection)."""
    import pandas as pd
    from wikidata_dump_processor_spark.schemas import PAGES_SCHEMA

    base = datagen.page_row(1)
    rows = [
        {**base, "url": "u://bad-utf8", "html": b"\xff\xfe<page>", "text": "HINT"},
        {**base, "url": "u://no-flush", "html": b"<mediawiki>\n</mediawiki>", "text": "HINT"},
        {**base, "url": "u://no-html", "html": None, "text": "HINT"},
    ]
    df = spark.createDataFrame(pd.DataFrame(rows), PAGES_SCHEMA)
    got = {r.url: r for r in extract_text(df).collect()}
    assert got["u://bad-utf8"].text is None
    assert got["u://bad-utf8"].diag.startswith("utf8:")
    assert got["u://no-flush"].text is None
    assert got["u://no-flush"].diag == "no <page> flushed"
    assert got["u://no-html"].text == "HINT" and got["u://no-html"].diag is None


def test_split_multipage_operator(spark):
    """1->N splitter feeding the existing extractor: an N-page stream row
    yields N extracted rows byte-identical to per-page extraction."""
    import pandas as pd
    from wikidata_dump_processor_spark.operators.text_extract import split_multipage
    from wikidata_dump_processor_spark.schemas import PAGES_SCHEMA

    idxs = list(range(1, 13))
    raw = spark.createDataFrame(
        pd.DataFrame(
            [
                {
                    "url": "https://dumps.example/part-00000",
                    "warc_ts": datagen.page_row(0)["warc_ts"],
                    "html": _multipage_stream(idxs).encode(),
                    "text": None,
                    "lang": "en",
                },
                datagen.page_row(20),  # single-page row: passes through
            ]
        ),
        PAGES_SCHEMA,
    )
    got = {
        r.url: r
        for r in extract_text(split_multipage(raw)).collect()
    }
    assert len(got) == len(idxs) + 1
    for k, i in enumerate(idxs, start=1):
        row = got[f"https://dumps.example/part-00000#page={k}"]
        assert row.text == datagen.expected_text(i), i
        assert row.title == f"Page_{i}"
        assert row.diag is None or row.text == ""
    assert got[datagen.page_row(20)["url"]].text == datagen.expected_text(20)
