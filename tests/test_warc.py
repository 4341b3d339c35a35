"""WARC ingest (sources/warc.py): archive bytes → pages-table rows."""

import gzip
from datetime import datetime

import pytest

from wikidata_dump_processor_spark.sources.warc import (
    iter_warc_records,
    read_warc,
)


def _rec(rtype: bytes, url: bytes | None, payload: bytes,
         date: bytes = b"2017-03-06T04:03:53Z") -> bytes:
    head = [b"WARC/1.0", b"WARC-Type: " + rtype, b"WARC-Date: " + date]
    if url is not None:
        head.append(b"WARC-Target-URI: " + url)
    head.append(b"Content-Length: " + str(len(payload)).encode())
    return b"\r\n".join(head) + b"\r\n\r\n" + payload + b"\r\n\r\n"


HTML_A = b"<html><body>alpha</body></html>"
HTTP_200 = (
    b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + HTML_A
)
HTTP_404 = b"HTTP/1.1 404 Not Found\r\n\r\n<html>gone</html>"
WET_TEXT = "plain text body é".encode()

RECORDS = (
    _rec(b"warcinfo", None, b"software: test")
    + _rec(b"response", b"http://a.example/x", HTTP_200)
    + _rec(b"response", b"http://a.example/404", HTTP_404)
    + b"GARBAGE NOT A RECORD\r\n\r\n"
    + _rec(b"resource", b"http://b.example/raw", b"<html>raw</html>")
    + _rec(b"request", b"http://a.example/x", b"GET /x HTTP/1.1\r\n")
    + _rec(b"conversion", b"http://a.example/x", WET_TEXT)
)


def test_iter_warc_records_resyncs_and_counts():
    recs = list(iter_warc_records(RECORDS))
    # warcinfo + response*2 + resource + request + conversion = 6;
    # the garbage block is not a record and is skipped by resync
    assert len(recs) == 6
    types = [h["warc-type"] for h, _ in recs]
    assert types == [
        "warcinfo", "response", "response", "resource", "request",
        "conversion",
    ]
    assert recs[1][1] == HTTP_200


def test_iter_truncated_final_record():
    cut = RECORDS[: len(RECORDS) - 10]
    assert len(list(iter_warc_records(cut))) == 5


@pytest.fixture(scope="module")
def warc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("warc")
    (d / "plain.warc").write_bytes(RECORDS)
    # member-per-record gzip, the Common-Crawl layout
    gz = b"".join(
        gzip.compress(m)
        for m in (
            _rec(b"response", b"http://gz.example/1", HTTP_200),
            _rec(b"conversion", b"http://gz.example/1", WET_TEXT),
        )
    )
    (d / "members.warc.gz").write_bytes(gz)
    return str(d)


def test_read_warc_plain(spark, warc_dir):
    df = read_warc(spark, warc_dir + "/plain.warc")
    collected = df.collect()
    # default policy: 404 dropped, request/warcinfo skipped
    assert {r.url for r in collected} == {
        "http://a.example/x", "http://b.example/raw"
    }
    rows = {r.url: r for r in collected if r.html is not None}
    a = rows["http://a.example/x"]
    assert bytes(a.html) == HTML_A  # HTTP headers stripped
    assert a.warc_ts == datetime(2017, 3, 6, 4, 3, 53)
    assert a.text is None and a.lang is None
    assert bytes(rows["http://b.example/raw"].html) == b"<html>raw</html>"


def test_read_warc_conversion_rows(spark, warc_dir):
    # a conversion (WET) record lands as a text-bearing row, html NULL
    df = read_warc(spark, warc_dir + "/plain.warc")
    texts = [
        (r.text, r.html) for r in df.collect() if r.text is not None
    ]
    assert texts == [("plain text body é", None)]


def test_read_warc_keep_non_200(spark, warc_dir):
    df = read_warc(spark, warc_dir + "/plain.warc", keep_non_200=True)
    urls = {r.url for r in df.collect()}
    assert "http://a.example/404" in urls


def test_read_warc_gzip_members(spark, warc_dir):
    df = read_warc(spark, warc_dir + "/members.warc.gz")
    rows = sorted(df.collect(), key=lambda r: (r.text is not None))
    assert len(rows) == 2
    assert bytes(rows[0].html) == HTML_A
    assert rows[1].text == "plain text body é"


def test_read_warc_small_batches(spark, warc_dir):
    # batch_rows=1 exercises the incremental Arrow-batch yield path
    df = read_warc(spark, warc_dir + "/plain.warc", batch_rows=1)
    assert df.count() == 3


def test_warc_ingest_feeds_pipeline_identically(spark, tmp_path):
    """gen_pages html wrapped as WARC → read_warc → extract_triples
    must equal the direct-table path (ingest is lossless)."""
    from wikidata_dump_processor_spark import datagen
    from wikidata_dump_processor_spark.operators.text_extract import (
        extract_text,
    )
    from wikidata_dump_processor_spark.operators import triples as TR

    pages = datagen.gen_pages(spark, 80)
    rows = pages.collect()
    blob = b"".join(
        gzip.compress(
            _rec(
                b"resource",
                r.url.encode(),
                bytes(r.html),
                date=(r.warc_ts.isoformat() + "Z").encode(),
            )
        )
        for r in rows
        if r.html is not None
    )
    (tmp_path / "pages.warc.gz").write_bytes(blob)

    ingested = read_warc(spark, str(tmp_path / "pages.warc.gz"))
    def tri(df):
        t = TR.extract_triples(TR.parse_entities(extract_text(df)))
        return sorted(
            (r.subj, r.pred, r.obj, r.src_url) for r in t.collect()
        )

    direct = tri(pages.filter("html is not null"))
    assert tri(ingested) == direct and len(direct) > 0
