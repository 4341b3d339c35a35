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


# ---------------------------------------------------------------------------
# Splitter parity: split_page_documents must reproduce, frame for frame,
# what ONE wkt1.pl state machine running over the whole stream would
# flush.  The reference below is an INDEPENDENT re-derivation of the
# wkt1.pl:153-295 transitions (multi-flush; own regexes) — it shares no
# code with the operator.
import re as _re

_NS = _re.compile(r'\s*<namespace key="([\-\d]+)" case="([^"]+)">([^"]*)</namespace>')
_PO = _re.compile(r"\s*<page>")
_PC = _re.compile(r"\s*</page>")
_RO = _re.compile(r"\s*<revision>")
_RC = _re.compile(r"\s*</revision>")
_TE = _re.compile(r'\s*<text xml:space="preserve" */>')
_TO = _re.compile(r'\s*<text xml:space="preserve">(.*)')
_FF = _re.compile(r"\s*<(title|ns|id)>([^<]+)</.+>")
_TC = _re.compile(r"(.*)</text>$", _re.DOTALL)


def _reference_stream_flushes(doc):
    """All (title, text, ns_ids_seen_so_far) flushes of one machine over
    the whole stream (wkt1.pl semantics, %ns accumulating)."""
    state, frame, text, ns, out = 0, {}, [], [], []
    for line in doc.split("\n"):
        if state == 0:
            m = _NS.match(line)
            if m:
                ns.append(m.group(1))
            elif _PO.match(line):
                state, frame = 1, {}
        elif state == 1:
            if _PC.match(line):
                state = 0
                out.append((frame.get("title"), "\n".join(text), list(ns)))
            elif _RO.match(line):
                state, text = 2, []
            else:
                m = _FF.match(line)
                if m:
                    frame[m.group(1)] = m.group(2)
        elif state == 2:
            if _RC.match(line) or _TE.match(line):
                state = 1
            else:
                m = _TO.match(line)
                if m:
                    t = m.group(1)
                    if "</text>" in t:
                        t = t.replace("</text>", "", 1)
                        state = 2
                    else:
                        state = 3
                    text = [t]
        elif state == 3:
            m = _TC.match(line)
            if m:
                text.append(m.group(1))
                state = 2
            else:
                text.append(line)
    return out


_page_body = st.lists(
    st.sampled_from(
        ["plain body line", "</page>", "a</text>extra", "  <revision>", "x y z", ""]
    ),
    max_size=4,
)


@st.composite
def _stream(draw):
    blocks = []
    n = draw(st.integers(min_value=0, max_value=5))
    for _ in range(n):
        kind = draw(st.sampled_from(["ns", "junk", "page", "empty_page", "broken"]))
        if kind == "ns":
            k = draw(st.integers(0, 9))
            blocks.append(f'  <namespace key="{k}" case="first-letter">N{k}</namespace>')
        elif kind == "junk":
            blocks.append(draw(st.sampled_from(["<siteinfo>x</siteinfo>", "", "random text", "</page>"])))
        elif kind == "page":
            body = draw(_page_body)
            t = draw(st.integers(0, 99))
            blocks += (
                ["  <page>", f"    <title>T{t}</title>", "    <revision>",
                 '      <text xml:space="preserve">first']
                + body
                + ["last</text>", "    </revision>", "  </page>"]
            )
        elif kind == "empty_page":
            blocks += ["  <page>", "    <revision>",
                       '      <text xml:space="preserve" />',
                       "    </revision>", "  </page>"]
        else:  # broken: page that never closes its revision
            blocks += ["  <page>", "    <revision>", "      <id>1</id>"]
    return "\n".join(blocks)


@settings(max_examples=200, deadline=None)
@given(_stream())
def test_splitter_matches_single_machine_flushes(doc):
    """Per-chunk extraction over the split == the flush sequence of one
    reference machine over the whole stream (title, byte-exact text,
    and the accumulated namespace catalog at each flush)."""
    from wikidata_dump_processor_spark.operators.text_extract import (
        split_page_documents,
    )

    expected = _reference_stream_flushes(doc)
    chunks = split_page_documents(doc)
    if len(chunks) == 1:
        got_all = [extract_page(chunks[0])]
        got = [
            (fr.get("title"), fr["text"], [n["ns_id"] for n in fr["namespaces"]])
            for fr in got_all
            if fr.get("text") is not None
        ]
        assert got == expected[:1]  # one-doc passthrough flushes first frame only
    else:
        got = []
        for c in chunks:
            fr = extract_page(c)
            if fr.get("text") is not None:
                got.append(
                    (fr.get("title"), fr["text"], [n["ns_id"] for n in fr["namespaces"]])
                )
        assert got == expected
