"""N-Triples export/import (functions/rdf.py) — golden-checked against
an independent Python serializer of the W3C spec, plus byte-exact
round-trip through the writer and reader."""

import re

import pytest
from pyspark.sql import functions as F

from wikidata_dump_processor_spark.functions.rdf import (
    ENTITY_IRI,
    PROP_DIRECT_IRI,
    read_ntriples,
    to_ntriples,
    write_ntriples,
)

ADVERSARIAL = [
    ("Q1", "P31", "Q5"),                       # entity object -> IRI
    ("Q2", "P1476", "plain title"),
    ("Q3", "P1476", 'she said "hi"'),
    ("Q4", "P1476", "back\\slash"),
    ("Q5", "P1476", "line\nbreak\rcr"),
    ("Q6", "P1476", "wire\\nnot-a-newline"),   # backslash THEN n
    ("Q7", "P1476", "\\\\double\\"),           # runs of backslashes
    ("Q8", "P1476", ""),                       # empty literal
    ("Q9", "P1476", "tab\tkept unicode héllo"),
    ("L10", "P5185", "Q999"),                  # lexeme subj, entity obj
    ("Q11", "P625", '{"latitude":1.5,"longitude":2.5}'),
    ("Q12", "P1476", None),                    # NULL -> dropped
    ("Q13", "P856", "https://example.org/home"),  # URL object -> IRI
]


def _py_iri_safe(s):
    """Independent mirror of the IRIREF-illegal percent-encode."""
    return "".join(
        "%%%02X" % ord(c)
        if (ord(c) <= 0x20 or ord(c) == 0x7F or c in '<>"{}|^`\\')
        else c
        for c in s
    )


def _py_line(s, p, o):
    """Independent spec oracle (W3C N-Triples ECHAR escaping)."""
    if o is None:
        return None
    if re.fullmatch(r"[QPL]\d+", o):
        ot = f"<{ENTITY_IRI}{o}>"
    elif re.match(r"[A-Za-z][A-Za-z0-9+.\-]*://", o):
        ot = f"<{_py_iri_safe(o)}>"
    else:
        esc = (
            o.replace("\\", "\\\\")
            .replace('"', '\\"')
            .replace("\n", "\\n")
            .replace("\r", "\\r")
        )
        ot = f'"{esc}"'
    return f"<{ENTITY_IRI}{s}> <{PROP_DIRECT_IRI}{p}> {ot} ."


@pytest.fixture(scope="module")
def adversarial_df(spark):
    return spark.createDataFrame(
        ADVERSARIAL, "subj string, pred string, obj string"
    )


def test_ntriples_lines_match_python_spec(adversarial_df):
    got = sorted(r.line for r in to_ntriples(adversarial_df).collect())
    want = sorted(
        ln for ln in (_py_line(*t) for t in ADVERSARIAL) if ln is not None
    )
    assert got == want


def test_ntriples_roundtrip_in_memory(adversarial_df):
    lines = to_ntriples(adversarial_df)
    back = read_ntriples(lines)
    got = sorted((r.subj, r.pred, r.obj) for r in back.collect())
    want = sorted((s, p, o) for s, p, o in ADVERSARIAL if o is not None)
    assert got == want


def test_ntriples_file_roundtrip_gzip(spark, adversarial_df, tmp_path):
    out = str(tmp_path / "nt")
    write_ntriples(adversarial_df, out)
    import glob

    assert glob.glob(out + "/part-*.txt.gz"), "compressed part files"
    back = read_ntriples(spark, out)
    got = sorted((r.subj, r.pred, r.obj) for r in back.collect())
    want = sorted((s, p, o) for s, p, o in ADVERSARIAL if o is not None)
    assert got == want


def test_reader_drops_malformed_lines(spark):
    lines = spark.createDataFrame(
        [
            (f"<{ENTITY_IRI}Q1> <{PROP_DIRECT_IRI}P31> <{ENTITY_IRI}Q5> .",),
            ("garbage line",),
            (f'<{ENTITY_IRI}Q2> <{PROP_DIRECT_IRI}P1476> "unterminated',),
            ("",),
        ],
        "line string",
    )
    got = [(r.subj, r.pred, r.obj) for r in read_ntriples(lines).collect()]
    assert got == [("Q1", "P31", "Q5")]


def test_foreign_iri_prefixes_pass_through(spark):
    # ids under a different IRI scheme are kept verbatim, not mangled
    lines = spark.createDataFrame(
        [("<http://example.org/a> <http://example.org/p> \"v\" .",)],
        "line string",
    )
    got = [(r.subj, r.pred, r.obj) for r in read_ntriples(lines).collect()]
    assert got == [("http://example.org/a", "http://example.org/p", "v")]


def test_roundtrip_randomized(spark):
    # deterministic pseudo-random literals over the escape alphabet
    import random

    rnd = random.Random(42)
    alphabet = ['\\', '"', '\n', '\r', 'a', 'b', ' ', '\t', 'é']
    rows = [
        (f"Q{i}", "P1476", "".join(rnd.choices(alphabet, k=rnd.randint(0, 12))))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "subj string, pred string, obj string")
    back = read_ntriples(to_ntriples(df))
    got = sorted((r.subj, r.pred, r.obj) for r in back.collect())
    assert got == sorted(rows)


def test_url_subject_serializes_as_own_iri(spark):
    # the canonical table's mention triples carry page-URL subjects —
    # these must NOT be glued onto the entity prefix (CLI regression)
    df = spark.createDataFrame(
        [
            ("https://en.example.org/wiki/Page 1", "Pmention", "Q1"),
            ("Q2", "P31", "Q5"),
        ],
        "subj string, pred string, obj string",
    )
    lines = sorted(r.line for r in to_ntriples(df).collect())
    assert lines == [
        f"<{ENTITY_IRI}Q2> <{PROP_DIRECT_IRI}P31> <{ENTITY_IRI}Q5> .",
        "<https://en.example.org/wiki/Page%201> "
        f"<{PROP_DIRECT_IRI}Pmention> <{ENTITY_IRI}Q1> .",
    ]
    back = read_ntriples(to_ntriples(df))
    got = sorted((r.subj, r.pred, r.obj) for r in back.collect())
    # the percent-encoded space is one-way by design (IRIs can't carry
    # raw spaces); everything else round-trips
    assert got == [
        ("Q2", "P31", "Q5"),
        ("https://en.example.org/wiki/Page%201", "Pmention", "Q1"),
    ]


def test_iri_safe_encodes_full_irireF_illegal_class(spark):
    # N-Triples IRIREF forbids control chars and < > " { } | ^ ` \ —
    # a URL term carrying any of them must emit %XX, or strict loaders
    # reject the line (ADVICE round-5 finding)
    df = spark.createDataFrame(
        [("https://ex.org/a b{c}|d^e`f\\g\x01h", "Pm", "Q1")],
        "subj string, pred string, obj string",
    )
    (line,) = [r.line for r in to_ntriples(df).collect()]
    assert line.startswith(
        "<https://ex.org/a%20b%7Bc%7D%7Cd%5Ee%60f%5Cg%01h> "
    )
    assert _py_line("Q9", "P1476", "tab\tkept unicode héllo")  # oracle sane


def test_url_objects_serialize_as_iris(spark):
    # absolute-IRI objects get the same IRI branch subjects do — RDF
    # consumers must not see page URLs typed as strings (ADVICE round-5)
    df = spark.createDataFrame(
        [
            ("Q1", "P856", "https://example.org/home"),
            ("Q2", "P856", "https://ex.org/with space"),
        ],
        "subj string, pred string, obj string",
    )
    lines = sorted(r.line for r in to_ntriples(df).collect())
    assert lines == [
        f"<{ENTITY_IRI}Q1> <{PROP_DIRECT_IRI}P856> "
        "<https://example.org/home> .",
        f"<{ENTITY_IRI}Q2> <{PROP_DIRECT_IRI}P856> "
        "<https://ex.org/with%20space> .",
    ]
    back = read_ntriples(to_ntriples(df))
    got = sorted((r.subj, r.pred, r.obj) for r in back.collect())
    assert got == [
        ("Q1", "P856", "https://example.org/home"),
        ("Q2", "P856", "https://ex.org/with%20space"),  # %-enc is one-way
    ]


def test_reader_unescapes_full_echar_and_uchar(spark):
    # spec-legal escapes a FOREIGN dump may carry: the full ECHAR set
    # (tbnrf"') and \uXXXX / \UXXXXXXXX codepoints (ADVICE round-5:
    # these used to pass through as raw backslash text — silent
    # corruption)
    P = f"<{ENTITY_IRI}Q1> <{PROP_DIRECT_IRI}P1476> "
    cases = [
        (P + '"tab\\there" .', "tab\there"),
        (P + '"bell\\b\\f\\\'quote" .', "bell\b\f'quote"),
        (P + '"caf\\u00E9" .', "café"),
        (P + '"astral \\U0001F600!" .', "astral 😀!"),
        (P + '"pair \\uD83D\\uDE00!" .', "pair 😀!"),  # UTF-16 pair form
        # NOT decodable: lone surrogate / malformed digits / out of range
        # pass through verbatim instead of corrupting
        (P + '"lone\\uD800kept" .', "lone\\uD800kept"),
        (P + '"bad\\uZZZZkept" .', "bad\\uZZZZkept"),
        (P + '"big\\U00110000kept" .', "big\\U00110000kept"),
        # a LONE high surrogate must not suppress the escape after it
        # (ADVICE r6: the split glued them into one undecodable segment)
        (P + '"stray\\uD800\\u0041end" .', "stray\\uD800Aend"),
        (P + '"stray\\uD800\\uD83D\\uDE00!" .', "stray\\uD800😀!"),
        (P + '"run\\uD800\\uD801\\u0042" .', "run\\uD800\\uD801B"),
        (P + '"strayU\\uD800\\U0001F600" .', "strayU\\uD800😀"),
        # escaped backslash shields the u: literal backslash + "u0041"
        (P + '"mix\\\\u0041" .', "mix\\u0041"),
        # \ decodes to a backslash; the following n stays a letter
        (P + '"esc\\u005Cnot" .', "esc\\not"),
    ]
    lines = spark.createDataFrame([(c[0],) for c in cases], "line string")
    got = {r.obj for r in read_ntriples(lines).collect()}
    assert got == {c[1] for c in cases}


def test_reader_parses_foreign_ntriples_surface(spark):
    # real-world dumps carry blank nodes, language tags, and typed
    # literals — the reader must parse them, not drop the lines
    lines = spark.createDataFrame(
        [
            ('_:b0 <http://example.org/p> "hi" .',),
            (f'<{ENTITY_IRI}Q1> <{PROP_DIRECT_IRI}P1476> "hallo"@de .',),
            (
                f'<{ENTITY_IRI}Q1> <{PROP_DIRECT_IRI}P1082> '
                '"5"^^<http://www.w3.org/2001/XMLSchema#integer> .',
            ),
            (f'<{ENTITY_IRI}Q1> <{PROP_DIRECT_IRI}P31> _:b9 .',),
            ("# a comment line",),
            ("   ",),
        ],
        "line string",
    )
    got = sorted(
        (r.subj, r.pred, r.obj) for r in read_ntriples(lines).collect()
    )
    assert got == [
        ("Q1", "P1082", "5"),
        ("Q1", "P1476", "hallo"),
        ("Q1", "P31", "_:b9"),
        ("_:b0", "http://example.org/p", "hi"),
    ]
    meta = {
        (r.subj, r.pred, r.obj): (r.lang, r.datatype)
        for r in read_ntriples(lines, with_meta=True).collect()
    }
    assert meta[("Q1", "P1476", "hallo")] == ("de", None)
    assert meta[("Q1", "P1082", "5")] == (
        None,
        "http://www.w3.org/2001/XMLSchema#integer",
    )
    assert meta[("_:b0", "http://example.org/p", "hi")] == (None, None)
