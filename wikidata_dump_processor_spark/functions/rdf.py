"""N-Triples export/import for the canonical triples table.

The reference emits its extraction as TSV and JSON (wdq1.pl:745-828);
the lingua franca for exchanging a knowledge graph is W3C N-Triples —
one triple per line, `<subj-iri> <pred-iri> <object> .` — which load
directly into any RDF store.  This sink maps the engine's (subj, pred,
obj) rows onto Wikidata's public IRI scheme (entity ids under
``http://www.wikidata.org/entity/``, direct-claim properties under
``http://www.wikidata.org/prop/direct/`` — the layout Wikidata's own
RDF dumps use) and serializes entirely with JVM expressions: IRI wrap
via concat, literal escaping via literal ``replace`` passes (the
canonical N-Triples ECHAR output set: ``\\ " \n \r`` — backslash FIRST,
or the escapes it introduces would be re-escaped).  No Python node, no
shuffle: the writer is a narrow map over however the triples are
already partitioned, so a 100 TB export parallelizes like the scan
itself.

Subjects AND objects that are not entity ids but absolute IRIs of
their own — the mention triples' page-URL subjects, URL-valued
objects — serialize verbatim as IRIs (with the full IRIREF-illegal
character class percent-encoded), never glued onto the entity prefix
and never mistyped as string literals.

``read_ntriples`` is the inverse (regexp term split + unescape chain),
giving a byte-exact round-trip — tested write→read == input.  The
reader accepts the full W3C escape surface foreign dumps may carry
(ECHAR ``tbnrf"'`` + UCHAR ``\\uXXXX``/``\\UXXXXXXXX`` incl. UTF-16
surrogate pairs), beyond what our canonical writer emits; undecodable
escapes (lone surrogates, malformed digits, > U+10FFFF) pass through
verbatim rather than corrupting the literal.

Lines with a NULL term are dropped (count them upstream via the stats
tables if lineage matters): N-Triples has no NULL, and a partial line
would corrupt the file for downstream loaders.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ENTITY_IRI = "http://www.wikidata.org/entity/"
PROP_DIRECT_IRI = "http://www.wikidata.org/prop/direct/"

_ENTITY_RE = r"^[QPL]\d+$"
# an absolute IRI of its own (e.g. the mention triples' page-URL
# subjects) — serialized verbatim, NOT glued onto the entity prefix
_ABS_IRI_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://"


# the full IRIREF-illegal class (N-Triples grammar: IRIREF excludes
# control chars and  < > " { } | ^ ` \  and space) — all ASCII, so a
# per-char ``%XX`` from the codepoint is the correct percent-encoding
_IRI_ILLEGAL_RE = r'[\x00-\x20<>"{}|^`\\\x7f]'


def _iri_safe(c: Column) -> Column:
    """Percent-encode every character the N-Triples IRIREF grammar
    forbids (space, angle brackets, quote, ``{ } | ^ ` \\`` and control
    chars) so strict loaders accept the line.  One-way by design: the
    reader keeps IRI content verbatim, it does not percent-decode.

    Plan shape: the common case (no illegal char) is a single ``rlike``
    gate returning the column untouched; only offending rows take the
    per-char split+transform encode — still pure JVM codegen, no Python.
    """
    enc = F.array_join(
        F.transform(
            F.split(c, ""),
            lambda ch: F.when(
                ch.rlike(_IRI_ILLEGAL_RE),
                F.concat(F.lit("%"), F.lpad(F.hex(F.ascii(ch)), 2, "0")),
            ).otherwise(ch),
        ),
        "",
    )
    return F.when(c.rlike(_IRI_ILLEGAL_RE), enc).otherwise(c)


def _node_term(c: Column, entity_iri: str) -> Column:
    """Subject/entity-object serialization: bare entity ids go under
    the entity prefix; absolute IRIs (page-URL subjects of the mention
    triples) stay their own IRI; anything else falls back to the
    entity prefix (a relative id)."""
    return (
        F.when(
            c.rlike(_ENTITY_RE),
            F.concat(F.lit("<" + entity_iri), c, F.lit(">")),
        )
        .when(
            c.rlike(_ABS_IRI_RE),
            F.concat(F.lit("<"), _iri_safe(c), F.lit(">")),
        )
        .otherwise(F.concat(F.lit("<" + entity_iri), _iri_safe(c), F.lit(">")))
    )


def _escape_literal(c: Column) -> Column:
    # ECHAR escapes, backslash first so later passes don't double-escape
    c = F.replace(c, F.lit("\\"), F.lit("\\\\"))
    c = F.replace(c, F.lit('"'), F.lit('\\"'))
    c = F.replace(c, F.lit("\n"), F.lit("\\n"))
    c = F.replace(c, F.lit("\r"), F.lit("\\r"))
    return c


# split a segment immediately BEFORE every \uXXXX / \UXXXXXXXX escape,
# except between a high-surrogate escape and its LOW-surrogate partner
# (keeps a real pair in one segment so it decodes as one astral
# codepoint — foreign dumps that spell astral chars as UTF-16 pairs are
# spec-dubious but real).  The pair guard requires BOTH sides (r7): a
# plain trailing lookbehind also glued a LONE high surrogate to whatever
# escape followed it, and the combined segment matched no decode branch,
# so a valid escape after a stray \uD8xx passed through verbatim.
_UCHAR_SPLIT = (
    r"(?=\\[uU])"
    r"(?:(?<!\\u[Dd][89ABab][0-9A-Fa-f]{2})|(?!\\u[Dd][C-Fc-f]))"
)
_PAIR_RE = (
    r"^\\u[Dd][89ABab][0-9A-Fa-f]{2}\\u[Dd][C-Fc-f][0-9A-Fa-f]{2}"
)
# lone \uXXXX, guarded against surrogate-range codepoints (a lone
# surrogate is not a Unicode scalar value — left verbatim)
_U4_RE = r"^\\u(?![Dd][89A-Fa-f])[0-9A-Fa-f]{4}"
# \UXXXXXXXX up to U+10FFFF
_U8_RE = r"^\\U(000[0-9A-Fa-f]{5}|0010[0-9A-Fa-f]{4})"


def _chr(cp: Column) -> Column:
    """Codepoint (int column) → its character: 4-byte big-endian hex →
    unhex → UTF-32BE decode.  Pure JVM."""
    return F.decode(F.unhex(F.lpad(F.hex(cp), 8, "0")), "UTF-32")


def _decode_uchar(s: Column) -> Column:
    """Decode W3C UCHAR escapes (``\\uXXXX`` / ``\\UXXXXXXXX``) in a
    segment known to contain no escaped backslash.  Malformed escapes
    (wrong digit count, lone surrogates, > U+10FFFF) pass through
    verbatim rather than corrupting the line."""
    parts = F.split(s, _UCHAR_SPLIT)

    def dec(p: Column) -> Column:
        hx = lambda pos, n: F.conv(  # noqa: E731
            F.substring(p, pos, n), 16, 10
        ).cast("long")
        pair_cp = (
            (hx(3, 4) - F.lit(0xD800)) * F.lit(0x400)
            + (hx(9, 4) - F.lit(0xDC00))
            + F.lit(0x10000)
        )
        return (
            F.when(
                p.rlike(_PAIR_RE),
                F.concat(_chr(pair_cp), F.substring(p, 13, 1 << 20)),
            )
            .when(
                p.rlike(_U8_RE),
                F.concat(
                    F.decode(F.unhex(F.substring(p, 3, 8)), "UTF-32"),
                    F.substring(p, 11, 1 << 20),
                ),
            )
            .when(
                p.rlike(_U4_RE),
                F.concat(_chr(hx(3, 4)), F.substring(p, 7, 1 << 20)),
            )
            .otherwise(p)
        )

    return F.when(
        s.rlike(r"\\[uU]"), F.array_join(F.transform(parts, dec), "")
    ).otherwise(s)


def _unescape_literal(c: Column) -> Column:
    # Sequential replace CANNOT unescape correctly (wire ``\\n`` — an
    # escaped backslash then a literal n — would see its tail rewritten
    # by the ``\n`` pass).  Exact inverse instead: split on DOUBLE
    # backslashes (so segments contain only genuine single-char
    # escapes), unescape each segment — the FULL ECHAR set (tbnrf"')
    # plus UCHAR codepoint escapes — rejoin with a single backslash.
    segs = F.split(c, r"\\\\")

    def fix(s: Column) -> Column:
        # ECHAR first, UCHAR second: a UCHAR may decode TO a backslash
        # (``\\u005C`` then ``n`` is backslash + n, not newline), so the
        # two-char ECHAR replaces must never see UCHAR output; no ECHAR
        # result is a backslash, so the reverse interference is
        # impossible (and ECHAR escapes can't overlap ``\\uXXXX`` text).
        for esc, ch in (
            ("\\n", "\n"),
            ("\\r", "\r"),
            ("\\t", "\t"),
            ("\\b", "\b"),
            ("\\f", "\f"),
            ('\\"', '"'),
            ("\\'", "'"),
        ):
            s = F.replace(s, F.lit(esc), F.lit(ch))
        return _decode_uchar(s)

    return F.array_join(F.transform(segs, fix), "\\")


def ntriples_line(
    subj: Column,
    pred: Column,
    obj: Column,
    entity_iri: str = ENTITY_IRI,
    prop_iri: str = PROP_DIRECT_IRI,
) -> Column:
    """One N-Triples line; entity-shaped objects (``^[QPL]\\d+$``)
    become IRIs, absolute-IRI objects (page URLs — e.g. sitelink /
    mention targets) serialize as IRIs exactly like subjects do, and
    everything else is a quoted escaped literal."""
    obj_term = (
        F.when(
            obj.rlike(_ENTITY_RE),
            F.concat(F.lit("<" + entity_iri), obj, F.lit(">")),
        )
        .when(
            obj.rlike(_ABS_IRI_RE),
            F.concat(F.lit("<"), _iri_safe(obj), F.lit(">")),
        )
        .otherwise(F.concat(F.lit('"'), _escape_literal(obj), F.lit('"')))
    )
    return F.concat(
        _node_term(subj, entity_iri), F.lit(" "),
        F.lit("<" + prop_iri), _iri_safe(pred), F.lit("> "),
        obj_term,
        F.lit(" ."),
    )


def to_ntriples(
    triples: DataFrame,
    entity_iri: str = ENTITY_IRI,
    prop_iri: str = PROP_DIRECT_IRI,
) -> DataFrame:
    """(subj, pred, obj) → 1-column ``line`` DataFrame of N-Triples."""
    t = triples.filter(
        F.col("subj").isNotNull()
        & F.col("pred").isNotNull()
        & F.col("obj").isNotNull()
    )
    return t.select(
        ntriples_line(
            F.col("subj"), F.col("pred"), F.col("obj"), entity_iri, prop_iri
        ).alias("line")
    )


def write_ntriples(
    triples: DataFrame,
    path: str,
    compression: str | None = "gzip",
    entity_iri: str = ENTITY_IRI,
    prop_iri: str = PROP_DIRECT_IRI,
) -> None:
    """Write the export as (compressed) text part-files — one file per
    partition, so export parallelism = scan parallelism."""
    w = to_ntriples(triples, entity_iri, prop_iri).write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.text(path)


# term grammar for the reader — the full W3C N-Triples surface, not
# just what OUR writer emits, so foreign dumps (e.g. Wikidata's own
# RDF exports) parse too:
#   subject    IRI <...> | blank node _:label
#   predicate  IRI <...>
#   object     IRI | blank node | literal, where a literal is
#              "..." (ECHAR-aware: ends at the first quote not escaped,
#              "([^"\\]|\\.)*" handles odd backslash runs exactly)
#              optionally tagged @lang or typed ^^<datatype-iri>
_LINE_RE = (
    r"^\s*(?:<([^>]*)>|(_:\S+))\s+<([^>]*)>\s+"
    r"(?:<([^>]*)>|(_:\S+)|\"((?:[^\"\\]|\\.)*)\""
    r"(?:@([A-Za-z][A-Za-z0-9\-]*)|\^\^<([^>]*)>)?)\s*\.\s*$"
)
# capture groups: 1 subj-iri, 2 subj-bnode, 3 pred-iri,
#                 4 obj-iri, 5 obj-bnode, 6 obj-literal, 7 lang, 8 dtype


def read_ntriples(
    spark_or_df,
    path: str | None = None,
    entity_iri: str = ENTITY_IRI,
    prop_iri: str = PROP_DIRECT_IRI,
    with_meta: bool = False,
) -> DataFrame:
    """Parse N-Triples text back to (subj, pred, obj) — the IRI
    prefixes are stripped back to bare ids; literal objects unescape;
    blank nodes keep their ``_:label`` spelling.  Language tags and
    literal datatypes (``"x"@en`` / ``"1"^^<xsd:int>``) parse rather
    than reject the line; by default they are dropped from ``obj`` (our
    triples model is untyped strings), with ``with_meta=True`` they
    surface as extra ``lang`` / ``datatype`` columns.  Accepts (spark,
    path) or a 1-column DataFrame of lines.  Malformed lines are
    dropped (regexp mismatch), never fatal — the per-row-error rule
    every 100 TB reader here follows; comment lines (``# ...``) and
    blank lines fall out the same way."""
    if path is not None:
        lines = spark_or_df.read.text(path).withColumnRenamed("value", "line")
    else:
        lines = spark_or_df
    c = F.col("line")
    m = lambda i: F.regexp_extract(c, _LINE_RE, i)  # noqa: E731
    parsed = lines.select(
        m(1).alias("_si"), m(2).alias("_sb"), m(3).alias("_p"),
        m(4).alias("_oi"), m(5).alias("_ob"), m(6).alias("_ol"),
        m(7).alias("_lang"), m(8).alias("_dtype"),
        c.rlike(_LINE_RE).alias("_ok"),
        # non-participating groups extract as "": our ids/bnodes are
        # never empty, so non-empty selects the branch; the empty
        # literal "" correctly falls through to the literal arm
        (m(4) != "").alias("_obj_is_iri"),
        (m(5) != "").alias("_obj_is_bnode"),
    ).filter(F.col("_ok"))
    strip = lambda col, pref: F.when(  # noqa: E731
        col.startswith(pref), F.substring(col, len(pref) + 1, 1 << 20)
    ).otherwise(col)
    out = parsed.select(
        F.when(F.col("_sb") != "", F.col("_sb"))
        .otherwise(strip(F.col("_si"), entity_iri))
        .alias("subj"),
        strip(F.col("_p"), prop_iri).alias("pred"),
        F.when(F.col("_obj_is_iri"), strip(F.col("_oi"), entity_iri))
        .when(F.col("_obj_is_bnode"), F.col("_ob"))
        .otherwise(_unescape_literal(F.col("_ol")))
        .alias("obj"),
        F.when(F.col("_lang") != "", F.col("_lang")).alias("lang"),
        F.when(F.col("_dtype") != "", F.col("_dtype")).alias("datatype"),
    )
    return out if with_meta else out.select("subj", "pred", "obj")
