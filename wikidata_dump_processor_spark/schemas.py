"""Schemas + static configuration of the KG-construction engine.

Data model per SURVEY.md §1; all semantics cited into /root/reference.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Input table (BASELINE.json input_hint): Common-Crawl-style pages.
# ---------------------------------------------------------------------------
PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# Output of the text-extraction pass (operators/text_extract.py): the page
# frame captured by the reference state machine (wkt1.pl:153-295) plus the
# byte-exact text body.
EXTRACTED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("page_ns", T.StringType(), True),
        T.StructField("page_id", T.StringType(), True),
        T.StructField("rev_id", T.StringType(), True),
        T.StructField("rev_sha1", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        # diag side-channel (wdq1.pl:137-138, 497-503): why a page yielded
        # no text / no entity; null = clean.
        T.StructField("diag", T.StringType(), True),
        # namespace catalog rows seen before <page> (wkt1.pl:176-180);
        # aggregated by ns_usage (A10) into the per-ns use_count table.
        T.StructField(
            "namespaces",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("ns_id", T.StringType(), True),
                        T.StructField("ns_case", T.StringType(), True),
                        T.StructField("ns_name", T.StringType(), True),
                    ]
                )
            ),
            True,
        ),
    ]
)

# ---------------------------------------------------------------------------
# Entity record (SURVEY.md §1.1; wdq1.pl:505-740). `claims` values are
# VARIANT because datavalue.value is polymorphic (scalar string | entity-ref
# | time | coordinate | quantity | monolingual text, Filter.pm:76-108) —
# Spark 4's variant keeps the whole parse/extract path JVM-side.
# ---------------------------------------------------------------------------
LANGVAL = "map<string, struct<language string, value string>>"
ENTITY_DDL = (
    "id string, type string, lastrevid long, datatype string, "
    f"labels {LANGVAL}, descriptions {LANGVAL}, "
    "aliases map<string, array<struct<language string, value string>>>, "
    "claims map<string, array<variant>>, "
    "sitelinks map<string, variant>, "
    f"lemmas {LANGVAL}"
)

# Canonical (subj, pred, obj) triple with per-row lineage back to the source
# page (the reference's line/pos/fo_* columns, wdq1.pl:167-168).
TRIPLES_SCHEMA = T.StructType(
    [
        T.StructField("subj", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("obj", T.StringType(), True),
        T.StructField("src_url", T.StringType(), True),
    ]
)

# ---------------------------------------------------------------------------
# Reference language-preference list (wdq1.pl:38) — order matters (P8).
# ---------------------------------------------------------------------------
LANGS = ["en", "de", "ja", "it", "fr", "nl", "es", "hu", "pl", "mul"]

# ---------------------------------------------------------------------------
# Property filter bank (wdq1.pl:344-409, content='data'): pred -> (label,
# transform).  transform=1 => entity-ref struct is rewritten to Q/P +
# numeric-id (Filter.pm:91-97); transform=0 => structs are JSON-encoded
# (Filter.pm:98-101), scalars pass through.
# ---------------------------------------------------------------------------
FILTER_BANK: dict[str, tuple[str, int]] = {
    # structure
    "P31": ("instance of", 1),
    "P279": ("subclass of", 1),
    "P360": ("is a list of", 1),
    "P361": ("part of", 1),
    "P1269": ("facet of", 1),
    # item identifiers
    "P213": ("ISNI", 0),
    "P227": ("GND identifier", 0),
    "P243": ("OCLC control number", 0),
    "P244": ("LCAuth ID", 0),
    "P2833": ("ARKive ID", 0),
    "P8080": ("Oekumenisches Heiligenlexikon ID", 0),
    # person identifiers
    "P214": ("VIAF identifier", 0),
    "P496": ("ORCID identifier", 0),
    # personal data
    "P569": ("Date of birth", 0),
    "P570": ("Date of death", 0),
    # other
    "P6782": ("ROR ID", 0),
    "P5748": ("Basisklassifikation", 0),
    # geography
    "P625": ("Geo Coordinates", 0),
    "P1566": ("GeoNames ID", 0),
    "P964": ("Austrian municipality key", 0),
    "P1282": ("OSM tag or key", 0),
    # publications
    "P356": ("DOI", 0),
    "P4109": ("URN:NBN", 0),
    "P1662": ("DOI prefix", 0),
    "P850": ("WoRMS-ID for taxa", 0),
    "P3860": ("Wormbase Gene ID", 0),
    "P6678": ("WoRMS source ID", 0),
    "P854": ("reference URL", 0),
    "P212": ("ISBN-13", 0),
    "P236": ("ISSN", 0),
    "P345": ("IMDb identifier", 0),
    "P698": ("PubMed ID", 0),
    "P957": ("ISBN-10", 0),
    "P3035": ("ISBN publisher prefix", 0),
    "P3097": ("ISBN identifier group", 0),
    "P3212": ("ISAN", 0),
    "P935": ("Commons gallery", 0),
    "P373": ("Commons category", 0),
}

# Mention-scan patterns over the raw serialized record — generalization of
# the reference's single hard-coded 'Punivie' scan (wdq1.pl:391, 636-653):
# pred -> case-insensitive regex whose group(1) becomes the object value
# (backslashes stripped afterwards, wdq1.pl:640).
RAW_MENTION_PATTERNS: dict[str, str] = {
    "Punivie": '"([^"]*univie\\.ac\\.at[^"]*)"',
}

# Authority-control predicate set (wdq1.pl:434-437): an item qualifies if
# any of these is claimed, or its P31 (first snak) is Q5 = human
# (wdq1.pl:615-621).
AUTHCTRL_PRED = ["P213", "P214", "P227", "P244", "P496", "P6782"]
# Properties collected onto the authority record (wdq1.pl:437).
AUTHCTRL_PROPS = AUTHCTRL_PRED + ["P19", "P20", "P21", "P31", "P569", "P570"]

# Entity-catalog / alias tables used by mention detection + linking
# (FIXTURES.md B2/B3; reference labels table wdq1.pl:171-174, 770-780).
ALIASES_SCHEMA = T.StructType(
    [
        T.StructField("alias", T.StringType(), False),
        T.StructField("id", T.StringType(), False),
        T.StructField("lang", T.StringType(), True),
        T.StructField("is_primary", T.BooleanType(), True),
    ]
)

MENTIONS_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("surface", T.StringType(), False),
        T.StructField("begin", T.IntegerType(), False),
        T.StructField("end", T.IntegerType(), False),
    ]
)

# Fused extract+mention-scan output (operators/text_extract.py
# ``extract_and_detect``): the extracted page frame plus per-page mention
# hits, produced in ONE Arrow pass over the text column.
EXTRACTED_WITH_MENTIONS_SCHEMA = T.StructType(
    EXTRACTED_SCHEMA.fields
    + [
        T.StructField(
            "mentions",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("surface", T.StringType(), False),
                        T.StructField("begin", T.IntegerType(), False),
                        T.StructField("end", T.IntegerType(), False),
                    ]
                )
            ),
            True,
        )
    ]
)
