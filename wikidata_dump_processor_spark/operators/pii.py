"""PII detection and redaction over the documents table.

A large-scale training-data pipeline scrubs personally identifiable
information from web text before training; this module provides the
standard regex tier — typed match counts and in-place redaction for
emails, IPv4 addresses, SSN-style ids, 16-digit card-like numbers and
NANP-style phone numbers — as pure JVM expressions (``regexp_count`` /
``regexp_replace``), no Python in the row path.

Scale notes (100 TB): both ``pii_counts`` and ``redact_pii`` are a
single narrow projection inside whole-stage codegen — no shuffle, no
UDF, no driver state; ``pii_report`` adds one bounded global aggregate
(#types rows).  The patterns are written in the Java/Python-common
regex subset (character classes, bounded repetition, lookaround) so the
pytest golden oracle runs the IDENTICAL pattern strings through
Python ``re`` (tests/test_training_ops.py).

The redaction order is fixed (email, ipv4, ssn, credit-card, phone):
longer/more-specific digit patterns run before the phone pattern so a
card number is never half-eaten as a phone match.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# type -> (pattern, replacement) in redaction order.  Patterns use only
# constructs with identical semantics in java.util.regex and Python re:
# (?<!...) / (?!...) zero-width guards keep digit runs from matching
# inside longer numbers.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (
        r"(?<![\d.])(?:(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.){3}"
        r"(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])(?![\d.])",
        "<IP>",
    ),
    "ssn": (r"(?<![\d-])\d{3}-\d{2}-\d{4}(?![\d-])", "<SSN>"),
    "credit_card": (
        r"(?<![\d-])\d{4}[ -]?\d{4}[ -]?\d{4}[ -]?\d{4}(?![\d-])",
        "<CARD>",
    ),
    "phone": (
        r"(?<![\d-])(?:\+?1[ .-]?)?\(?\d{3}\)?[ .-]?\d{3}[ .-]?\d{4}(?![\d-])",
        "<PHONE>",
    ),
}


def pii_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc typed PII match counts: one ``pii_<type>_count`` column
    per pattern plus ``pii_total_count``.  Counts are measured on the
    PROGRESSIVELY REDACTED text (same order as ``redact_pii``), so each
    match is attributed to exactly one type and the counts are consistent
    with what redaction would remove — a card number is 1 credit_card
    match, not also 2 phone matches.

    The intermediate redacted texts are STAGED as temp columns (dropped
    on return): folding the replace chain into every count expression
    would re-run pattern j's regex once per downstream count — codegen
    CSE does not deduplicate repeated regex subtrees (the same finding
    as the textstats/decontam staging).  Each temp is referenced by ≥2
    downstream expressions, so CollapseProject keeps the staging."""
    d = docs
    prev: Column = F.col(text_col)
    temp_cols: list[str] = []
    total = F.lit(0)
    names = list(PII_PATTERNS)
    for j, name in enumerate(names):
        pat, repl = PII_PATTERNS[name]
        d = d.withColumn(f"pii_{name}_count", F.regexp_count(prev, F.lit(pat)))
        total = total + F.col(f"pii_{name}_count")
        if j < len(names) - 1:  # the last pattern's redaction is unused
            tc = f"_pii_t{j}"
            d = d.withColumn(tc, F.regexp_replace(prev, pat, repl))
            temp_cols.append(tc)
            prev = F.col(tc)
    return d.withColumn("pii_total_count", total).drop(*temp_cols)


def redact_pii(
    docs: DataFrame,
    text_col: str = "text",
    out_col: str = "text_redacted",
    types: list[str] | None = None,
) -> DataFrame:
    """Typed in-place redaction: every PII match replaced by its
    ``<TYPE>`` placeholder, in the fixed ``PII_PATTERNS`` order.
    ``types`` restricts to a subset (still applied in canonical order)."""
    wanted = set(PII_PATTERNS if types is None else types)
    unknown = wanted - set(PII_PATTERNS)
    if unknown:
        raise ValueError(f"unknown PII types: {sorted(unknown)}")
    t: Column = F.col(text_col)
    for name, (pat, repl) in PII_PATTERNS.items():
        if name in wanted:
            t = F.regexp_replace(t, pat, repl)
    return docs.withColumn(out_col, t)


def pii_report(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-level PII audit: per type, total matches and #docs with at
    least one match, plus an ``any`` row.  Bounded output (len(PII_PATTERNS)
    + 1 rows) — safe to collect into a pipeline manifest."""
    counted = pii_counts(docs, text_col)
    aggs = []
    for name in PII_PATTERNS:
        c = F.col(f"pii_{name}_count")
        aggs += [
            F.sum(c).alias(f"{name}_matches"),
            F.count(F.when(c > 0, 1)).alias(f"{name}_docs"),
        ]
    aggs += [
        F.sum("pii_total_count").alias("any_matches"),
        F.count(F.when(F.col("pii_total_count") > 0, 1)).alias("any_docs"),
        F.count(F.lit(1)).alias("total_docs"),
    ]
    wide = counted.agg(*aggs)
    # unpivot to (pii_type, matches, docs) for a stable narrow report
    names = list(PII_PATTERNS) + ["any"]
    pairs = ", ".join(f"'{n}', {n}_matches, {n}_docs" for n in names)
    return wide.selectExpr(
        f"stack({len(names)}, {pairs}) AS (pii_type, matches, docs)",
        "total_docs",
    )
