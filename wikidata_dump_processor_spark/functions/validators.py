"""Value validators (SURVEY.md §2.3 P11/P12) — QA operators over triple
objects, reproducing the reference's post-hoc property tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# DOI semantics from doi-count.pl:12-14, 53-141
DOI_PREFIX_RE = r"^10\.[1-9]\d{3,4}$"
DOI_DENYLIST = ["10.38", "10.475", "10.530", "10.581", "10.5072"]


def doi_verdict(value: Column) -> Column:
    """Classify a DOI string: strip HDL:/DOI: prefixes (doi-count.pl:56-60),
    split prefix/suffix on the first '/', verdicts good/denylisted/
    bad_prefix/no_suffix (doi-count.pl:63-141)."""
    v = F.regexp_replace(F.trim(value), r"^(?i)(HDL:|DOI:)\s*", "")
    prefix = F.substring_index(v, "/", 1)
    # suffix = everything after the first slash
    suffix = F.when(
        F.instr(v, "/") > 0, F.substring(v, F.instr(v, "/") + 1, F.lit(1 << 20))
    ).otherwise(F.lit(""))
    return (
        F.when(F.substring_index(prefix, ".", 2).isin(DOI_DENYLIST), "denylisted")
        .when(~prefix.rlike(DOI_PREFIX_RE), "bad_prefix")
        .when(suffix == "", "no_suffix")
        .when(suffix.rlike(r"^[\w.\-/()<>;:]+$"), "good")
        .otherwise("odd_chars")
    )


def doi_report(triples: DataFrame, pred: str = "P356", cap: int = 25000) -> DataFrame:
    """Per-prefix DOI counts in descending count order with the
    reference's 25 000-row report cap (doi-count.pl:135,145,210,224-258)."""
    d = triples.filter(F.col("pred") == pred).select(
        "subj", F.col("obj").alias("doi"), doi_verdict(F.col("obj")).alias("verdict")
    )
    return (
        d.groupBy(F.substring_index("doi", "/", 1).alias("prefix"), "verdict")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "prefix")
        .limit(cap)
    )


def write_html_report(df: DataFrame, path: str, cap: int = 25000, title: str = "report") -> int:
    """K4 (doi-count.pl:168-287): the QA report as an HTML table, capped
    at the reference's 25 000 rows (doi-count.pl:210).  Streams through
    toLocalIterator — a report-format shim for capped outputs, not a
    data-plane sink.  Returns the row count written."""
    import html as _html

    cols = df.columns
    n = 0
    with open(path, "w") as f:
        f.write(f"<html><head><title>{_html.escape(title)}</title></head><body>\n")
        f.write(f"<h1>{_html.escape(title)}</h1>\n<table border=1>\n<tr>")
        f.write("".join(f"<th>{_html.escape(c)}</th>" for c in cols))
        f.write("</tr>\n")
        for row in df.limit(cap).toLocalIterator():
            f.write("<tr>")
            f.write(
                "".join(
                    f"<td>{_html.escape('' if v is None else str(v))}</td>" for v in row
                )
            )
            f.write("</tr>\n")
            n += 1
        f.write(f"</table>\n<p>{n} rows (cap {cap})</p>\n</body></html>\n")
    return n


def value_format_check(
    triples: DataFrame, pred: str, pattern: str = r"^[0-7][0-9A-Za-z]{21}$"
) -> DataFrame:
    """P1902_check.pl:34-66 model: per-value regex verdict + histogram of
    value counts per subject."""
    d = triples.filter(F.col("pred") == pred)
    verdicts = d.groupBy(
        F.when(F.col("obj").isNull(), "undefined")
        .when(F.col("obj").rlike(pattern), "ok")
        .otherwise("bad")
        .alias("verdict")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    per_subj = (
        d.groupBy("subj").agg(F.count(F.lit(1)).alias("n_values"))
        .groupBy("n_values").agg(F.count(F.lit(1)).alias("n_subjects"))
    )
    return verdicts, per_subj
