"""URL canonicalization for web-corpus dedup keys.

A crawl sees the same document under many spellings — scheme/host case,
default ports, fragments, tracking parameters, trailing slashes.
``canonical_url`` collapses them to one deterministic spelling so
exact-dedup (operators/dedup.py) and the per-url pipeline invariants key
on the document, not the spelling.  Entirely JVM expressions
(``parse_url`` + higher-order functions) — a narrow map, no shuffle, no
Python; at 100 TB this runs inside the same scan stage as the consumer.

Steps (the common normalizations used by web-dedup pipelines):
  * scheme and host lowercased; optional ``www.`` prefix stripped
  * fragment dropped
  * default ports dropped (http:80, https:443); other ports kept
  * tracking query params dropped (utm_*, gclid, fbclid, msclkid, ref,
    fbsrc), remaining params sorted for order-independence
  * trailing slash stripped from non-root paths; empty path -> "/"

Malformed URLs (spaces, missing scheme, garbage) must NOT abort a 100 TB
scan: under Spark 4 ANSI mode ``parse_url`` raises INVALID_URL per row, so
every component read here goes through ``try_parse_url`` (NULL on invalid).
An unparseable URL canonicalizes to NULL; ``with_canonical_url`` then keys
it on the RAW url string, so distinct garbage URLs never collapse into one
dedup bucket (xxhash64(NULL) is the constant 42).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TRACKING_PARAM_RE = r"^(utm_[a-z]+|gclid|fbclid|msclkid|ref|fbsrc)="


def canonical_url(url: Column, strip_www: bool = True) -> Column:
    proto = F.lower(F.try_parse_url(url, F.lit("PROTOCOL")))
    host = F.lower(F.try_parse_url(url, F.lit("HOST")))
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    authority = F.try_parse_url(url, F.lit("AUTHORITY"))
    port = F.regexp_extract(authority, r":(\d+)$", 1)
    keep_port = (port != "") & ~(
        ((proto == "http") & (port == "80"))
        | ((proto == "https") & (port == "443"))
    )
    path = F.try_parse_url(url, F.lit("PATH"))
    path = F.when((path.isNull()) | (path == ""), F.lit("/")).otherwise(path)
    # trailing slash off non-root paths ("/a/" -> "/a"; "/" stays)
    path = F.regexp_replace(path, r"(.)/$", "$1")
    query = F.try_parse_url(url, F.lit("QUERY"))
    params = F.filter(
        F.split(F.coalesce(query, F.lit("")), "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    qnorm = F.array_join(F.array_sort(params), "&")
    return F.concat(
        proto,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(qnorm != "", F.concat(F.lit("?"), qnorm)).otherwise(F.lit("")),
    )


def with_canonical_url(
    df: DataFrame,
    url_col: str = "url",
    out_col: str = "canonical_url",
    strip_www: bool = True,
) -> DataFrame:
    """Attach the canonical spelling and its 64-bit dedup key.

    The key falls back to the raw url when canonicalization yields NULL
    (scheme-less / malformed spellings): hashing NULL directly would give
    every unparseable URL the same constant key (xxhash64(NULL) == 42) and
    exact dedup would collapse them into one document."""
    c = canonical_url(F.col(url_col), strip_www=strip_www)
    return df.withColumn(out_col, c).withColumn(
        out_col + "_key", F.xxhash64(F.coalesce(c, F.col(url_col)))
    )
