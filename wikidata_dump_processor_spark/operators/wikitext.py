"""Wiki-text structural analysis (U2: Wiktionary::Text::analyze_wiki_text,
lib/Wiktionary/Text.pm:6-108).

Reference semantics reproduced exactly:
* empty line list -> type 'empty' (Text.pm:12)
* heading lines start with '=' (Text.pm:21); tokens split on whitespace;
  the first and last token must be identical ('==' ... '==') else a
  'heading mismatch' error is recorded and the line skipped
  (Text.pm:24-32); heading level = length of the opening token
* tokens between are words, except '{{macro|...}}' groups — possibly
  paren-wrapped, possibly spanning several tokens until a token ending in
  '}}' (Text.pm:60-90); macro elements split on '|' (Text.pm:98-105)
* type/language remain 'unknown' (the reference never fills them in)

Runs as an Arrow-batched mapInPandas (UDTF-like 1 -> N: one row per
heading) — the pure function is separately importable for tests.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

_MACRO_ONE = re.compile(r"^\(?\{\{(.+)}}\)?")
_MACRO_OPEN = re.compile(r"^\(?\{\{(.+)")
_MACRO_CLOSE = re.compile(r"(.+)}}\)?,?$")


def analyze_heading_tokens(tokens: list[str]) -> tuple[list[str], list[list[str]]]:
    """Text.pm:53-95: words + macro element lists from heading tokens."""
    words: list[str] = []
    macros: list[list[str]] = []
    toks = list(tokens)
    while toks:
        token = toks.pop(0)
        m = _MACRO_ONE.match(token)
        if m:
            macros.append(m.group(1).split("|"))
            continue
        m = _MACRO_OPEN.match(token)
        if m:
            macro = m.group(1)
            while toks:  # find the end of the macro (Text.pm:69-81)
                t2 = toks.pop(0)
                m2 = _MACRO_CLOSE.match(t2)
                if m2:
                    macro += " " + m2.group(1)
                    break
                macro += " " + t2
            macros.append(macro.split("|"))
        else:
            words.append(token)
    return words, macros


def analyze_wiki_text(lines: list[str]) -> dict:
    """Text.pm:6-51 with the heading structure surfaced.

    Returns {type, language, errors: [str], headings: [{level, words,
    macros}]}.
    """
    if not lines:
        return {"type": "empty", "language": "unknown", "errors": [], "headings": []}
    errors: list[str] = []
    headings: list[dict] = []
    for line in lines:
        if not line.startswith("="):
            continue
        tokens = line.split()
        if not tokens:
            continue
        hl_o = tokens[0]
        hl_c = tokens[-1] if len(tokens) > 1 else ""
        mid = tokens[1:-1]
        if hl_o != hl_c:
            errors.append(f"heading mismatch: [{line}] hl_o=[{hl_o}] hl_c=[{hl_c}]")
            continue
        words, macros = analyze_heading_tokens(mid)
        headings.append({"level": len(hl_o), "words": words, "macros": macros})
    return {"type": "unknown", "language": "unknown", "errors": errors, "headings": headings}


WIKITEXT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("doc_type", T.StringType(), False),
        T.StructField("n_errors", T.IntegerType(), False),
        T.StructField("errors", T.ArrayType(T.StringType()), True),
        T.StructField("heading_level", T.IntegerType(), True),
        T.StructField("heading_words", T.ArrayType(T.StringType()), True),
        T.StructField("heading_macros", T.ArrayType(T.ArrayType(T.StringType())), True),
    ]
)


def analyze_pages_wikitext(pages_text: DataFrame, text_col: str = "text") -> DataFrame:
    """(url, text) -> one row per heading (plus one row for heading-less
    docs, level null) with the per-doc error list."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, text in zip(pdf["url"], pdf[text_col]):
                lines = text.split("\n") if isinstance(text, str) and text else []
                res = analyze_wiki_text(lines)
                base = {
                    "url": url,
                    "doc_type": res["type"],
                    "n_errors": len(res["errors"]),
                    "errors": res["errors"],
                }
                if res["headings"]:
                    for h in res["headings"]:
                        rows.append(
                            {
                                **base,
                                "heading_level": h["level"],
                                "heading_words": h["words"],
                                "heading_macros": h["macros"],
                            }
                        )
                else:
                    rows.append(
                        {**base, "heading_level": None, "heading_words": None, "heading_macros": None}
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in WIKITEXT_SCHEMA.fields])

    return pages_text.select("url", text_col).mapInPandas(run, schema=WIKITEXT_SCHEMA)
