"""ID classification / parsing expressions (SURVEY.md §2.3 P7).

wdq1.pl:507-526 / wdq2.pl:262-281: regex dispatch over entity ids.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def id_kind(id_col: Column) -> Column:
    """'property' | 'item' | 'lexeme' | 'invalid' from the id shape."""
    return (
        F.when(id_col.rlike(r"^P\d+$"), "property")
        .when(id_col.rlike(r"^Q\d+$"), "item")
        .when(id_col.rlike(r"^L\d+$"), "lexeme")
        .otherwise("invalid")
    )


def id_num(id_col: Column) -> Column:
    """Numeric part of a Q/L/P id (null for invalid) — the sort/bucket key
    (sort_items.pl:6, wdq2.pl:264-270)."""
    return F.regexp_extract(id_col, r"^[PQL](\d+)$", 1).try_cast("long")
