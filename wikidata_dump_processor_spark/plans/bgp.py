"""Basic-graph-pattern (BGP) queries over the triples table.

The reference answers one fixed question shape per script: ``wdq2.pl
Q42`` prints all triples OF one entity (wdq2.pl:347-406), wdq3.pl walks
one property (wdq3.pl:1-60).  The general form of both is a conjunctive
triple-pattern query — SPARQL's BGP fragment — over the (subj, pred,
obj) table: each pattern is a row template with constants and
``?variables``, and the answer is every consistent variable binding.
``match_patterns`` compiles such a query into a DataFrame plan; every
reference point/walk query is the 1- or 2-pattern special case.

Compilation is deliberately relational, not graph-imperative:

* each pattern becomes ONE scan of the triples table with its constant
  positions as filters — Catalyst pushes them into the parquet scan,
  and because the canonical triples table is partitioned by ``pred``
  (plans/pipeline.py), a constant-predicate pattern (the overwhelmingly
  common case — ``?x P31 Q5``) reads exactly one partition directory;
* patterns are joined on their shared variables, ordered greedily by a
  bound-term selectivity score (constant subject > constant object >
  constant predicate — mirroring the reference's id-first access path),
  so the running bindings relation starts as small as the query allows;
* the running bindings side is usually tiny relative to the triples
  scan on the other side; AQE's runtime size stats convert those joins
  to broadcast-hash automatically, which beats any static guess here
  because pattern selectivity varies by orders of magnitude with the
  constants' frequencies (P31→Q5 is a mega-key; P227→<one id> is one
  row).  On the ``triples_by_subj`` bucketed layout the subj-keyed
  probes additionally plan with no Exchange on the triples side;
* disconnected pattern groups are a cartesian product of their binding
  sets; that is almost always a query bug at 100 TB, so it raises
  unless ``allow_product=True``.

FILTER expressions (any Spark SQL boolean over the variables) are
applied as soon as every variable they mention is bound — pushed inside
the join tree, not bolted on the end.

No part of this runs driver-side Python per row: the whole query is one
Catalyst plan of scans + joins, fully codegen'd.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

POSITIONS = ("subj", "pred", "obj")

# selectivity weight of a constant in each position: a constant subject
# pins one entity (the reference's wdq2 access path), a constant object
# pins a value's backlinks, a constant predicate alone still matches a
# whole property partition
_POS_WEIGHT = {"subj": 4, "obj": 2, "pred": 1}


def is_var(term: str) -> bool:
    return isinstance(term, str) and term.startswith("?")


def parse_bgp(text: str) -> list[tuple[str, str, str]]:
    """``"?x P31 Q5 . ?x P19 ?place"`` → pattern list.  Patterns are
    separated by ``.``; terms by whitespace."""
    patterns = []
    for clause in text.split("."):
        clause = clause.strip()
        if not clause:
            continue
        terms = clause.split()
        if len(terms) != 3:
            raise ValueError(f"pattern needs 3 terms: {clause!r}")
        patterns.append(tuple(terms))
    if not patterns:
        raise ValueError("empty BGP")
    return patterns


def _score(pattern) -> int:
    return sum(
        _POS_WEIGHT[pos]
        for pos, term in zip(POSITIONS, pattern)
        if not is_var(term)
    )


def _pattern_vars(pattern) -> set[str]:
    return {t[1:] for t in pattern if is_var(t)}


def _pattern_df(triples: DataFrame, pattern) -> DataFrame:
    """One pattern → scan with constant filters, projected to its
    variables.  A variable repeated inside one pattern (``?x P279 ?x``)
    becomes an equality filter."""
    df = triples
    proj: dict[str, str] = {}
    for pos, term in zip(POSITIONS, pattern):
        if is_var(term):
            v = term[1:]
            if not v:
                raise ValueError(f"empty variable name in {pattern!r}")
            if v in proj:
                df = df.filter(F.col(pos) == F.col(proj[v]))
            else:
                proj[v] = pos
        else:
            df = df.filter(F.col(pos) == F.lit(term))
    if not proj:
        raise ValueError(
            f"pattern {pattern!r} binds no variable; all-constant "
            "existence tests are not supported"
        )
    return df.select(*[F.col(pos).alias(v) for v, pos in proj.items()])


def _filter_vars(expr: str, known: set[str]) -> set[str]:
    toks = set(re.findall(r"[A-Za-z_][A-Za-z0-9_]*", expr))
    return toks & known


def match_patterns(
    triples: DataFrame,
    patterns: list[tuple[str, str, str]] | str,
    filters: list[str] | tuple[str, ...] = (),
    distinct: bool = True,
    allow_product: bool = False,
    limit: int | None = None,
) -> DataFrame:
    """Evaluate a conjunctive triple-pattern query; one output column
    per distinct ``?variable``.

    ``triples`` needs columns (subj, pred, obj); extra columns are
    ignored.  ``patterns`` is a list of 3-term tuples (or a ``parse_bgp``
    string); a term starting with ``?`` is a variable, anything else an
    exact constant.  NULL never binds a join variable (standard inner
    join semantics on both engines); non-join variables may surface
    NULL bindings exactly as a SQL self-join would.
    """
    if isinstance(patterns, str):
        patterns = parse_bgp(patterns)
    if not patterns:
        raise ValueError("empty BGP")
    all_vars: set[str] = set()
    for p in patterns:
        if len(p) != 3:
            raise ValueError(f"pattern needs 3 terms: {p!r}")
        all_vars |= _pattern_vars(p)

    base = triples.select(*POSITIONS)
    remaining = list(patterns)
    # greedy start: most-bound pattern
    start = max(remaining, key=_score)
    remaining.remove(start)
    out = _pattern_df(base, start)
    bound = _pattern_vars(start)

    pending_filters = list(filters)

    def _apply_ready_filters(df: DataFrame) -> DataFrame:
        nonlocal pending_filters
        still = []
        for fx in pending_filters:
            if _filter_vars(fx, all_vars) <= bound:
                df = df.filter(F.expr(fx))
            else:
                still.append(fx)
        pending_filters = still
        return df

    out = _apply_ready_filters(out)

    while remaining:
        connected = [p for p in remaining if _pattern_vars(p) & bound]
        if connected:
            nxt = max(connected, key=_score)
            remaining.remove(nxt)
            rhs = _pattern_df(base, nxt)
            shared = sorted(_pattern_vars(nxt) & bound)
            out = out.join(rhs, on=shared, how="inner")
        else:
            if not allow_product:
                raise ValueError(
                    "disconnected pattern group (cartesian product); "
                    "pass allow_product=True to run it anyway"
                )
            nxt = max(remaining, key=_score)
            remaining.remove(nxt)
            out = out.crossJoin(_pattern_df(base, nxt))
        bound |= _pattern_vars(nxt)
        out = _apply_ready_filters(out)

    # every variable is bound once the loop drains, so every filter has
    # been applied by now (a filter naming an unknown column fails in
    # analysis at its application site, with Spark's own error)
    assert not pending_filters, pending_filters

    out = out.select(*sorted(bound))
    if distinct:
        out = out.distinct()
    if limit is not None:
        out = out.limit(limit)
    return out
