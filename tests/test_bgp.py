"""BGP pattern-match engine (plans/bgp.py) — the generalization of the
reference's wdq2.pl point query (wdq2.pl:347-406) to conjunctive
triple-pattern queries."""

import pytest
from pyspark.sql import functions as F

from wikidata_dump_processor_spark.plans.bgp import (
    match_patterns,
    parse_bgp,
)

TRIPLES = [
    # (subj, pred, obj)
    ("Q1", "P31", "Q5"),
    ("Q2", "P31", "Q5"),
    ("Q3", "P31", "Q55"),
    ("Q1", "P19", "Q90"),
    ("Q2", "P19", "Q64"),
    ("Q90", "P31", "Q515"),
    ("Q64", "P31", "Q515"),
    ("Q3", "P19", "Q90"),
    ("Q7", "P279", "Q7"),          # self-loop
    ("Q8", "P106", None),          # null object: never binds a join var
    ("Q90", "P1082", "125000"),
]


@pytest.fixture(scope="module")
def triples(spark):
    return spark.createDataFrame(
        TRIPLES, "subj string, pred string, obj string"
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_single_pattern_point_query(triples):
    # the reference's wdq2.pl shape: all triples of one subject
    out = match_patterns(triples, [("Q1", "?p", "?o")])
    assert out.columns == ["o", "p"]  # sorted variable names
    assert _rows(out) == [("Q5", "P31"), ("Q90", "P19")]


def test_two_pattern_join(triples):
    out = match_patterns(
        triples, [("?x", "P31", "Q5"), ("?x", "P19", "?place")]
    )
    assert out.columns == ["place", "x"]
    assert _rows(out) == [("Q64", "Q2"), ("Q90", "Q1")]


def test_three_pattern_chain(triples):
    # humans, their birthplace, and the birthplace's class
    out = match_patterns(
        triples,
        [("?x", "P31", "Q5"), ("?x", "P19", "?pl"), ("?pl", "P31", "?cls")],
    )
    got = {tuple(r.asDict()[v] for v in ("x", "pl", "cls")) for r in out.collect()}
    assert got == {("Q1", "Q90", "Q515"), ("Q2", "Q64", "Q515")}


def test_parse_bgp_string_form(triples):
    out = match_patterns(triples, "?x P31 Q5 . ?x P19 ?place")
    assert len(_rows(out)) == 2
    assert parse_bgp("?a P31 ?b") == [("?a", "P31", "?b")]
    with pytest.raises(ValueError):
        parse_bgp("?a P31")
    with pytest.raises(ValueError):
        parse_bgp(" . ")


def test_repeated_var_within_pattern(triples):
    out = match_patterns(triples, [("?x", "P279", "?x")])
    assert _rows(out) == [("Q7",)]


def test_all_constant_pattern_rejected(triples):
    with pytest.raises(ValueError, match="binds no variable"):
        match_patterns(triples, [("Q1", "P31", "Q5")])


def test_disconnected_product_gated(triples):
    pats = [("?x", "P31", "Q5"), ("?y", "P279", "?y")]
    with pytest.raises(ValueError, match="disconnected"):
        match_patterns(triples, pats)
    out = match_patterns(triples, pats, allow_product=True)
    assert _rows(out) == [("Q1", "Q7"), ("Q2", "Q7")]


def test_filters_apply_when_bound(triples):
    out = match_patterns(
        triples,
        [("?x", "P31", "Q5"), ("?x", "P19", "?place")],
        filters=["place = 'Q90'", "x rlike '^Q'"],
    )
    assert _rows(out) == [("Q90", "Q1")]


def test_null_never_binds_join_var(triples):
    # Q8's P106 object is NULL; joining through ?o must drop it
    out = match_patterns(
        triples, [("?s", "P106", "?o"), ("?o", "P31", "?c")]
    )
    assert _rows(out) == []
    # ...but a non-join variable surfaces the NULL binding like SQL would
    out2 = match_patterns(triples, [("?s", "P106", "?o")])  # cols (o, s)
    assert _rows(out2) == [(None, "Q8")]


def test_duplicate_bindings_deduped_and_bag_mode(spark):
    dup = spark.createDataFrame(
        [("Q1", "P31", "Q5"), ("Q1", "P31", "Q5")],
        "subj string, pred string, obj string",
    )
    assert _rows(match_patterns(dup, [("?x", "P31", "Q5")])) == [("Q1",)]
    assert _rows(
        match_patterns(dup, [("?x", "P31", "Q5")], distinct=False)
    ) == [("Q1",), ("Q1",)]


def test_limit(triples):
    out = match_patterns(triples, [("?x", "P31", "?c")], limit=2)
    assert out.count() == 2


def test_constant_filters_pushed_to_parquet_scan(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    spark.createDataFrame(
        TRIPLES, "subj string, pred string, obj string"
    ).write.parquet(p)
    t = spark.read.parquet(p)
    out = match_patterns(t, [("?x", "P31", "Q5"), ("?x", "P19", "?pl")])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # each pattern's constants reach the scan as pushed filters
    assert "PushedFilters" in plan
    assert "EqualTo(pred,P31)" in plan and "EqualTo(obj,Q5)" in plan
    assert "EqualTo(pred,P19)" in plan


def test_matches_duckdb_self_join(spark, triples, tmp_path):
    import duckdb

    p = str(tmp_path / "t2.parquet")
    triples.write.parquet(p)
    got = _rows(
        match_patterns(
            triples,
            [("?x", "P31", "Q5"), ("?x", "P19", "?pl"), ("?pl", "P31", "?c")],
        ).select("c", "pl", "x")
    )
    want = sorted(
        tuple(r)
        for r in duckdb.sql(
            f"""
            SELECT DISTINCT t3.obj AS c, t2.obj AS pl, t1.subj AS x
            FROM read_parquet('{p}/*.parquet') t1
            JOIN read_parquet('{p}/*.parquet') t2 ON t1.subj = t2.subj
            JOIN read_parquet('{p}/*.parquet') t3 ON t2.obj = t3.subj
            WHERE t1.pred='P31' AND t1.obj='Q5' AND t2.pred='P19'
              AND t3.pred='P31'
            """
        ).fetchall()
    )
    assert got == want


# ---------------------------------------------------------------------------
# property paths (P279+/P279*) — plans/bgp._path_df over
# operators/graph.transitive_closure_*
# ---------------------------------------------------------------------------

PATH_TRIPLES = [
    ("Q1", "P279", "Q2"),
    ("Q2", "P279", "Q3"),
    ("Q2", "P279", "Q4"),
    ("Q5", "P279", "Q6"),   # 2-cycle
    ("Q6", "P279", "Q5"),
    ("Q1", "P31", "Q9"),    # other predicate: never traversed
]


@pytest.fixture(scope="module")
def path_triples(spark):
    return spark.createDataFrame(
        PATH_TRIPLES, "subj string, pred string, obj string"
    )


def test_path_forward_seeded(path_triples):
    plus = match_patterns(path_triples, [("Q1", "P279+", "?a")])
    assert _rows(plus) == [("Q2",), ("Q3",), ("Q4",)]
    star = match_patterns(path_triples, [("Q1", "P279*", "?a")])
    assert _rows(star) == [("Q1",), ("Q2",), ("Q3",), ("Q4",)]


def test_path_backward_seeded(path_triples):
    plus = match_patterns(path_triples, [("?x", "P279+", "Q3")])
    assert _rows(plus) == [("Q1",), ("Q2",)]
    star = match_patterns(path_triples, [("?x", "P279*", "Q3")])
    assert _rows(star) == [("Q1",), ("Q2",), ("Q3",)]


def test_path_cycle_terminates(path_triples):
    out = match_patterns(path_triples, [("Q5", "P279+", "?a")])
    assert _rows(out) == [("Q5",), ("Q6",)]  # cycle reaches itself


def test_path_both_variables_full_closure(path_triples):
    out = match_patterns(path_triples, [("?x", "P279+", "?a")])
    assert out.columns == ["a", "x"]
    got = {(r["x"], r["a"]) for r in out.collect()}
    assert got == {
        ("Q1", "Q2"), ("Q1", "Q3"), ("Q1", "Q4"),
        ("Q2", "Q3"), ("Q2", "Q4"),
        ("Q5", "Q6"), ("Q5", "Q5"), ("Q6", "Q5"), ("Q6", "Q6"),
    }


def test_path_cycle_membership_var(path_triples):
    out = match_patterns(path_triples, [("?x", "P279+", "?x")])
    assert _rows(out) == [("Q5",), ("Q6",)]


def test_path_joins_with_plain_pattern(path_triples):
    # ?x P31 Q9 pins Q1; its * ancestors chain through the closure
    out = match_patterns(
        path_triples, [("?x", "P31", "Q9"), ("?x", "P279+", "?anc")]
    )
    got = {(r["x"], r["anc"]) for r in out.collect()}
    assert got == {("Q1", "Q2"), ("Q1", "Q3"), ("Q1", "Q4")}


def test_path_string_form_and_var_modifier_rejected(path_triples):
    out = match_patterns(path_triples, "Q1 P279+ ?a")
    assert len(_rows(out)) == 3
    with pytest.raises(ValueError, match="variable predicate"):
        match_patterns(path_triples, [("?x", "?p+", "?y")])


def test_closure_pairs_gate(path_triples):
    from wikidata_dump_processor_spark.operators.graph import (
        transitive_closure_pairs,
    )

    e = path_triples.filter("pred = 'P279'").selectExpr(
        "subj as src", "obj as dst"
    )
    with pytest.raises(ValueError, match="max_pairs"):
        transitive_closure_pairs(e, max_pairs=2).collect()


# ---------------------------------------------------------------------------
# inverse paths / MINUS / stats-driven join order
# ---------------------------------------------------------------------------


def test_inverse_path_plain(triples):
    # ?a ^P19 ?b  ==  ?b P19 ?a  (who was born at ?a)
    out = match_patterns(triples, [("?pl", "^P19", "?x")])
    got = {(r["pl"], r["x"]) for r in out.collect()}
    assert got == {("Q90", "Q1"), ("Q64", "Q2"), ("Q90", "Q3")}
    # constant endpoint on the inverse side
    out2 = match_patterns(triples, [("Q90", "^P19", "?x")])
    assert _rows(out2) == [("Q1",), ("Q3",)]


def test_inverse_path_with_closure_matches_python_reverse_walk(spark):
    chain = spark.createDataFrame(
        [("Q1", "P279", "Q2"), ("Q2", "P279", "Q3"), ("Q3", "P279", "Q4"),
         ("Q9", "P279", "Q2")],
        "subj string, pred string, obj string",
    )
    # descendants of Q3 via the inverse closure: ?d such that d P279+ Q3
    out = match_patterns(chain, [("Q3", "^P279+", "?d")])
    # python oracle: walk reversed edges from Q3
    rev = {}
    for s, _p, o in chain.collect():
        rev.setdefault(o, set()).add(s)
    want, frontier = set(), {"Q3"}
    while frontier:
        nxt = set().union(*(rev.get(f, set()) for f in frontier)) - want
        want |= nxt
        frontier = nxt
    assert {r["d"] for r in out.collect()} == want == {"Q1", "Q2", "Q9"}
    # ^P279* adds the zero-length binding of the constant itself
    out2 = match_patterns(chain, [("Q3", "^P279*", "?d")])
    assert {r["d"] for r in out2.collect()} == want | {"Q3"}


def test_inverse_path_invalid_forms(triples):
    with pytest.raises(ValueError, match="inverse-path"):
        match_patterns(triples, [("?a", "^?p", "?b")])
    with pytest.raises(ValueError, match="inverse-path"):
        match_patterns(triples, [("?a", "^^P31", "?b")])


def test_minus_removes_compatible_bindings(triples):
    # entities with a class, MINUS those that have a birthplace —
    # the reference's no_P31 report shape inverted
    out = match_patterns(
        triples,
        [("?x", "P31", "?c")],
        minus=[[("?x", "P19", "?pl")]],
    )
    got = {(r["c"], r["x"]) for r in out.collect()}
    assert got == {("Q515", "Q90"), ("Q515", "Q64")}
    assert out.columns == ["c", "x"]  # minus-internal ?pl not projected


def test_minus_requires_shared_variable(triples):
    with pytest.raises(ValueError, match="MINUS"):
        match_patterns(
            triples, [("?x", "P31", "?c")], minus=[[("?y", "P19", "?pl")]]
        )


def test_minus_after_optional_null_rows_survive(triples):
    # SQL anti-join NULL semantics: a row whose shared var is NULL from
    # an unmatched OPTIONAL is never removed by MINUS on that var
    out = match_patterns(
        triples,
        [("?x", "P31", "?c")],
        optional=[[("?x", "P19", "?pl")]],
        minus=[[("?pl", "P1082", "?pop")]],
    )
    got = {(r["x"], r["pl"]) for r in out.collect()}
    # Q1/Q3 dropped (pl=Q90 has P1082); Q2 kept (Q64 has none);
    # Q90/Q64 kept (pl NULL)
    assert got == {("Q2", "Q64"), ("Q90", None), ("Q64", None)}


STATS_TRIPLES = (
    # mega-predicate: P31 -> Q5 for many subjects
    [(f"Q{i}", "P31", "Q5") for i in range(1, 41)]
    # tiny predicate: one row
    + [("Q1", "P214", "viaf-1")]
    # P19 edges for a few
    + [(f"Q{i}", "P19", "Q90") for i in range(1, 6)]
)


@pytest.fixture(scope="module")
def stats_setup(spark):
    from wikidata_dump_processor_spark.operators.triples import (
        predicate_stats,
    )

    t = spark.createDataFrame(
        STATS_TRIPLES, "subj string, pred string, obj string"
    )
    return t, predicate_stats(t, exact=True)


def test_order_patterns_stats_vs_static(stats_setup):
    from wikidata_dump_processor_spark.plans.bgp import (
        _order_patterns,
        estimate_pattern_rows,
    )

    t, stats_df = stats_setup
    stats = {
        r["pred"]: (r["n_triples"], r["n_subj"], r["n_obj"])
        for r in stats_df.collect()
    }
    pats = [("?x", "P31", "Q5"), ("?x", "P214", "?v")]
    # static heuristic: constant-object P31 scores higher -> mega first
    static_order = [p for p, _c in _order_patterns(pats)]
    assert static_order[0] == ("?x", "P31", "Q5")
    # stats: P31->Q5 matches 40 rows, P214 matches 1 -> tiny first
    stats_order = [p for p, _c in _order_patterns(pats, stats)]
    assert stats_order[0] == ("?x", "P214", "?v")
    # estimates are what the ordering claims
    assert estimate_pattern_rows(("?x", "P31", "Q5"), stats) == 40.0
    assert estimate_pattern_rows(("?x", "P214", "?v"), stats) == 1.0
    # unseen predicate estimates 0 (maximally selective)
    assert estimate_pattern_rows(("?x", "P999", "?v"), stats) == 0.0


def test_path_closure_inflation_orders_plain_pattern_first(stats_setup):
    """r7 (VERDICT r6 #6): a single-endpoint `+` closure pattern must
    not win the first-leaf slot over an equally selective PLAIN pattern
    — its output is the reachable set, not one hop.  Without the
    inflation the base estimates tie and the closure could seed the
    tree; with it the plain pattern orders first."""
    from wikidata_dump_processor_spark.plans.bgp import (
        PATH_CLOSURE_INFLATION,
        _order_patterns,
        estimate_pattern_rows,
    )

    t, stats_df = stats_setup
    stats = {
        r["pred"]: (r["n_triples"], r["n_subj"], r["n_obj"])
        for r in stats_df.collect()
    }
    base = estimate_pattern_rows(("?x", "P19", "Q90"), stats)
    est_path = estimate_pattern_rows(("?x", "P19+", "Q90"), stats)
    # the UNINFLATED estimate ties the plain predicate (the round-6
    # behavior this guards against)...
    assert estimate_pattern_rows(
        ("?x", "P19+", "Q90"), stats, path_inflation=1.0
    ) == base
    # ...and the default inflates it past the plain pattern
    assert est_path == base * PATH_CLOSURE_INFLATION > base
    order = [
        p for p, _c in _order_patterns(
            [("?x", "P19+", "Q90"), ("?x", "P19", "Q90")], stats
        )
    ]
    assert order[0] == ("?x", "P19", "Q90")
    # both-variables path patterns still order last (seeded walk)
    assert estimate_pattern_rows(("?x", "P19+", "?a"), stats) == float("inf")


def test_stats_order_changes_join_tree_not_result(stats_setup):
    t, stats_df = stats_setup
    pats = [("?x", "P31", "Q5"), ("?x", "P214", "?v")]
    res_static = match_patterns(t, pats)
    res_stats = match_patterns(t, pats, stats=stats_df)
    assert _rows(res_static) == _rows(res_stats) == [("viaf-1", "Q1")]
    # the optimized join tree's LEFT (first) leaf carries the selective
    # P214 filter under stats, the mega P31 filter under the static rule
    def first_pred(df):
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        i214, i31 = plan.find("P214"), plan.find("P31")
        assert i214 >= 0 and i31 >= 0
        return "P214" if i214 < i31 else "P31"

    assert first_pred(res_static) == "P31"
    assert first_pred(res_stats) == "P214"


def test_stats_accepts_dataframe_and_dict(stats_setup):
    t, stats_df = stats_setup
    stats = {
        r["pred"]: (r["n_triples"], r["n_subj"], r["n_obj"])
        for r in stats_df.collect()
    }
    pats = [("?x", "P31", "Q5"), ("?x", "P19", "?pl")]
    assert _rows(match_patterns(t, pats, stats=stats_df)) == _rows(
        match_patterns(t, pats, stats=stats)
    )


# ---------------------------------------------------------------------------
# OPTIONAL / UNION
# ---------------------------------------------------------------------------


def test_optional_left_join(triples):
    out = match_patterns(
        triples,
        [("?x", "P31", "?c")],
        optional=[[("?x", "P19", "?pl")]],
    )
    got = {(r["x"], r["c"], r["pl"]) for r in out.collect()}
    assert got == {
        ("Q1", "Q5", "Q90"),
        ("Q2", "Q5", "Q64"),
        ("Q3", "Q55", "Q90"),
        ("Q90", "Q515", None),   # OPTIONAL did not match: NULL-extended
        ("Q64", "Q515", None),
    }


def test_optional_must_share_a_variable(triples):
    with pytest.raises(ValueError, match="OPTIONAL"):
        match_patterns(
            triples, [("?x", "P31", "?c")], optional=[[("?y", "P19", "?pl")]]
        )


def test_optional_filter_applies_after_join(triples):
    out = match_patterns(
        triples,
        [("?x", "P31", "?c")],
        optional=["?x P19 ?pl"],
        filters=["pl = 'Q90' OR pl IS NULL"],
    )
    got = {(r["x"], r["pl"]) for r in out.collect()}
    assert got == {("Q1", "Q90"), ("Q3", "Q90"), ("Q90", None), ("Q64", None)}


def test_chained_optional_extends_null_rows(triples):
    """SPARQL compatibility: a variable an earlier OPTIONAL left NULL is
    compatible with ANY later binding — the second group must extend the
    NULL-extended rows, not skip them on a never-matching NULL key
    (ADVICE round-5 finding).

    Required ?x P31 ?c; opt1 binds ?pl for Q1/Q2/Q3 only; opt2 walks
    ?pl P1082 ?pop.  Q90/Q64 rows have pl=NULL after opt1, so EVERY
    (pl', pop') binding of opt2 is compatible with them and they fan
    out with pl bound by opt2 (here: pl=Q90, pop=125000)."""
    out = match_patterns(
        triples,
        [("?x", "P31", "?c")],
        optional=[
            [("?x", "P19", "?pl")],
            [("?pl", "P1082", "?pop")],
        ],
    )
    got = {(r["x"], r["c"], r["pl"], r["pop"]) for r in out.collect()}
    assert got == {
        ("Q1", "Q5", "Q90", "125000"),
        ("Q2", "Q5", "Q64", None),       # pl bound, opt2 unmatched: NULL
        ("Q3", "Q55", "Q90", "125000"),
        # pl was NULL -> compatible with opt2's only binding (Q90, ...)
        ("Q90", "Q515", "Q90", "125000"),
        ("Q64", "Q515", "Q90", "125000"),
    }


def test_chained_optional_mixed_keys_keeps_required_equi(triples):
    # a group sharing one required-bound var (?x) and one maybe-NULL var
    # (?pl) must still equi-match on ?x while treating ?pl as compatible
    out = match_patterns(
        triples,
        [("?x", "P31", "?c")],
        optional=[
            [("?x", "P19", "?pl")],
            [("?x", "P19", "?pl"), ("?pl", "P1082", "?pop")],
        ],
    )
    got = {(r["x"], r["pl"], r["pop"]) for r in out.collect()}
    assert got == {
        ("Q1", "Q90", "125000"),
        ("Q2", "Q64", None),     # Q64 has no P1082: group unmatched
        ("Q3", "Q90", "125000"),
        ("Q90", None, None),     # x=Q90 has no P19: group unmatched
        ("Q64", None, None),
    }


def test_union_branches(triples):
    from wikidata_dump_processor_spark.plans.bgp import match_union

    out = match_union(triples, ["?x P31 Q5", "?x P31 Q55"])
    assert _rows(out) == [("Q1",), ("Q2",), ("Q3",)]


def test_union_missing_vars_null(triples):
    from wikidata_dump_processor_spark.plans.bgp import match_union

    out = match_union(
        triples, ["?x P31 Q5", "?x P19 ?pl"], filters=["x != 'Q3'"]
    )
    assert sorted(out.columns) == ["pl", "x"]
    got = {(r["x"], r["pl"]) for r in out.collect()}
    assert got == {
        ("Q1", None), ("Q2", None),            # branch 1: pl unbound
        ("Q1", "Q90"), ("Q2", "Q64"),          # branch 2
    }


# ---------------------------------------------------------------------------
# review-pass regressions: UNION filter semantics, zero-length universe,
# seeded both-variables paths
# ---------------------------------------------------------------------------


def test_union_filter_on_branch_unbound_var_drops_rows(triples):
    # SQL WHERE-over-UNION: branch 1 never binds ?pl, so its rows carry
    # pl=NULL and the filter must DROP them, not pass them through
    from wikidata_dump_processor_spark.plans.bgp import match_union

    out = match_union(
        triples, ["?x P31 Q5", "?x P19 ?pl"], filters=["pl = 'Q90'"]
    )
    got = {(r["x"], r["pl"]) for r in out.collect()}
    assert got == {("Q1", "Q90"), ("Q3", "Q90")}


def test_union_mixed_filter_does_not_crash(triples):
    # a filter naming one branch-bound and one branch-unbound variable
    # must apply post-union, not explode in analysis
    from wikidata_dump_processor_spark.plans.bgp import match_union

    out = match_union(
        triples,
        ["?x P31 Q5", "?x P19 ?pl"],
        filters=["x != 'Q3' AND pl = 'Q90'"],
    )
    got = {(r["x"], r["pl"]) for r in out.collect()}
    assert got == {("Q1", "Q90")}


def test_zero_length_path_matches_nodes_without_pred_edges(triples):
    # SPARQL: a zero-length path matches ANY term — Q90/Q64 have no
    # P279 edges at all but must still bind (x, x) under P279*
    out = match_patterns(
        triples, [("?x", "P31", "Q515"), ("?x", "P279*", "?a")]
    )
    got = {(r["x"], r["a"]) for r in out.collect()}
    assert got == {("Q90", "Q90"), ("Q64", "Q64")}


def test_unseeded_star_path_ranges_over_all_terms(triples):
    # standalone ?x P279* ?a: zero-length bindings cover every term of
    # the dataset (subj ∪ obj, nulls out), plus the predicate's closure
    out = match_patterns(triples, [("?x", "P279*", "?a")])
    got = {(r["x"], r["a"]) for r in out.collect()}
    terms = {t for s, _p, o in TRIPLES for t in (s, o) if t is not None}
    assert got == {(t, t) for t in terms}  # only P279 edge is Q7's self-loop


def test_bound_path_walks_seeded_not_full_closure(path_triples, monkeypatch):
    # a both-variables path whose endpoint is already bound must walk
    # SEEDED from the bindings — the full-closure evaluator (with its
    # max_pairs gate) must never run
    import wikidata_dump_processor_spark.operators.graph as G

    def boom(*a, **k):
        raise AssertionError("full closure must not run for a bound path")

    monkeypatch.setattr(G, "transitive_closure_pairs", boom)
    out = match_patterns(
        path_triples, [("?x", "P31", "Q9"), ("?x", "P279+", "?anc")]
    )
    got = {(r["x"], r["anc"]) for r in out.collect()}
    assert got == {("Q1", "Q2"), ("Q1", "Q3"), ("Q1", "Q4")}
    star = match_patterns(
        path_triples, [("?x", "P31", "Q9"), ("?x", "P279*", "?anc")]
    )
    got = {(r["x"], r["anc"]) for r in star.collect()}
    assert got == {("Q1", "Q1"), ("Q1", "Q2"), ("Q1", "Q3"), ("Q1", "Q4")}


def test_bound_path_seeds_from_object_side(path_triples):
    # first pattern binds ?anc={Q2}; the path then walks BACKWARD from
    # the object-side bindings: x P279+ Q2 == {Q1}
    out = match_patterns(
        path_triples, [("?anc", "P279", "Q3"), ("?x", "P279+", "?anc")]
    )
    got = {(r["anc"], r["x"]) for r in out.collect()}
    assert got == {("Q2", "Q1")}
    star = match_patterns(
        path_triples, [("?anc", "P279", "Q3"), ("?x", "P279*", "?anc")]
    )
    got = {(r["anc"], r["x"]) for r in star.collect()}
    assert got == {("Q2", "Q1"), ("Q2", "Q2")}


def test_minus_guard_on_multivar_nullable_shared(triples):
    # r7 (ADVICE r6): a MINUS group sharing an OPTIONAL-nullable var
    # PLUS another bound var is the shape where SQL anti-join NULL
    # semantics silently diverge from SPARQL's compatibility rule —
    # must refuse loudly.  The single-shared-var form (exercised by
    # test_minus_after_optional_null_rows_survive) agrees with SPARQL
    # exactly and stays allowed.
    with pytest.raises(ValueError, match="OPTIONAL-nullable"):
        match_patterns(
            triples,
            [("?x", "P31", "?c")],
            optional=[[("?x", "P19", "?pl")]],
            minus=[[("?x", "P19", "?pl")]],
        )
