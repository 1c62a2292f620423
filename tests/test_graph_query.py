"""BGP matcher (operators/graph_query): join semantics, selectivity
ordering, repeated variables, existence guards, disconnected products."""

from __future__ import annotations

import pytest

from netbase_spark.session import get_spark


@pytest.fixture(scope="module")
def spark():
    s = get_spark(app="test_graph_query", cpus=4, shuffle_partitions=4,
                  driver_memory="4g")
    yield s


@pytest.fixture(scope="module")
def triples(spark):
    rows = [
        ("berlin", 1, "city"), ("paris", 1, "city"), ("rhine", 1, "river"),
        ("berlin", 2, "germany"), ("paris", 2, "france"),
        ("germany", 1, "country"), ("france", 1, "country"),
        ("berlin", 3, "berlin"),  # self-loop for the repeated-var case
    ]
    return spark.createDataFrame(rows, "subj string, rel int, obj string")


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_two_pattern_join(spark, triples):
    from netbase_spark.operators.graph_query import bgp_match

    out = bgp_match(
        triples, [("?x", 1, "city"), ("?x", 2, "?c")]
    )
    assert out.columns == ["x", "c"]
    assert _rows(out) == [("berlin", "germany"), ("paris", "france")]


def test_three_pattern_chain(spark, triples):
    from netbase_spark.operators.graph_query import bgp_match

    out = bgp_match(
        triples,
        [("?x", 1, "city"), ("?x", 2, "?c"), ("?c", 1, "country")],
    )
    assert _rows(out) == [("berlin", "germany"), ("paris", "france")]


def test_repeated_variable_in_one_pattern(spark, triples):
    from netbase_spark.operators.graph_query import bgp_match

    out = bgp_match(triples, [("?x", 3, "?x")])
    assert _rows(out) == [("berlin",)]


def test_constant_only_existence_guard(spark, triples):
    from netbase_spark.operators.graph_query import bgp_match

    hit = bgp_match(
        triples, [("?x", 1, "city"), ("rhine", 1, "river")]
    )
    assert _rows(hit) == [("berlin",), ("paris",)]
    miss = bgp_match(
        triples, [("?x", 1, "city"), ("rhine", 1, "mountain")]
    )
    assert miss.count() == 0


def test_disconnected_components_cross(spark, triples):
    from netbase_spark.operators.graph_query import bgp_match

    out = bgp_match(
        triples, [("?x", 1, "river"), ("?y", 1, "country")]
    )
    assert _rows(out) == [("rhine", "france"), ("rhine", "germany")]


def test_variable_predicate(spark, triples):
    from netbase_spark.operators.graph_query import bgp_match

    out = bgp_match(triples, [("berlin", "?p", "?o")])
    assert out.columns == ["p", "o"]
    assert _rows(out) == [(1, "city"), (2, "germany"), (3, "berlin")]


def test_empty_patterns_raise(spark, triples):
    from netbase_spark.operators.graph_query import bgp_match

    with pytest.raises(ValueError):
        bgp_match(triples, [])
    with pytest.raises(ValueError):
        bgp_match(triples, [("?x", 1)])


def test_selectivity_order_defers_full_scan(spark, triples):
    """A fully-variable pattern listed FIRST must still evaluate last
    (most-constant-first ordering): the result is the same, and the
    first join step filters on the constant pattern."""
    from netbase_spark.operators.graph_query import bgp_match

    out = bgp_match(
        triples, [("?x", "?p", "?o"), ("?x", 1, "city")]
    )
    assert set(out.columns) == {"x", "p", "o"}
    got = _rows(out.select("x", "p", "o"))
    assert ("berlin", 1, "city") in got and ("paris", 2, "france") in got
    assert all(x in ("berlin", "paris") for x, _, _ in got)


def test_optional_pattern_binds_or_null(spark, triples):
    from netbase_spark.operators.graph_query import bgp_match

    out = bgp_match(
        triples, [("?x", 1, "city")], optional=[("?x", 2, "?c")]
    )
    assert out.columns == ["x", "c"]
    got = {(r.x, r.c) for r in out.collect()}
    assert got == {("berlin", "germany"), ("paris", "france")}
    # an optional that never matches leaves nulls, keeps the row
    out2 = bgp_match(
        triples, [("?x", 1, "river")], optional=[("?x", 2, "?c")]
    )
    assert {(r.x, r.c) for r in out2.collect()} == {("rhine", None)}


def test_optional_type_conflict_yields_typed_nulls(spark, triples):
    from netbase_spark.operators.graph_query import bgp_match

    # ?x is a string (subj); using it in the int rel slot can't match,
    # so ?o is all-null but still an output column
    out = bgp_match(
        triples, [("?x", 1, "city")], optional=[("berlin", "?x", "?o")]
    )
    assert out.columns == ["x", "o"]
    assert {(r.x, r.o) for r in out.collect()} == {
        ("berlin", None), ("paris", None)
    }


def test_not_exists_filters_bindings(spark, triples):
    from netbase_spark.operators.graph_query import bgp_match

    # cities without a rel-3 self-loop: berlin has one, paris doesn't
    out = bgp_match(
        triples, [("?x", 1, "city")], not_exists=[("?x", 3, "?y")]
    )
    assert {r.x for r in out.collect()} == {"paris"}
    # impossible not_exists (string var in rel slot) removes nothing
    out2 = bgp_match(
        triples, [("?x", 1, "city")], not_exists=[("berlin", "?x", "?y")]
    )
    assert {r.x for r in out2.collect()} == {"berlin", "paris"}


def test_optional_not_exists_validation(spark, triples):
    from netbase_spark.operators.graph_query import bgp_match

    with pytest.raises(ValueError):  # no shared variable
        bgp_match(triples, [("?x", 1, "city")], optional=[("?y", 2, "?c")])
    with pytest.raises(ValueError):  # correlated optionals forbidden
        bgp_match(
            triples, [("?x", 1, "city")],
            optional=[("?x", 2, "?c"), ("?c", 1, "?x")],
        )
    with pytest.raises(ValueError):  # not_exists must share too
        bgp_match(triples, [("?x", 1, "city")], not_exists=[("?a", 1, "?b")])


def test_output_columns_follow_user_pattern_order(spark, triples):
    """Column order = first appearance in the USER's pattern list, even
    when selectivity reordering executes another pattern first."""
    from netbase_spark.operators.graph_query import bgp_match

    out = bgp_match(triples, [("?a", "?p", "?b"), ("?b", 1, "country")])
    assert out.columns == ["a", "p", "b"]
    out2 = bgp_match(
        triples, [("?x", "?r", "?y")], optional=[("?y", 1, "?k")]
    )
    assert out2.columns == ["x", "r", "y", "k"]


def test_optional_multiplicity_set_semantics(spark):
    """distinct=False: duplicate triples in the store must not multiply
    required-block rows through an OPTIONAL leg (set-of-triples
    semantics — the optional step dedupes on its kept columns)."""
    from pyspark.sql import functions as F

    from netbase_spark.operators.graph_query import bgp_match

    rows = [("u1", 1, "click"), ("u1", 2, "d5"), ("u1", 2, "d5")]
    df = spark.createDataFrame(rows, "subj string, rel int, obj string")
    out = bgp_match(
        df, [("?u", 1, "click")], optional=[("?u", 2, "?d")], distinct=False
    )
    assert out.count() == 1  # not multiplied by the duplicated triple


def test_grouped_optional_correlates_inside_group(spark, triples):
    """An optional GROUP (list of patterns) evaluates as one sub-BGP:
    its internal shared variable must correlate across the group's
    patterns."""
    from netbase_spark.operators.graph_query import bgp_match

    # city ?x OPTIONAL { ?x in ?c . ?c kindof country }
    out = bgp_match(
        triples,
        [("?x", 1, "city")],
        optional=[[("?x", 2, "?c"), ("?c", 1, "?k")]],
    )
    assert out.columns == ["x", "c", "k"]
    got = {tuple(r) for r in out.collect()}
    assert got == {
        ("berlin", "germany", "country"),
        ("paris", "france", "country"),
    }
    # group whose second leg can't match -> the whole group misses,
    # nulls for BOTH group vars (correlated, unlike two separate entries)
    out2 = bgp_match(
        triples,
        [("?x", 1, "river")],
        optional=[[("?x", 2, "?c"), ("?c", 1, "?k")]],
    )
    assert {tuple(r) for r in out2.collect()} == {("rhine", None, None)}


def test_path_plus_bounded_closure(spark):
    from netbase_spark.operators.graph_query import Path, bgp_match

    rows = [
        ("a", 1, "b"), ("b", 1, "c"), ("c", 1, "d"), ("d", 1, "e"),
        ("x", 2, "a"),
    ]
    df = spark.createDataFrame(rows, "subj string, rel int, obj string")
    out = bgp_match(df, [("a", Path(1, "+", max_hops=2), "?v")])
    assert {r["v"] for r in out.collect()} == {"b", "c"}
    # unbounded-ish (default 10) reaches the chain end
    out2 = bgp_match(df, [("a", Path(1, "+"), "?v")])
    assert {r["v"] for r in out2.collect()} == {"b", "c", "d", "e"}
    # joins with other patterns on the path variables
    out3 = bgp_match(
        df, [("?s", 2, "a"), ("a", Path(1, "+", 3), "?v")]
    )
    assert out3.columns == ["s", "v"]
    assert {tuple(r) for r in out3.collect()} == {
        ("x", "b"), ("x", "c"), ("x", "d"),
    }


def test_path_star_includes_identity_and_cycles(spark):
    from netbase_spark.operators.graph_query import Path, bgp_match

    rows = [("a", 1, "b"), ("b", 1, "a"), ("b", 2, "m")]
    df = spark.createDataFrame(rows, "subj string, rel int, obj string")
    # cycle: a+ reaches itself
    plus = bgp_match(df, [("a", Path(1, "+", 4), "?v")])
    assert {r["v"] for r in plus.collect()} == {"a", "b"}
    # star: identity over every node in the graph
    star = bgp_match(df, [("?n", Path(1, "*", 4), "?n")])
    assert {r["n"] for r in star.collect()} == {"a", "b", "m"}
    # star in an optional leg
    out = bgp_match(
        df, [("?x", 2, "m")], optional=[("?x", Path(3, "*", 2), "?y")]
    )
    # rel 3 has no edges: star still yields identity (x itself)
    assert {tuple(r) for r in out.collect()} == {("b", "b")}


def test_path_validation(spark, triples):
    from netbase_spark.operators.graph_query import Path, bgp_match

    with pytest.raises(ValueError):
        Path(1, "!")
    with pytest.raises(ValueError):
        Path(1, "+", 0)
    with pytest.raises(ValueError):  # Path outside the rel slot
        bgp_match(triples, [(Path(1, "+"), 1, "?x")])
    # type-incompatible path rel -> empty result, correct schema
    out = bgp_match(triples, [("?a", Path("not-an-int", "+"), "?b")])
    assert out.columns == ["a", "b"] and out.count() == 0


def test_path_alternation_and_inverse(spark):
    from netbase_spark.operators.graph_query import Path, bgp_match

    rows = [
        ("a", 1, "b"), ("b", 4, "c"), ("c", 1, "d"),   # alternating rels
        ("x", 1, "y"),
    ]
    df = spark.createDataFrame(rows, "subj string, rel int, obj string")
    # single-rel + stops at the rel boundary...
    one = bgp_match(df, [("a", Path(1, "+", 4), "?v")])
    assert {r["v"] for r in one.collect()} == {"b"}
    # ...alternation (1|4)+ walks through
    alt = bgp_match(df, [("a", Path([1, 4], "+", 4), "?v")])
    assert {r["v"] for r in alt.collect()} == {"b", "c", "d"}
    # inverse: ^1+ from b reaches a
    inv = bgp_match(df, [("b", Path(1, "+", 4, inverse=True), "?v")])
    assert {r["v"] for r in inv.collect()} == {"a"}
    # inverse + alternation compose
    inv_alt = bgp_match(
        df, [("d", Path([1, 4], "+", 4, inverse=True), "?v")]
    )
    assert {r["v"] for r in inv_alt.collect()} == {"a", "b", "c"}
    with pytest.raises(ValueError):
        Path([], "+")


def test_path_zero_or_one_and_negated_set(spark):
    from netbase_spark.operators.graph_query import NotRel, Path, bgp_match

    rows = [("a", 1, "b"), ("b", 1, "c"), ("a", 2, "m"), ("b", 3, "x")]
    df = spark.createDataFrame(rows, "subj string, rel int, obj string")
    # zero-or-one: a itself plus its direct rel-1 successor, never c
    opt = bgp_match(df, [("a", Path(1, "?"), "?v")])
    assert {r["v"] for r in opt.collect()} == {"a", "b"}
    # negated property set: edges whose rel is NOT 1
    neg = bgp_match(df, [("?s", NotRel([1]), "?o")])
    assert {tuple(r) for r in neg.collect()} == {("a", "m"), ("b", "x")}
    # inverse negated set
    negi = bgp_match(df, [("m", NotRel([1, 3], inverse=True), "?o")])
    assert {r["o"] for r in negi.collect()} == {"a"}
    with pytest.raises(ValueError):
        NotRel([])
    with pytest.raises(ValueError):  # NotRel outside the rel slot
        bgp_match(df, [(NotRel([1]), 1, "?x")])
    # a type-incompatible entry can never match a rel, so it drops out
    # of the negated set (same constant-type rule as Path alternatives)
    neg_mixed = bgp_match(df, [("?s", NotRel([1, "oops"]), "?o")])
    assert {tuple(r) for r in neg_mixed.collect()} == {("a", "m"), ("b", "x")}
    # an ALL-incompatible negated set negates nothing: every edge matches
    neg_none = bgp_match(df, [("?s", NotRel(["oops"]), "?o")])
    assert neg_none.count() == len(rows)


def test_path_alternation_partial_type_mismatch(spark):
    """An alternation with ONE type-incompatible rel keeps matching the
    compatible alternatives (SPARQL a|b semantics); an all-incompatible
    '+' path is the empty short-circuit, while '*' still yields the
    identity pairs."""
    from netbase_spark.operators.graph_query import Path, bgp_match

    rows = [("a", 1, "b"), ("b", 1, "c")]
    df = spark.createDataFrame(rows, "subj string, rel int, obj string")
    mixed = bgp_match(df, [("a", Path([1, "nope"], "+", 3), "?v")])
    assert {r["v"] for r in mixed.collect()} == {"b", "c"}
    dead = bgp_match(df, [("a", Path(["nope"], "+", 3), "?v")])
    assert dead.count() == 0 and dead.columns == ["v"]
    star = bgp_match(df, [("a", Path(["nope"], "*", 3), "?v")])
    assert {r["v"] for r in star.collect()} == {"a"}


def test_values_block(spark, triples):
    from netbase_spark.operators.graph_query import bgp_match

    # plain seed list on a shared var
    out = bgp_match(
        triples,
        [("?x", 1, "city"), ("?x", 2, "?c")],
        values=[{"?x": "berlin"}, {"?x": "rhine"}],
    )
    assert {tuple(r) for r in out.collect()} == {("berlin", "germany")}
    # values supplying a NEW var (tag), incl. an UNDEF row
    out2 = bgp_match(
        triples,
        [("?x", 1, "city")],
        values=[
            {"?x": "berlin", "?tag": "capital"},
            {"?x": "paris"},                      # ?tag UNDEF -> null
            {"?x": None, "?tag": "wildcard"},     # ?x UNDEF -> every city
        ],
    )
    assert out2.columns == ["x", "tag"]
    got = {tuple(r) for r in out2.collect()}
    assert got == {
        ("berlin", "capital"), ("paris", None),
        ("berlin", "wildcard"), ("paris", "wildcard"),
    }
    # type-incompatible value rows match nothing
    out3 = bgp_match(
        triples, [("?x", 1, "city")], values=[{"?x": 42}]
    )
    assert out3.count() == 0
    # values vars are shareable by optional entries
    out4 = bgp_match(
        triples,
        [("?x", 1, "city")],
        values=[{"?x": "berlin"}],
        optional=[("?x", 2, "?c")],
    )
    assert {tuple(r) for r in out4.collect()} == {("berlin", "germany")}
    with pytest.raises(ValueError):  # must share a var
        bgp_match(triples, [("?x", 1, "city")], values=[{"?y": "q"}])
    with pytest.raises(ValueError):  # all-UNDEF new var
        bgp_match(
            triples, [("?x", 1, "city")],
            values=[{"?x": "berlin", "?t": None}],
        )


def test_path_star_on_disjoint_subj_obj_domains(spark):
    """subj and obj columns of different types: '*'/'?'/'+' paths keep
    their single-hop tier (identity and multi-hop composition are
    unrepresentable across disjoint domains, NOT a query-wide
    conflict)."""
    from netbase_spark.operators.graph_query import Path, bgp_match

    rows = [("a", 5, 10), ("b", 5, 20), ("a", 6, 30)]
    df = spark.createDataFrame(rows, "subj string, rel int, obj long")
    for op in ("+", "*", "?"):
        out = bgp_match(df, [("?x", Path(5, op, 4), "?y")])
        assert {tuple(r) for r in out.collect()} == {("a", 10), ("b", 20)}, op


def test_path_strict_bound_raises_instead_of_truncating(spark):
    """Path bound honesty (round-4 advice): default max_hops silently
    truncates (the reference's depth-bounded semantics, documented);
    strict=True verifies convergence at the bound and raises
    PathBoundExceeded when deeper pairs exist — on BOTH closure
    branches (driver BFS and distributed frontier loop)."""
    from netbase_spark.operators.graph_query import (
        Path, PathBoundExceeded, bgp_match, path_closure,
    )

    # a 15-deep chain: n0 -> n1 -> ... -> n15
    rows = [(f"n{i}", 1, f"n{i+1}") for i in range(15)]
    df = spark.createDataFrame(rows, "subj string, rel int, obj string")

    # default: silent truncation at max_hops=10 (documented semantics)
    got = bgp_match(df, [("n0", Path(1, "+", max_hops=10), "?v")])
    assert got.count() == 10

    # strict + too-small bound: loud, not silent — driver branch
    with pytest.raises(PathBoundExceeded):
        path_closure(df, Path(1, "+", max_hops=10, strict=True))
    # distributed branch (driver_threshold=0 forces the frontier loop)
    with pytest.raises(PathBoundExceeded):
        path_closure(
            df, Path(1, "+", max_hops=10, strict=True), driver_threshold=0
        ).count()

    # strict + sufficient bound: equal to the unbounded answer, both
    # branches, and through bgp_match
    ok = bgp_match(df, [("n0", Path(1, "+", max_hops=15, strict=True), "?v")])
    assert ok.count() == 15
    dist = path_closure(
        df, Path(1, "+", max_hops=15, strict=True), driver_threshold=0
    )
    assert dist.where("subj = 'n0'").count() == 15


def test_stats_driven_ordering_flips_adversarial_plan(spark):
    """Round-4 verdict ask #4: with per-rel counts, a huge
    constant-rel pattern (Instance) evaluates AFTER a tiny
    variable-rel or small-rel pattern; without stats the static
    heuristic keeps the old deterministic order.  Results identical
    either way."""
    from netbase_spark.operators.graph_query import (
        NotRel, Path, _ordered_indices, bgp_match, rel_counts,
    )

    INSTANCE, TINY = 1, 2
    # adversarial: both patterns have 2 vars -> static order ties on
    # user order and runs the huge Instance partition first
    pats = [("?x", INSTANCE, "?y"), ("?y", TINY, "?z")]
    stats = {INSTANCE: 10_000_000, TINY: 1_000}
    assert _ordered_indices(pats, None) == [0, 1]
    assert _ordered_indices(pats, stats) == [1, 0]

    # a variable-rel pattern with a constant obj beats a huge constant
    # rel (the verdict's exact inversion case)
    pats2 = [("?a", INSTANCE, "?b"), ("?a", "?r", "rare_const")]
    assert _ordered_indices(pats2, None) == [0, 1]  # fewer vars first
    assert _ordered_indices(pats2, stats) == [1, 0]

    # Path = sum of alternatives; NotRel = total minus negated
    pats3 = [("?a", Path([TINY]), "?b"), ("?a", NotRel([TINY]), "?b")]
    assert _ordered_indices(pats3, stats) == [0, 1]

    # correctness invariance on real data
    rows = (
        [(f"e{i}", INSTANCE, f"c{i % 3}") for i in range(60)]
        + [("c0", TINY, "k")]
    )
    df = spark.createDataFrame(rows, "subj string, rel int, obj string")
    q = [("?x", INSTANCE, "?y"), ("?y", TINY, "?z")]
    plain = bgp_match(df, q)
    statted = bgp_match(df, q, rel_stats=rel_counts(df))
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, statted.collect())
    )
    assert plain.columns == statted.columns
