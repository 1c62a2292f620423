"""include/exclude display-filter semantics (src/webserver.cpp:580-620,
src/console.cpp:435-458; exercised by testInclude src/tests.cpp:1555)."""

from pyspark.sql import functions as F

from netbase_spark.operators.display import (
    EXCLUDE_REL,
    GLOBAL_EXCLUDE_NODE,
    INCLUDE_REL,
    add_view_rule,
    visible_statements,
)
from netbase_spark.relations import ATTRIBUTE, RANGE, TYPE


def _triples(spark, rows):
    return spark.createDataFrame(rows, "subj string, rel int, obj string")


def test_exclude_hides_matching_statements_for_owner_only(spark):
    t = _triples(
        spark,
        [
            ("hamburg", TYPE, "city"),
            ("hamburg", ATTRIBUTE, "harbor"),
            ("kiel", ATTRIBUTE, "harbor"),
            ("hamburg", EXCLUDE_REL, "harbor"),
        ],
    )
    vis = {(r.subj, r.rel, r.obj) for r in visible_statements(t).collect()}
    # hamburg's harbor row hidden, kiel's untouched, rule row never shown
    assert ("hamburg", ATTRIBUTE, "harbor") not in vis
    assert ("kiel", ATTRIBUTE, "harbor") in vis
    assert ("hamburg", TYPE, "city") in vis
    assert not any(r == EXCLUDE_REL for (_, r, _) in vis)


def test_global_exclude_applies_to_every_subject(spark):
    t = _triples(
        spark,
        [
            ("hamburg", ATTRIBUTE, "harbor"),
            ("kiel", ATTRIBUTE, "harbor"),
            (GLOBAL_EXCLUDE_NODE, EXCLUDE_REL, "harb"),  # substring match
        ],
    )
    vis = visible_statements(t).collect()
    assert vis == []


def test_include_whitelists_only_matching_statements(spark):
    t = _triples(
        spark,
        [
            ("hamburg", TYPE, "city"),
            ("hamburg", ATTRIBUTE, "harbor"),
            ("kiel", TYPE, "city"),
            ("hamburg", INCLUDE_REL, "type"),  # matches pred name 'Type'
        ],
    )
    vis = {(r.subj, r.rel, r.obj) for r in visible_statements(t).collect()}
    assert ("hamburg", TYPE, "city") in vis
    assert ("hamburg", ATTRIBUTE, "harbor") not in vis
    assert ("kiel", TYPE, "city") in vis  # no include rules -> unfiltered


def test_exclude_beats_include_and_id_match(spark):
    # exclude runs first (webserver.cpp:603-607 before the include loop);
    # terms also match the predicate id rendered as a string.
    t = _triples(
        spark,
        [
            ("x", TYPE, "city"),
            ("x", ATTRIBUTE, "blue"),
            ("x", INCLUDE_REL, "city"),
            ("x", EXCLUDE_REL, str(TYPE)),  # id-string match on rel
        ],
    )
    vis = visible_statements(t).collect()
    assert vis == []  # Type row excluded by id; Attribute fails whitelist


def test_meta_predicates_always_hidden(spark):
    t = _triples(
        spark,
        [
            ("x", RANGE, "0-100"),  # pred name 'Range' -> meta skip
            ("x", TYPE, "city"),
        ],
    )
    vis = {(r.subj, r.rel, r.obj) for r in visible_statements(t).collect()}
    assert vis == {("x", TYPE, "city")}
    nometa = {
        (r.subj, r.rel, r.obj)
        for r in visible_statements(t, skip_meta=False).collect()
    }
    assert ("x", RANGE, "0-100") in nometa


def test_add_view_rule_upserts_and_propagates_to_type(spark):
    t = _triples(spark, [("hamburg", TYPE, "city"), ("city", TYPE, "place")])
    t2 = add_view_rule(t, "include", "hamburg", "population")
    rules = {
        (r.subj, r.obj)
        for r in t2.where(F.col("rel") == INCLUDE_REL).collect()
    }
    # rule lands on the node AND its type (console.cpp:455-457)
    assert rules == {("hamburg", "population"), ("city", "population")}
    # idempotent
    assert add_view_rule(t2, "include", "hamburg", "population").count() == t2.count()
    # bare :exclude -> global node (console.cpp:442-446)
    t3 = add_view_rule(t, "exclude", None, "spam")
    assert (
        t3.where(
            (F.col("subj") == GLOBAL_EXCLUDE_NODE)
            & (F.col("rel") == EXCLUDE_REL)
        ).count()
        == 1
    )
