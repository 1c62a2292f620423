"""fixQuery/parseQuery/evaluate semantics (src/query.cpp:22-57, 472-517)."""

from __future__ import annotations

import pytest

from netbase_spark.functions.query_lang import (
    fix_query,
    parse_query,
    run_graph_query,
    run_query,
)


def test_fix_query_rewrites():
    assert fix_query("types of cheese") == "select * from cheese"
    assert fix_query("list of cities with population>1000") == (
        "select * from cities where population>1000"
    )
    assert fix_query("all birds which wingspan>2") == (
        "select * from birds where wingspan>2"
    )
    # already-SQL passes through
    assert fix_query("select a from t where b=1") == "select a from t where b=1"


def test_parse_query_fields_and_filter():
    p = parse_query("select name, population from city where countrycode=us")
    assert p.fields == ["name", "population"]
    assert p.table == "city"
    assert p.where == "countrycode=us"
    p2 = parse_query("show towns")
    assert p2.fields == ["*"] and p2.table == "towns" and p2.where is None


def test_run_query_plural_retry_and_filter(spark):
    df = spark.createDataFrame(
        [("berlin", 3600000, "de"), ("kiel", 240000, "de"), ("paris", 2100000, "fr")],
        "name string, population long, countrycode string",
    )
    out = run_query(
        "list of cities with countrycode=DE and population>1000000", {"city": df}
    )
    assert [r["name"] for r in out.collect()] == ["berlin"]
    with pytest.raises(KeyError):
        run_query("all dragons", {"city": df})


def test_run_graph_query_multi_condition_where(spark):
    # regression: "a>1 and b=2" — the old single-regex LHS extraction
    # captured "1 and b" as a predicate, so b was never pivoted and the
    # filter compile failed on a missing column
    from netbase_spark.relations import INSTANCE

    triples = spark.createDataFrame(
        [
            ("city", INSTANCE, "berlin"),
            ("city", INSTANCE, "kiel"),
            ("city", INSTANCE, "lyon"),
            ("berlin", 9001, "3600000"),
            ("kiel", 9001, "240000"),
            ("lyon", 9001, "510000"),
            ("berlin", 9002, "de"),
            ("kiel", 9002, "de"),
            ("lyon", 9002, "fr"),
        ],
        "subj string, rel int, obj string",
    )
    out = run_graph_query(
        "select 9001 from city where 9001>1000000 and 9002=de", triples
    )
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["name"] == "berlin"
    out_or = run_graph_query(
        "select 9001 from city where 9001>1000000 or 9002=fr", triples
    )
    assert sorted(r["name"] for r in out_or.collect()) == ["berlin", "lyon"]


def test_run_graph_query_instances_and_pivot(spark):
    from netbase_spark.relations import INSTANCE

    triples = spark.createDataFrame(
        [
            ("city", INSTANCE, "berlin"),
            ("city", INSTANCE, "kiel"),
            ("berlin", 9001, "3600000"),
            ("kiel", 9001, "240000"),
        ],
        "subj string, rel int, obj string",
    )
    out = run_graph_query("select 9001 from city where 9001>1000000", triples)
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["name"] == "berlin"
