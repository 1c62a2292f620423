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


def test_console_router(spark):
    """Console command surface (src/console.cpp:172-735): each :cmd
    routes to its package operator over one shared triple state."""
    from pyspark.sql import functions as F

    from netbase_spark.functions.console import Console
    from netbase_spark.operators.mutate import rel_id_for
    from netbase_spark.relations import INSTANCE, TYPE

    t = spark.createDataFrame(
        [
            ("city", INSTANCE, "gehren", "seed", None),
            ("gehren", rel_id_for("population"), "3703", "seed", None),
            ("gehren", TYPE, "ort", "seed", None),
        ],
        "subj string, rel int, obj string, rule string, doc_id string",
    )
    con = Console(spark, t)

    # :learn inserts (sentence parse + upsert)
    con.execute(":learn Gehren ist Thuringia")
    assert con.triples.where(F.col("obj") == "thuringia").count() == 1

    # query language + property question route
    got = [r["name"] for r in con.execute("city where population=3703").collect()]
    assert got == ["gehren"]
    pq = {(r["name"], r["value"]) for r in con.execute("population of Gehren").collect()}
    assert pq == {("gehren", "3703")}

    # :update replaces the single-valued property
    con.execute(":update gehren set population=4000")
    assert con.execute("population of Gehren").collect()[0]["value"] == "4000"

    # :all expands instances; bare word lists statements
    assert {r["node"] for r in con.execute(":all city").collect()} == {"gehren"}
    assert con.execute("gehren").count() >= 3

    # :is via the closure; :topic climbs upward edges
    assert con.execute(":is gehren ort").collect()[0]["result"] is True
    topics = {r["topic"] for r in con.execute(":topic gehren").collect()}
    assert "ort" in topics or "city" in topics

    # :merge b into a (target wins), then :delete removes the node
    con.execute(":merge gehren1 gehren")
    assert con.triples.where(F.col("subj") == "gehren").count() == 0
    con.execute(":delete gehren1")
    assert con.triples.where(
        (F.col("subj") == "gehren1") | (F.col("obj") == "gehren1")
    ).count() == 0

    # limit state change returns None
    assert con.execute("limit 5") is None
    assert con.limit == 5


def test_console_nl_forms_and_view_filters(spark):
    """Console help-text forms (src/console.cpp:57-66) + testInclude
    view filters (src/tests.cpp:1555-1585): subclasses/entities of,
    opposite of (Antonym), :include/:exclude listing filters."""
    from pyspark.sql import functions as F

    from netbase_spark.functions.console import Console
    from netbase_spark.operators.mutate import rel_id_for
    from netbase_spark.relations import ANTONYM, INSTANCE, SUB_CLASS

    t = spark.createDataFrame(
        [
            ("animal", SUB_CLASS, "bird", "r", None),
            ("bird", SUB_CLASS, "duck", "r", None),
            ("animal", INSTANCE, "rex", "r", None),
            ("good", ANTONYM, "bad", "r", None),
            ("rex", rel_id_for("color"), "brown", "r", None),
        ],
        "subj string, rel int, obj string, rule string, doc_id string",
    )
    con = Console(spark, t)

    subs = {r["node"] for r in con.execute("subclasses of animal").collect()}
    assert subs == {"bird", "duck"}
    ents = {r["node"] for r in con.execute("entities of animal limit 10").collect()}
    assert "rex" in ents
    # opposite of bad -> Antonym lookup (inverse retry finds good)
    opp = {r["value"] for r in con.execute("opposite of bad").collect()}
    assert opp == {"good"}

    # view filters narrow the bare-word listing
    assert con.execute("rex").count() == 2
    con.execute(f":exclude color")
    assert con.execute("rex").count() == 1
    con.excluded.clear()
    con.execute(":include color")
    rows = con.execute("rex").collect()
    assert [r["rel"] for r in rows] == [rel_id_for("color")]


def test_console_entities_seo_type_tree_label_more(spark):
    """Round-2 console additions: :entities ad-hoc EL (console.cpp
    ':entities'/webserver 'ee/'), :seo slug lookup (netbase.cpp:
    2555-2593), :type (query.cpp:2128), :tree subclass walk, :label
    rename rewrite (netbase.cpp:2385-2427), :more page doubling
    (console.cpp:240-244)."""
    from pyspark.sql import functions as F

    from netbase_spark.functions.console import Console
    from netbase_spark.relations import SUB_CLASS, TYPE

    t = spark.createDataFrame(
        [
            ("new york", TYPE, "city", "r", None),
            ("city", SUB_CLASS, "metropolis", "r", None),
        ],
        "subj string, rel int, obj string, rule string, doc_id string",
    )
    con = Console(spark, t)

    ents = {r["alias_key"] for r in con.execute(":entities I love New York").collect()}
    assert "new york" in ents

    seo = con.execute(":seo New_York").collect()
    assert len(seo) == 1 and seo[0]["key"] == "new york"

    ty = con.execute(":type new york").collect()
    assert ty and ty[0]["type"] == "city"

    tree = {r["node"] for r in con.execute(":tree city").collect()}
    assert tree == {"metropolis"}

    con.execute(":label city gotham")
    assert con.triples.where(F.col("obj") == "gotham").count() == 1
    assert con.triples.where(F.col("obj") == "city").count() == 0

    con.execute("limit 5")
    con.execute(":more")
    assert con.limit == 10
