"""Equivalence of the two union-find implementations (driver-local vs
distributed min-label + pointer jumping) and of salted vs plain degree
aggregation — the claims the operator docstrings make."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from netbase_spark.operators.canonicalize import connected_components
from netbase_spark.operators.materialize import node_degrees


def _random_edges(seed: int, n_nodes: int, n_edges: int) -> list[tuple[str, str]]:
    rng = random.Random(seed)
    return [
        (f"n{rng.randrange(n_nodes)}", f"n{rng.randrange(n_nodes)}")
        for _ in range(n_edges)
    ]


def test_driver_and_distributed_cc_agree(spark):
    edges = spark.createDataFrame(
        _random_edges(7, 120, 150), "src string, dst string"
    )
    driver = connected_components(edges)  # under threshold -> driver path
    dist = connected_components(edges, driver_threshold=0)  # force distributed
    d = {(r["node"], r["rep"]) for r in driver.collect()}
    s = {(r["node"], r["rep"]) for r in dist.collect()}
    assert d == s and len(d) > 0


def test_driver_cc_chain_and_star(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y"), ("x", "z"), ("q", "q")],
        "src string, dst string",
    )
    got = {(r["node"], r["rep"]) for r in connected_components(edges).collect()}
    assert got == {
        ("b", "a"), ("c", "a"), ("d", "a"),
        ("y", "x"), ("z", "x"),
    }


def test_salted_degrees_equal_plain_groupby(spark):
    tri = spark.createDataFrame(
        [(f"s{i % 7}", -301, f"o{i % 3}") for i in range(200)],
        "subj string, rel int, obj string",
    )
    salted = {(r["node"], r["degree"]) for r in node_degrees(tri, salt_buckets=8).collect()}
    plain_df = (
        tri.select(F.col("subj").alias("node"))
        .unionAll(tri.select(F.col("obj").alias("node")))
        .groupBy("node")
        .count()
    )
    plain = {(r["node"], r["count"]) for r in plain_df.collect()}
    assert salted == plain


def test_degrees_from_adjacency_equals_node_degrees(spark):
    """The pipeline derives degrees from the materialized adjacency
    table (column-pruned group-count) — must equal the triple-scan
    node_degrees for any triple set."""
    from netbase_spark.operators.materialize import (
        adjacency,
        degrees_from_adjacency,
    )

    tri = spark.createDataFrame(
        [(f"s{i % 7}", -301, f"o{i % 3}") for i in range(200)]
        + [("hub", -4, f"o{i}") for i in range(50)],
        "subj string, rel int, obj string",
    )
    via_adj = {
        (r["node"], r["degree"])
        for r in degrees_from_adjacency(adjacency(tri)).collect()
    }
    direct = {(r["node"], r["degree"]) for r in node_degrees(tri).collect()}
    assert via_adj == direct and ("hub", 50) in via_adj


def test_adjacency_view_equals_full_explode(spark):
    """The pipeline materializes only the obj-keyed reverse index
    (adjacency_reverse); the union view over (triple table, index) must
    be row-set-identical to the full-explode adjacency operator — the
    reference's chains are indexes into one statement array
    (src/netbase.hpp:193-195), not copies."""
    from netbase_spark.operators.materialize import (
        adjacency,
        adjacency_reverse,
        adjacency_view,
        degrees_from_adjacency,
    )

    tri = spark.createDataFrame(
        [(f"s{i % 7}", -301 if i % 2 else -4, f"o{i % 3}") for i in range(200)]
        + [("loop", -4, "loop")],
        "subj string, rel int, obj string",
    )
    full = {tuple(r) for r in adjacency(tri).collect()}
    view = {
        tuple(r) for r in adjacency_view(tri, adjacency_reverse(tri)).collect()
    }
    assert view == full
    deg_full = {
        tuple(r) for r in degrees_from_adjacency(adjacency(tri)).collect()
    }
    deg_view = {
        tuple(r)
        for r in degrees_from_adjacency(
            adjacency_view(tri, adjacency_reverse(tri))
        ).collect()
    }
    assert deg_view == deg_full


def test_triples_by_rel_partition_pruning(spark, tmp_path):
    """write_triples partitions by rel so predicate lookups prune
    partitions — the Instance-gap ordering analog (netbase.cpp:468-481):
    a Type-edge scan must not read mention partitions."""
    from netbase_spark.operators.materialize import write_triples

    tri = spark.createDataFrame(
        [("a", -4, "b", "r", None), ("c", -301, "d", "m", "1")] * 50,
        "subj string, rel int, obj string, rule string, doc_id string",
    )
    path = str(tmp_path / "triples_by_rel")
    write_triples(tri, path)
    back = spark.read.parquet(path).where("rel = -4")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(rel" in plan or "rel#" in plan
    # the pruned read returns only the Type partition's rows
    assert back.count() == 50
    files = {r[0] for r in back.select(F.input_file_name()).distinct().collect()}
    assert all("rel=-4" in f for f in files)
