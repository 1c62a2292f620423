"""Sixth batch of driver-contract queries (round 4): incremental
canonical-map maintenance and SPARQL property paths.

Same conventions as contract_ext..contract_ext5: deterministic input
from the sf-dir parquet tables, routed through the package operator
being certified, DuckDB oracle twin with identical column names +
types.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- incremental connected-components maintenance ---------------------------


def _p(col):
    return F.concat(F.lit("P"), col.cast("string"))


def q_cc_incremental(spark, sf_dir):
    """operators/canonicalize.merge_mapping: an existing canonical map
    (union-find over chain edges, one component per part-key decade) is
    incrementally updated with late merge edges — bridges joining every
    third decade to its successor, plus brand-new ``N``-prefixed nodes
    attaching to existing components — WITHOUT recomputing connected
    components over the historical edges (the rep-level delta solve
    touches only bridged components).  The reference splices merges
    live (``:merge`` src/console.cpp:397-407 -> ``mergeNode``
    src/netbase.cpp:2610-2638); the oracle is the full recompute over
    the edge union (recursive CTE)."""
    from netbase_spark.operators.canonicalize import (
        connected_components,
        merge_mapping,
    )

    part = _t(spark, sf_dir, "part").select("p_partkey")
    pk = F.col("p_partkey")
    base = part.where(pk % 10 != 9).select(
        _p(pk).alias("src"), _p(pk + 1).alias("dst")
    )
    bridges = part.where(pk % 30 == 9).select(
        _p(pk).alias("src"), _p(pk + 1).alias("dst")
    )
    fresh = part.where(pk % 50 == 0).select(
        F.concat(F.lit("N"), pk.cast("string")).alias("src"),
        _p(pk).alias("dst"),
    )
    mapping = connected_components(base)
    return merge_mapping(mapping, bridges.unionByName(fresh))


ORACLE_CC_INCREMENTAL = """
    WITH RECURSIVE e AS (
        SELECT 'P' || CAST(p_partkey AS VARCHAR) AS src,
               'P' || CAST(p_partkey + 1 AS VARCHAR) AS dst
        FROM part WHERE p_partkey % 10 != 9
        UNION ALL
        SELECT 'P' || CAST(p_partkey AS VARCHAR),
               'P' || CAST(p_partkey + 1 AS VARCHAR)
        FROM part WHERE p_partkey % 30 = 9
        UNION ALL
        SELECT 'N' || CAST(p_partkey AS VARCHAR),
               'P' || CAST(p_partkey AS VARCHAR)
        FROM part WHERE p_partkey % 50 = 0
    ), sym AS (
        SELECT src AS a, dst AS b FROM e
        UNION
        SELECT dst AS a, src AS b FROM e
    ), reach(node, r) AS (
        SELECT a, a FROM sym
        UNION
        SELECT re.node, s.b FROM reach re JOIN sym s ON s.a = re.r
    ), m AS (
        SELECT node, min(r) AS rep FROM reach GROUP BY node
    )
    SELECT node, rep FROM m WHERE node != rep
"""


EXT6_QUERIES = {
    "cc_incremental": q_cc_incremental,
}

EXT6_ORACLES = {
    "cc_incremental": ORACLE_CC_INCREMENTAL,
}
