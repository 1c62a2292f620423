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


# --- SPARQL property paths over the closure machinery ------------------------


def _chain_triples(spark, sf_dir):
    """rel 1: part-key chain edges (decade chains, as cc_chain); rel 2:
    'marked' tags on every 7th key.  A multi-hop-able graph with a
    selective side pattern."""
    part = _t(spark, sf_dir, "part").select("p_partkey")
    pk = F.col("p_partkey")
    chain = part.where(pk % 10 != 9).select(
        _p(pk).alias("subj"), F.lit(1).alias("rel"), _p(pk + 1).alias("obj")
    )
    marks = part.where(pk % 7 == 0).select(
        _p(pk).alias("subj"), F.lit(2).alias("rel"), F.lit("marked").alias("obj")
    )
    return chain.unionByName(marks)


_CHAIN_SQL = """
        SELECT 'P' || CAST(p_partkey AS VARCHAR) AS subj, 1 AS rel,
               'P' || CAST(p_partkey + 1 AS VARCHAR) AS obj
        FROM part WHERE p_partkey % 10 != 9
        UNION ALL
        SELECT 'P' || CAST(p_partkey AS VARCHAR) AS subj, 2 AS rel,
               'marked' AS obj
        FROM part WHERE p_partkey % 7 = 0
"""


def q_bgp_path(spark, sf_dir):
    """operators/graph_query.bgp_match with a bounded ``+`` property
    path (Path(1, '+', 3)): marked nodes and everything they reach in
    1..3 chain hops — the reference's depth-bounded recursion surface
    (src/query.cpp:902-1046) reachable from the pattern language."""
    from netbase_spark.operators.graph_query import Path, bgp_match

    return bgp_match(
        _chain_triples(spark, sf_dir),
        [("?a", 2, "marked"), ("?a", Path(1, "+", max_hops=3), "?b")],
    )


ORACLE_BGP_PATH = f"""
    WITH RECURSIVE t AS ({_CHAIN_SQL}),
    e AS (SELECT subj, obj FROM t WHERE rel = 1),
    r(a, b, d) AS (
        SELECT subj, obj, 1 FROM e
        UNION
        SELECT r.a, e.obj, r.d + 1 FROM r JOIN e ON e.subj = r.b
        WHERE r.d < 3
    )
    SELECT DISTINCT r.a AS a, r.b AS b
    FROM r JOIN t m ON m.rel = 2 AND m.subj = r.a
"""


def q_bgp_path_star(spark, sf_dir):
    """Zero-or-more path (Path(1, '*', 2)): marked nodes and everything
    within 0..2 chain hops — the zero-hop identity ranges over the
    graph's node domain."""
    from netbase_spark.operators.graph_query import Path, bgp_match

    return bgp_match(
        _chain_triples(spark, sf_dir),
        [("?a", 2, "marked"), ("?a", Path(1, "*", max_hops=2), "?b")],
    )


ORACLE_BGP_PATH_STAR = f"""
    WITH RECURSIVE t AS ({_CHAIN_SQL}),
    e AS (SELECT subj, obj FROM t WHERE rel = 1),
    r(a, b, d) AS (
        SELECT subj, obj, 1 FROM e
        UNION
        SELECT r.a, e.obj, r.d + 1 FROM r JOIN e ON e.subj = r.b
        WHERE r.d < 2
    ),
    marked AS (SELECT subj FROM t WHERE rel = 2)
    SELECT DISTINCT a, b FROM (
        SELECT r.a AS a, r.b AS b FROM r JOIN marked m ON m.subj = r.a
        UNION ALL
        SELECT m.subj AS a, m.subj AS b FROM marked m
    )
"""


EXT6_QUERIES["bgp_path"] = q_bgp_path
EXT6_QUERIES["bgp_path_star"] = q_bgp_path_star
EXT6_ORACLES["bgp_path"] = ORACLE_BGP_PATH
EXT6_ORACLES["bgp_path_star"] = ORACLE_BGP_PATH_STAR


# --- grouped OPTIONAL (nested group graph pattern) ---------------------------


def q_bgp_group_optional(spark, sf_dir):
    """bgp_match with an optional GROUP: users who clicked, with their
    high-value decile AND that decile's tier tag where the WHOLE group
    matches (internal ?d correlates across the group's two patterns),
    nulls otherwise."""
    from netbase_spark.operators.graph_query import bgp_match

    ev = _t(spark, sf_dir, "events")
    t1 = ev.select(
        F.col("user_id").cast("string").alias("subj"),
        F.lit(1).alias("rel"),
        F.col("event_type").alias("obj"),
    )
    t2 = ev.where(F.col("value") > 400.0).select(
        F.col("user_id").cast("string").alias("subj"),
        F.lit(2).alias("rel"),
        F.floor(F.col("value") / 10).cast("long").cast("string").alias("obj"),
    )
    t3 = ev.where(F.col("value") > 450.0).select(
        F.floor(F.col("value") / 10).cast("long").cast("string").alias("subj"),
        F.lit(3).alias("rel"),
        F.lit("top-tier").alias("obj"),
    )
    triples = t1.unionByName(t2).unionByName(t3)
    return bgp_match(
        triples,
        [("?u", 1, "click")],
        optional=[[("?u", 2, "?d"), ("?d", 3, "?tier")]],
    )


ORACLE_BGP_GROUP_OPTIONAL = """
    WITH t1 AS (
        SELECT DISTINCT CAST(user_id AS VARCHAR) AS subj
        FROM events WHERE event_type = 'click'
    ),
    t2 AS (
        SELECT DISTINCT CAST(user_id AS VARCHAR) AS subj,
               CAST(CAST(floor(value / 10) AS BIGINT) AS VARCHAR) AS obj
        FROM events WHERE value > 400.0
    ),
    t3 AS (
        SELECT DISTINCT CAST(CAST(floor(value / 10) AS BIGINT) AS VARCHAR)
               AS subj, 'top-tier' AS obj
        FROM events WHERE value > 450.0
    ),
    grp AS (
        SELECT t2.subj AS u, t2.obj AS d, t3.obj AS tier
        FROM t2 JOIN t3 ON t3.subj = t2.obj
    )
    SELECT DISTINCT t1.subj AS u, grp.d AS d, grp.tier AS tier
    FROM t1 LEFT JOIN grp ON grp.u = t1.subj
"""


EXT6_QUERIES["bgp_group_optional"] = q_bgp_group_optional
EXT6_ORACLES["bgp_group_optional"] = ORACLE_BGP_GROUP_OPTIONAL


def _chain2_triples(spark, sf_dir):
    """Two alternating chain rels: even part keys emit rel 1 edges, odd
    emit rel 4 — a chain only an alternation path can walk end to end —
    plus rel-2 marks every 7th key (as _chain_triples)."""
    part = _t(spark, sf_dir, "part").select("p_partkey")
    pk = F.col("p_partkey")
    c1 = part.where((pk % 10 != 9) & (pk % 2 == 0)).select(
        _p(pk).alias("subj"), F.lit(1).alias("rel"), _p(pk + 1).alias("obj")
    )
    c4 = part.where((pk % 10 != 9) & (pk % 2 == 1)).select(
        _p(pk).alias("subj"), F.lit(4).alias("rel"), _p(pk + 1).alias("obj")
    )
    marks = part.where(pk % 7 == 0).select(
        _p(pk).alias("subj"), F.lit(2).alias("rel"), F.lit("marked").alias("obj")
    )
    return c1.unionByName(c4).unionByName(marks)


_CHAIN2_SQL = """
        SELECT 'P' || CAST(p_partkey AS VARCHAR) AS subj, 1 AS rel,
               'P' || CAST(p_partkey + 1 AS VARCHAR) AS obj
        FROM part WHERE p_partkey % 10 != 9 AND p_partkey % 2 = 0
        UNION ALL
        SELECT 'P' || CAST(p_partkey AS VARCHAR) AS subj, 4 AS rel,
               'P' || CAST(p_partkey + 1 AS VARCHAR) AS obj
        FROM part WHERE p_partkey % 10 != 9 AND p_partkey % 2 = 1
        UNION ALL
        SELECT 'P' || CAST(p_partkey AS VARCHAR) AS subj, 2 AS rel,
               'marked' AS obj
        FROM part WHERE p_partkey % 7 = 0
"""


def q_bgp_path_alt(spark, sf_dir):
    """Alternation path (1|4)+ bounded at 3 hops over a chain whose
    edges alternate between the two rels — a single-rel closure stops
    after one hop, the alternation walks through."""
    from netbase_spark.operators.graph_query import Path, bgp_match

    return bgp_match(
        _chain2_triples(spark, sf_dir),
        [("?a", 2, "marked"), ("?a", Path([1, 4], "+", max_hops=3), "?b")],
    )


ORACLE_BGP_PATH_ALT = f"""
    WITH RECURSIVE t AS ({_CHAIN2_SQL}),
    e AS (SELECT subj, obj FROM t WHERE rel IN (1, 4)),
    r(a, b, d) AS (
        SELECT subj, obj, 1 FROM e
        UNION
        SELECT r.a, e.obj, r.d + 1 FROM r JOIN e ON e.subj = r.b
        WHERE r.d < 3
    )
    SELECT DISTINCT r.a AS a, r.b AS b
    FROM r JOIN t m ON m.rel = 2 AND m.subj = r.a
"""


def q_bgp_path_inverse(spark, sf_dir):
    """Inverse path ^(1|4)+ bounded at 3 hops: marked nodes and their
    ANCESTORS along the alternating chain (edges walked obj->subj)."""
    from netbase_spark.operators.graph_query import Path, bgp_match

    return bgp_match(
        _chain2_triples(spark, sf_dir),
        [
            ("?a", 2, "marked"),
            ("?a", Path([1, 4], "+", max_hops=3, inverse=True), "?b"),
        ],
    )


ORACLE_BGP_PATH_INVERSE = f"""
    WITH RECURSIVE t AS ({_CHAIN2_SQL}),
    e AS (SELECT obj AS subj, subj AS obj FROM t WHERE rel IN (1, 4)),
    r(a, b, d) AS (
        SELECT subj, obj, 1 FROM e
        UNION
        SELECT r.a, e.obj, r.d + 1 FROM r JOIN e ON e.subj = r.b
        WHERE r.d < 3
    )
    SELECT DISTINCT r.a AS a, r.b AS b
    FROM r JOIN t m ON m.rel = 2 AND m.subj = r.a
"""


EXT6_QUERIES["bgp_path_alt"] = q_bgp_path_alt
EXT6_QUERIES["bgp_path_inverse"] = q_bgp_path_inverse
EXT6_ORACLES["bgp_path_alt"] = ORACLE_BGP_PATH_ALT
EXT6_ORACLES["bgp_path_inverse"] = ORACLE_BGP_PATH_INVERSE


# --- incremental transitive-closure maintenance ------------------------------


def q_isa_incremental(spark, sf_dir):
    """operators/query_ops.extend_closure: the materialized subsumption
    closure (supplier -> nation -> region, as isa_closure) is extended
    with a batch of NEW upward edges — regions into two zones, zones
    into a world root (chains needing two new edges), plus a fresh leaf
    under an existing supplier — without recomputing the closure over
    the historical edges.  Oracle = full recursive-CTE closure over the
    edge union."""
    from netbase_spark.operators.query_ops import extend_closure, isa_closure

    nation = _t(spark, sf_dir, "nation")
    closure = isa_closure(_supplier_type_triples_local(spark, sf_dir))
    zones = nation.select(
        F.concat(F.lit("R"), F.col("n_regionkey").cast("string")).alias("node"),
        F.concat(
            F.lit("Z"), (F.col("n_regionkey") % 2).cast("string")
        ).alias("anc"),
    ).dropDuplicates()
    roots = spark.createDataFrame(
        [("Z0", "WORLD"), ("Z1", "WORLD"), ("X9", "S1")],
        "node string, anc string",
    )
    return extend_closure(closure, zones.unionByName(roots))


def _supplier_type_triples_local(spark, sf_dir):
    from netbase_spark.relations import TYPE

    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    return supplier.select(
        F.concat(F.lit("S"), F.col("s_suppkey").cast("string")).alias("subj"),
        F.lit(TYPE).alias("rel"),
        F.concat(F.lit("N"), F.col("s_nationkey").cast("string")).alias("obj"),
    ).unionByName(
        nation.select(
            F.concat(F.lit("N"), F.col("n_nationkey").cast("string")).alias("subj"),
            F.lit(TYPE).alias("rel"),
            F.concat(F.lit("R"), F.col("n_regionkey").cast("string")).alias("obj"),
        )
    )


ORACLE_ISA_INCREMENTAL = """
    WITH RECURSIVE edges AS (
        SELECT 'S' || CAST(s_suppkey AS VARCHAR) AS node,
               'N' || CAST(s_nationkey AS VARCHAR) AS anc
        FROM supplier
        UNION ALL
        SELECT 'N' || CAST(n_nationkey AS VARCHAR),
               'R' || CAST(n_regionkey AS VARCHAR)
        FROM nation
        UNION ALL
        SELECT DISTINCT 'R' || CAST(n_regionkey AS VARCHAR),
               'Z' || CAST(n_regionkey % 2 AS VARCHAR)
        FROM nation
        UNION ALL
        SELECT 'Z0', 'WORLD' UNION ALL SELECT 'Z1', 'WORLD'
        UNION ALL SELECT 'X9', 'S1'
    ), closure AS (
        SELECT node, anc FROM edges
        UNION
        SELECT c.node, e.anc FROM closure c JOIN edges e ON c.anc = e.node
    )
    SELECT DISTINCT node, anc FROM closure WHERE node != anc
"""


EXT6_QUERIES["isa_incremental"] = q_isa_incremental
EXT6_ORACLES["isa_incremental"] = ORACLE_ISA_INCREMENTAL


def q_bgp_path_not_exists(spark, sf_dir):
    """A property path inside FILTER NOT EXISTS: marked nodes with NO
    outgoing chain successor within 2 hops (chain tails only) — the
    closure table feeds the anti join."""
    from netbase_spark.operators.graph_query import Path, bgp_match

    return bgp_match(
        _chain_triples(spark, sf_dir),
        [("?a", 2, "marked")],
        not_exists=[("?a", Path(1, "+", max_hops=2), "?b")],
    )


ORACLE_BGP_PATH_NOT_EXISTS = f"""
    WITH RECURSIVE t AS ({_CHAIN_SQL}),
    e AS (SELECT subj, obj FROM t WHERE rel = 1),
    r(a, b, d) AS (
        SELECT subj, obj, 1 FROM e
        UNION
        SELECT r.a, e.obj, r.d + 1 FROM r JOIN e ON e.subj = r.b
        WHERE r.d < 2
    )
    SELECT DISTINCT m.subj AS a
    FROM t m
    WHERE m.rel = 2
      AND NOT EXISTS (SELECT 1 FROM r WHERE r.a = m.subj)
"""


EXT6_QUERIES["bgp_path_not_exists"] = q_bgp_path_not_exists
EXT6_ORACLES["bgp_path_not_exists"] = ORACLE_BGP_PATH_NOT_EXISTS


# --- remove+add count maintenance --------------------------------------------


def q_count_delta(spark, sf_dir):
    """operators/evaluate.apply_count_delta: a degree table built over
    events with event_id %% 4 != 3 takes a delta REMOVING the %% 4 == 1
    slice and ADDING the %% 4 == 3 slice — the move-rows-between-keys
    maintenance a canonical merge needs — and must equal a full recount
    over the surviving union (event_id %% 4 != 1), with zero-count keys
    dropped."""
    from netbase_spark.operators.evaluate import apply_count_delta

    ev = _t(spark, sf_dir, "events")
    node = F.col("user_id").cast("string").alias("node")
    base = ev.where(F.pmod("event_id", F.lit(4)) != 3).select(node)
    removed = ev.where(F.pmod("event_id", F.lit(4)) == 1).select(node)
    added = ev.where(F.pmod("event_id", F.lit(4)) == 3).select(node)
    existing = base.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    return apply_count_delta(existing, removed, added, ("node",), "degree")


ORACLE_COUNT_DELTA = """
    SELECT CAST(user_id AS VARCHAR) AS node, COUNT(*) AS degree
    FROM events WHERE event_id % 4 != 1
    GROUP BY 1
"""


EXT6_QUERIES["count_delta"] = q_count_delta
EXT6_ORACLES["count_delta"] = ORACLE_COUNT_DELTA


def q_bgp_path_opt(spark, sf_dir):
    """Zero-or-one path (Path(1, '?')): marked nodes with themselves
    and their direct chain successor — the SPARQL ``rel?`` term."""
    from netbase_spark.operators.graph_query import Path, bgp_match

    return bgp_match(
        _chain_triples(spark, sf_dir),
        [("?a", 2, "marked"), ("?a", Path(1, "?"), "?b")],
    )


ORACLE_BGP_PATH_OPT = f"""
    WITH t AS ({_CHAIN_SQL}),
    marked AS (SELECT subj FROM t WHERE rel = 2)
    SELECT DISTINCT a, b FROM (
        SELECT m.subj AS a, e.obj AS b
        FROM marked m JOIN t e ON e.rel = 1 AND e.subj = m.subj
        UNION ALL
        SELECT m.subj AS a, m.subj AS b FROM marked m
    )
"""


def q_bgp_notrel(spark, sf_dir):
    """Negated property set (NotRel): edges out of marked nodes whose
    rel is NOT the chain rel — SPARQL ``!(chain)`` (finds only the mark
    edges themselves here, objects all 'marked')."""
    from netbase_spark.operators.graph_query import NotRel, bgp_match

    return bgp_match(
        _chain_triples(spark, sf_dir),
        [("?a", 2, "marked"), ("?a", NotRel([1]), "?b")],
    )


ORACLE_BGP_NOTREL = f"""
    WITH t AS ({_CHAIN_SQL}),
    marked AS (SELECT subj FROM t WHERE rel = 2)
    SELECT DISTINCT m.subj AS a, e.obj AS b
    FROM marked m JOIN t e ON e.rel != 1 AND e.subj = m.subj
"""


EXT6_QUERIES["bgp_path_opt"] = q_bgp_path_opt
EXT6_QUERIES["bgp_notrel"] = q_bgp_notrel
EXT6_ORACLES["bgp_path_opt"] = ORACLE_BGP_PATH_OPT
EXT6_ORACLES["bgp_notrel"] = ORACLE_BGP_NOTREL


def q_bgp_values(spark, sf_dir):
    """SPARQL VALUES block: a driver-side seed list of users (with a
    supplied tier tag, one row UNDEF on the tag) inner-joined onto the
    required click pattern — the parameterized-query surface."""
    from netbase_spark.operators.graph_query import bgp_match

    ev = _t(spark, sf_dir, "events")
    triples = ev.select(
        F.col("user_id").cast("string").alias("subj"),
        F.lit(1).alias("rel"),
        F.col("event_type").alias("obj"),
    )
    seeds = [
        {"?u": "1", "?tier": "gold"},
        {"?u": "2", "?tier": "silver"},
        {"?u": "3"},
        {"?u": "999999"},  # no such user: contributes nothing
    ]
    return bgp_match(triples, [("?u", 1, "click")], values=seeds)


ORACLE_BGP_VALUES = """
    WITH clicks AS (
        SELECT DISTINCT CAST(user_id AS VARCHAR) AS u
        FROM events WHERE event_type = 'click'
    ),
    seeds(u, tier) AS (
        VALUES ('1', 'gold'), ('2', 'silver'), ('3', NULL), ('999999', NULL)
    )
    SELECT DISTINCT c.u AS u, s.tier AS tier
    FROM clicks c JOIN seeds s ON s.u = c.u
"""


EXT6_QUERIES["bgp_values"] = q_bgp_values
EXT6_ORACLES["bgp_values"] = ORACLE_BGP_VALUES
