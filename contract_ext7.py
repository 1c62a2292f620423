"""Seventh batch of driver-contract queries (round 5): warm-start
PageRank resume, statistics-driven BGP ordering, and strict
(loud-bound) property paths.

Same conventions as contract_ext..contract_ext6: deterministic input
from the sf-dir parquet tables, routed through the package operator
being certified, DuckDB oracle twin with identical column names +
types.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from contract_ext4 import ORACLE_PAGERANK
from contract_ext5 import ORACLE_BGP_MATCH
from contract_ext6 import _CHAIN_SQL, _chain_triples


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- incremental PageRank (warm-start resume) ------------------------------


def q_pagerank_warm(spark, sf_dir):
    """materialize.pagerank_resume: one warm round from a one-round
    init must be BIT-EQUAL to two cold rounds (the resume step is the
    same all-integer contraction as the from-scratch step; the oracle
    is the unrolled two-iteration SQL shared with `pagerank`).  This
    certifies the delta-restart path: after a snapshot append, resume
    iterates from the previous ranks instead of recomputing."""
    from netbase_spark.operators.materialize import pagerank_resume

    supplier = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    edges = supplier.select(
        F.concat(F.lit("S"), F.col("s_suppkey").cast("string")).alias("src"),
        F.concat(F.lit("N"), F.col("s_nationkey").cast("string")).alias("dst"),
    ).unionByName(
        nation.select(
            F.concat(F.lit("N"), F.col("n_nationkey").cast("string")).alias("src"),
            F.concat(F.lit("R"), F.col("n_regionkey").cast("string")).alias("dst"),
        )
    )
    empty_prev = spark.createDataFrame([], "node string, pr_e12 long")
    r1, _ = pagerank_resume(edges, empty_prev, iters=1, damping_pct=85)
    r2, _ = pagerank_resume(edges, r1, iters=1, damping_pct=85)
    return r2.select("node", "pr_e6")


# --- statistics-driven BGP ordering ----------------------------------------


def q_bgp_stats_order(spark, sf_dir):
    """graph_query.bgp_match with rel_stats (per-rel row counts from
    rel_counts): the estimated-rows pattern order must return exactly
    the static order's bindings — same oracle as `bgp_match`, different
    join order underneath (the order is an optimization, never a
    semantics change)."""
    from netbase_spark.operators.graph_query import bgp_match, rel_counts

    ev = _t(spark, sf_dir, "events")
    triples = ev.select(
        F.col("user_id").cast("string").alias("subj"),
        F.lit(1).alias("rel"),
        F.col("event_type").alias("obj"),
    ).unionByName(
        ev.select(
            F.col("user_id").cast("string").alias("subj"),
            F.lit(2).alias("rel"),
            F.floor(F.col("value") / 10).cast("long").cast("string").alias("obj"),
        )
    )
    return bgp_match(
        triples,
        [("?u", 1, "click"), ("?u", 1, "purchase"), ("?u", 2, "?d")],
        rel_stats=rel_counts(triples),
    )


# --- strict (loud-bound) property path -------------------------------------


def q_path_strict(spark, sf_dir):
    """graph_query.Path(strict=True) with a SUFFICIENT bound: the
    decade chains are at most 9 hops deep, so max_hops=9 converges and
    strict mode returns exactly the truncating semantics' answer (an
    insufficient bound raises PathBoundExceeded instead of silently
    dropping deep pairs — pinned by pytest)."""
    from netbase_spark.operators.graph_query import Path, bgp_match

    return bgp_match(
        _chain_triples(spark, sf_dir),
        [("?a", 2, "marked"),
         ("?a", Path(1, "+", max_hops=9, strict=True), "?b")],
    )


ORACLE_PATH_STRICT = f"""
    WITH RECURSIVE t AS ({_CHAIN_SQL}),
    e AS (SELECT subj, obj FROM t WHERE rel = 1),
    r(a, b, d) AS (
        SELECT subj, obj, 1 FROM e
        UNION
        SELECT r.a, e.obj, r.d + 1 FROM r JOIN e ON e.subj = r.b
        WHERE r.d < 9
    )
    SELECT DISTINCT r.a AS a, r.b AS b
    FROM r JOIN t m ON m.rel = 2 AND m.subj = r.a
"""


EXT7_QUERIES = {
    "pagerank_warm": q_pagerank_warm,
    "bgp_stats_order": q_bgp_stats_order,
    "path_strict": q_path_strict,
}

EXT7_ORACLES = {
    "pagerank_warm": ORACLE_PAGERANK,
    "bgp_stats_order": ORACLE_BGP_MATCH,
    "path_strict": ORACLE_PATH_STRICT,
}
