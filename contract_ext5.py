"""Fifth batch of driver-contract queries: the triple-set P/R evaluator
and the incremental triple-table upsert.

Same conventions as contract_ext / contract_ext2 / contract_ext3 /
contract_ext4: deterministic input from the sf-dir parquet tables,
routed through the package operator being certified, DuckDB oracle twin
with identical column names + types.  Ratio columns follow the
fixed-point discipline (integer ``div`` of exact longs — engine-exact,
no float rounding at a boundary; see the pagerank e12 precedent).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --- distributed P/R between two triple sets --------------------------------


def _event_triples(ev, min_value):
    return ev.where(F.col("value") > min_value).select(
        F.col("user_id").cast("string").alias("subj"),
        F.lit(1).alias("rel"),
        F.col("event_type").alias("obj"),
    )


def q_triple_pr(spark, sf_dir):
    """operators/evaluate.triple_set_pr between two overlapping
    (user, event_type) edge sets derived from events — the north rule's
    P/R >= 0.95 grading comparison as a one-shuffle distributed op.
    The contract row re-derives the ratios from the exact long counts
    with integer division (engine-portable); the operator's own double
    columns are exercised and then dropped here."""
    from netbase_spark.operators.evaluate import triple_set_pr

    ev = _t(spark, sf_dir, "events")
    pr = triple_set_pr(_event_triples(ev, 50.0), _event_triples(ev, 20.0))
    return pr.select(
        "tp",
        "got_n",
        "expected_n",
        F.expr("tp * 1000000 div got_n").alias("precision_e6"),
        F.expr("tp * 1000000 div expected_n").alias("recall_e6"),
        F.expr("2 * tp * 1000000 div (got_n + expected_n)").alias("f1_e6"),
    )


ORACLE_TRIPLE_PR = """
    WITH g AS (
        SELECT DISTINCT CAST(user_id AS VARCHAR) AS subj, 1 AS rel,
               event_type AS obj
        FROM events WHERE value > 50.0
    ),
    e AS (
        SELECT DISTINCT CAST(user_id AS VARCHAR) AS subj, 1 AS rel,
               event_type AS obj
        FROM events WHERE value > 20.0
    ),
    c AS (
        SELECT
            (SELECT COUNT(*) FROM g JOIN e USING (subj, rel, obj)) AS tp,
            (SELECT COUNT(*) FROM g) AS got_n,
            (SELECT COUNT(*) FROM e) AS expected_n
    )
    SELECT tp, got_n, expected_n,
           (tp * 1000000) // got_n AS precision_e6,
           (tp * 1000000) // expected_n AS recall_e6,
           (2 * tp * 1000000) // (got_n + expected_n) AS f1_e6
    FROM c
"""


# --- incremental triple-table upsert ----------------------------------------


def _tagged_triples(ev, tag):
    """Events -> provenance-tagged triples; (subj, rel, obj) keys repeat
    across events (same user x event_type), so within-batch dedup and
    cross-batch first-writer-wins are both exercised."""
    return ev.select(
        F.col("user_id").cast("string").alias("subj"),
        F.lit(1).alias("rel"),
        F.col("event_type").alias("obj"),
        F.lit(tag).alias("rule"),
        F.col("event_id").cast("string").alias("doc_id"),
    )


def q_triple_upsert(spark, sf_dir):
    """operators/evaluate.merge_triples: delta batch (event_id % 3 != 0)
    upserted into an existing table (event_id % 3 != 2).  Overlapping
    keys must keep the EXISTING row's provenance; fresh delta keys
    append with the delta's deterministic within-batch winner."""
    from netbase_spark.operators.evaluate import merge_triples

    ev = _t(spark, sf_dir, "events")
    base_raw = _tagged_triples(ev.where(F.pmod("event_id", F.lit(3)) != 2), "base")
    delta = _tagged_triples(ev.where(F.pmod("event_id", F.lit(3)) != 0), "delta")
    # canonicalize the existing side the same way merge_triples dedupes
    # a delta: deterministic min of the non-key columns per key
    existing = (
        base_raw.groupBy("subj", "rel", "obj")
        .agg(F.min(F.struct("rule", "doc_id")).alias("_r"))
        .select("subj", "rel", "obj", F.col("_r.rule").alias("rule"),
                F.col("_r.doc_id").alias("doc_id"))
    )
    return merge_triples(existing, delta)


ORACLE_TRIPLE_UPSERT = """
    WITH base AS (
        SELECT subj, rel, obj, rule, doc_id
        FROM (
            SELECT CAST(user_id AS VARCHAR) AS subj, 1 AS rel,
                   event_type AS obj, 'base' AS rule,
                   CAST(event_id AS VARCHAR) AS doc_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY CAST(user_id AS VARCHAR), event_type
                       ORDER BY 'base', CAST(event_id AS VARCHAR)
                   ) AS rn
            FROM events WHERE event_id % 3 != 2
        ) WHERE rn = 1
    ),
    delta AS (
        SELECT subj, rel, obj, rule, doc_id
        FROM (
            SELECT CAST(user_id AS VARCHAR) AS subj, 1 AS rel,
                   event_type AS obj, 'delta' AS rule,
                   CAST(event_id AS VARCHAR) AS doc_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY CAST(user_id AS VARCHAR), event_type
                       ORDER BY 'delta', CAST(event_id AS VARCHAR)
                   ) AS rn
            FROM events WHERE event_id % 3 != 0
        ) WHERE rn = 1
    )
    SELECT * FROM base
    UNION ALL
    SELECT d.* FROM delta d
    WHERE NOT EXISTS (
        SELECT 1 FROM base b
        WHERE b.subj = d.subj AND b.rel = d.rel AND b.obj = d.obj
    )
"""


EXT5_QUERIES = {
    "triple_pr": q_triple_pr,
    "triple_upsert": q_triple_upsert,
}

EXT5_ORACLES = {
    "triple_pr": ORACLE_TRIPLE_PR,
    "triple_upsert": ORACLE_TRIPLE_UPSERT,
}


# --- conjunctive basic-graph-pattern matching --------------------------------


def q_bgp_match(spark, sf_dir):
    """operators/graph_query.bgp_match: three-pattern conjunctive query
    over an events-derived triple table — users who both clicked and
    purchased, bound to their value deciles.  Exercises selectivity
    ordering (constant-object patterns first), shared-variable joins,
    and distinct-bindings semantics."""
    from netbase_spark.operators.graph_query import bgp_match

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
    )


ORACLE_BGP_MATCH = """
    WITH t AS (
        SELECT CAST(user_id AS VARCHAR) AS subj, 1 AS rel,
               event_type AS obj
        FROM events
        UNION ALL
        SELECT CAST(user_id AS VARCHAR) AS subj, 2 AS rel,
               CAST(CAST(floor(value / 10) AS BIGINT) AS VARCHAR) AS obj
        FROM events
    )
    SELECT DISTINCT a.subj AS u, c.obj AS d
    FROM t a, t b, t c
    WHERE a.rel = 1 AND a.obj = 'click'
      AND b.rel = 1 AND b.obj = 'purchase' AND b.subj = a.subj
      AND c.rel = 2 AND c.subj = a.subj
"""


EXT5_QUERIES["bgp_match"] = q_bgp_match
EXT5_ORACLES["bgp_match"] = ORACLE_BGP_MATCH


# --- incremental additive-aggregate maintenance ------------------------------


def q_degree_merge(spark, sf_dir):
    """operators/evaluate.merge_counts: a degree table materialized over
    half the incidence rows (event_id even), then incrementally updated
    with the other half — must equal a full recount over the union,
    without re-aggregating the existing half's raw rows."""
    from netbase_spark.operators.evaluate import merge_counts

    ev = _t(spark, sf_dir, "events")
    node = F.col("user_id").cast("string").alias("node")
    half_a = ev.where(F.pmod("event_id", F.lit(2)) == 0).select(node)
    half_b = ev.where(F.pmod("event_id", F.lit(2)) == 1).select(node)
    existing = half_a.groupBy("node").agg(F.count(F.lit(1)).alias("degree"))
    return merge_counts(existing, half_b, ("node",), "degree")


ORACLE_DEGREE_MERGE = """
    SELECT CAST(user_id AS VARCHAR) AS node, COUNT(*) AS degree
    FROM events
    GROUP BY 1
"""


EXT5_QUERIES["degree_merge"] = q_degree_merge
EXT5_ORACLES["degree_merge"] = ORACLE_DEGREE_MERGE


def q_triple_pr_by_rel(spark, sf_dir):
    """triple_set_pr grouped by a key column (by=("obj",)): per-group
    P/R between the same two overlapping edge sets — the per-predicate
    regression diagnostic.  Ratios re-derived from exact longs with
    integer div, as in triple_pr."""
    from netbase_spark.operators.evaluate import triple_set_pr

    ev = _t(spark, sf_dir, "events")
    pr = triple_set_pr(
        _event_triples(ev, 50.0), _event_triples(ev, 20.0), by=("obj",)
    )
    return pr.select(
        "obj",
        "tp",
        "got_n",
        "expected_n",
        F.expr("tp * 1000000 div got_n").alias("precision_e6"),
        F.expr("tp * 1000000 div expected_n").alias("recall_e6"),
    )


ORACLE_TRIPLE_PR_BY_REL = """
    WITH g AS (
        SELECT DISTINCT CAST(user_id AS VARCHAR) AS subj, 1 AS rel,
               event_type AS obj
        FROM events WHERE value > 50.0
    ),
    e AS (
        SELECT DISTINCT CAST(user_id AS VARCHAR) AS subj, 1 AS rel,
               event_type AS obj
        FROM events WHERE value > 20.0
    ),
    keys AS (
        SELECT subj, rel, obj,
               MAX(CASE WHEN side = 'g' THEN 1 ELSE 0 END) AS ing,
               MAX(CASE WHEN side = 'e' THEN 1 ELSE 0 END) AS ine
        FROM (
            SELECT subj, rel, obj, 'g' AS side FROM g
            UNION ALL
            SELECT subj, rel, obj, 'e' AS side FROM e
        )
        GROUP BY subj, rel, obj
    )
    SELECT obj,
           CAST(SUM(ing * ine) AS BIGINT) AS tp,
           CAST(SUM(ing) AS BIGINT) AS got_n,
           CAST(SUM(ine) AS BIGINT) AS expected_n,
           CAST((SUM(ing * ine) * 1000000) // SUM(ing) AS BIGINT) AS precision_e6,
           CAST((SUM(ing * ine) * 1000000) // SUM(ine) AS BIGINT) AS recall_e6
    FROM keys
    GROUP BY obj
"""


EXT5_QUERIES["triple_pr_by_rel"] = q_triple_pr_by_rel
EXT5_ORACLES["triple_pr_by_rel"] = ORACLE_TRIPLE_PR_BY_REL


def _bgp_event_triples(ev):
    """Shared triple derivation for the BGP queries: rel 1 = event-type
    edges; rel 2 = value-decile edges for HIGH-value events only (>400,
    rare), so OPTIONAL genuinely leaves nulls."""
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
    return t1.unionByName(t2)


_BGP_SQL_T = """
        SELECT CAST(user_id AS VARCHAR) AS subj, 1 AS rel,
               event_type AS obj
        FROM events
        UNION ALL
        SELECT CAST(user_id AS VARCHAR) AS subj, 2 AS rel,
               CAST(CAST(floor(value / 10) AS BIGINT) AS VARCHAR) AS obj
        FROM events WHERE value > 400.0
"""


def q_bgp_optional(spark, sf_dir):
    """bgp_match with a SPARQL-OPTIONAL leg: users who clicked, with
    their high-value decile where one exists, null otherwise."""
    from netbase_spark.operators.graph_query import bgp_match

    ev = _t(spark, sf_dir, "events")
    return bgp_match(
        _bgp_event_triples(ev),
        [("?u", 1, "click")],
        optional=[("?u", 2, "?d")],
    )


ORACLE_BGP_OPTIONAL = f"""
    WITH t AS ({_BGP_SQL_T})
    SELECT DISTINCT a.subj AS u, b.obj AS d
    FROM t a
    LEFT JOIN t b ON b.rel = 2 AND b.subj = a.subj
    WHERE a.rel = 1 AND a.obj = 'click'
"""


def q_bgp_not_exists(spark, sf_dir):
    """bgp_match with a FILTER NOT EXISTS leg: users who clicked but
    have NO high-value decile edge."""
    from netbase_spark.operators.graph_query import bgp_match

    ev = _t(spark, sf_dir, "events")
    return bgp_match(
        _bgp_event_triples(ev),
        [("?u", 1, "click")],
        not_exists=[("?u", 2, "?d")],
    )


ORACLE_BGP_NOT_EXISTS = f"""
    WITH t AS ({_BGP_SQL_T})
    SELECT DISTINCT a.subj AS u
    FROM t a
    WHERE a.rel = 1 AND a.obj = 'click'
      AND NOT EXISTS (
          SELECT 1 FROM t b WHERE b.rel = 2 AND b.subj = a.subj
      )
"""


EXT5_QUERIES["bgp_optional"] = q_bgp_optional
EXT5_QUERIES["bgp_not_exists"] = q_bgp_not_exists
EXT5_ORACLES["bgp_optional"] = ORACLE_BGP_OPTIONAL
EXT5_ORACLES["bgp_not_exists"] = ORACLE_BGP_NOT_EXISTS
