"""Entity canonicalization: union-find connected components at scale.

Reference: ``mergeNode`` splices one node's statements into another and
rewrites ids (src/netbase.cpp:2610-2638); merge inputs are sameAs-class
edges — Synonym -32, Label -38/Labeled -39, P460, redirects
(SURVEY.md §2.4).

Spark-first: iterative min-label propagation with pointer jumping
(path doubling) — converges in O(log diameter) rounds; each round is
one shuffle on the node key.  Every iteration is ``localCheckpoint``ed
to cut the lineage (driver-loop iteration is the documented pattern for
Catalyst, which has no recursion).  The representative is the
lexicographic MIN key of the component — deterministic, and expressible
as a recursive CTE for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, max_iter: int = 25) -> DataFrame:
    """edges(src, dst) undirected -> mapping(node, rep) for non-trivial
    components only (node != rep)."""
    sym = (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .union(edges.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    # start: rep = min(self, direct neighbors)
    mapping = (
        sym.groupBy("a")
        .agg(F.least(F.min("b"), F.first("a")).alias("rep"))
        .select(F.col("a").alias("node"), "rep")
        .localCheckpoint()
    )

    for _ in range(max_iter):
        # neighbor-min propagation: candidate rep via any neighbor's rep
        nbr = (
            sym.join(mapping, sym["b"] == mapping["node"])
            .select(F.col("a").alias("node"), "rep")
        )
        merged = (
            mapping.unionByName(nbr)
            .groupBy("node")
            .agg(F.min("rep").alias("rep"))
        )
        # pointer jumping: rep := rep(rep)
        m2 = merged.select(F.col("node").alias("n2"), F.col("rep").alias("rep2"))
        jumped = (
            merged.join(m2, merged["rep"] == m2["n2"], "left")
            .select("node", F.coalesce("rep2", "rep").alias("rep"))
            .localCheckpoint()
        )
        changed = (
            jumped.alias("j")
            .join(mapping.alias("m"), "node")
            .where(F.col("j.rep") != F.col("m.rep"))
            .limit(1)
            .count()
        )
        mapping = jumped
        if changed == 0:
            break

    return mapping.where(F.col("node") != F.col("rep"))


def sameas_edges(triples: DataFrame) -> DataFrame:
    """Extract merge edges from a triple set (sameAs-class relations)."""
    from netbase_spark.relations import SAMEAS_CLASS_RELS

    return triples.where(F.col("rel").isin(list(SAMEAS_CLASS_RELS))).select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )


def rewrite_triples(triples: DataFrame, mapping: DataFrame) -> DataFrame:
    """Rewrite subj/obj through the canonical map, drop self-loops and
    merge-class edges, dedupe — mergeNode at scale (three-join rewrite
    per SURVEY.md §2.4).  The mapping side is broadcast: components are
    tiny relative to the triple set."""
    from netbase_spark.relations import SAMEAS_CLASS_RELS

    m_s = F.broadcast(mapping.select(F.col("node").alias("subj"), F.col("rep").alias("s_rep")))
    m_o = F.broadcast(mapping.select(F.col("node").alias("obj"), F.col("rep").alias("o_rep")))
    return (
        triples.where(~F.col("rel").isin(list(SAMEAS_CLASS_RELS)))
        .join(m_s, "subj", "left")
        .join(m_o, "obj", "left")
        .select(
            F.coalesce("s_rep", "subj").alias("subj"),
            "rel",
            F.coalesce("o_rep", "obj").alias("obj"),
            "rule",
            "doc_id",
        )
        .where(F.col("subj") != F.col("obj"))
        .dropDuplicates(["subj", "rel", "obj"])
    )
