"""Relational query operators over the triple/adjacency tables.

Reference analogs: ``findStatement`` pattern scan with inverse-pair and
symmetric rewrites (src/netbase.cpp:1649-1788); ``getClass`` fallback
chain (src/query.cpp:2148-2169); BFS ``findPath``/``getFurthest``
(src/query.cpp:1737-1790, 1511-1564); set ops ``mergeVectors`` /
``intersect`` / ``exclude`` (src/util.cpp:667-681, 467-481;
src/query.cpp:604-610); paging ``start/page/hitsPerPage``
(src/netbase.hpp:253-271).

Spark-first: a triple pattern is a filter on the predicate-partitioned
triple table (partition pruning does the index work of the reference's
three intrusive statement chains); the inverse rewrite is a UNION of a
second pruned filter, not a scan; BFS is a driver loop of broadcast-able
frontier joins with localCheckpoint per level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from netbase_spark.relations import (
    ANTONYM,
    INSTANCE,
    SUB_CLASS,
    SUPER_CLASS,
    SYNONYM,
    TYPE,
)

# inverse predicate pairs (src/netbase.cpp:1734-1762): matching
# (s, Instance, o) must also surface as (o, Type, s) and vice versa
INVERSE_PAIRS = {
    INSTANCE: TYPE,
    TYPE: INSTANCE,
    SUB_CLASS: SUPER_CLASS,
    SUPER_CLASS: SUB_CLASS,
}
SYMMETRIC_RELS = (SYNONYM, ANTONYM)


def find_statements(
    triples: DataFrame,
    subj: str | None = None,
    rel: int | None = None,
    obj: str | None = None,
    symmetric: bool = True,
    limit: int | None = None,
) -> DataFrame:
    """Triple-pattern match with wildcard terms (None = Any) and the
    reference's reverse-direction semantics.  Returns (subj, rel, obj)
    in query orientation (reverse matches come back flipped, like the
    reference's symmetric result handling)."""

    def base(df, s, r, o):
        out = df
        if s is not None:
            out = out.where(F.col("subj") == s)
        if r is not None:
            out = out.where(F.col("rel") == r)
        if o is not None:
            out = out.where(F.col("obj") == o)
        return out.select("subj", "rel", "obj")

    result = base(triples, subj, rel, obj)
    if rel in INVERSE_PAIRS:
        inv = base(triples, obj, INVERSE_PAIRS[rel], subj).select(
            F.col("obj").alias("subj"),
            F.lit(rel).alias("rel"),
            F.col("subj").alias("obj"),
        )
        result = result.unionByName(inv)
    if symmetric and rel in SYMMETRIC_RELS:
        rev = base(triples, obj, rel, subj).select(
            F.col("obj").alias("subj"), "rel", F.col("subj").alias("obj")
        )
        result = result.unionByName(rev)
    result = result.dropDuplicates(["subj", "rel", "obj"])
    if limit:
        result = result.limit(limit)
    return result


def class_of(nodes: DataFrame, triples: DataFrame, rel_priority: list[int]) -> DataFrame:
    """``getClass`` fallback chain: first matching relation in
    ``rel_priority`` wins; min(obj) breaks ties deterministically.
    One aggregation, no N-way left-join chain."""
    cands = (
        nodes.join(triples, nodes["node"] == triples["subj"])
        .where(F.col("rel").isin(rel_priority))
        .select("node", "rel", "obj")
    )
    # priority = index in rel_priority (map literal, evaluated JVM-side)
    prio = F.create_map(
        *[F.lit(x) for i, r in enumerate(rel_priority) for x in (r, i)]
    )[F.col("rel")]
    best = (
        cands.withColumn("prio", prio)
        .groupBy("node")
        .agg(F.min(F.struct("prio", "obj")).alias("b"))
        .select("node", F.col("b.obj").alias("class"))
    )
    return nodes.join(best, "node", "left").select(
        "node", F.coalesce("class", F.lit("Entity")).alias("class")
    )


def bfs_distances(
    edges: DataFrame,
    sources: DataFrame,
    max_depth: int = 10,
) -> DataFrame:
    """Multi-source BFS: edges(src, dst), sources(node) ->
    (node, root, depth) minimal hop count from each source.

    Driver loop of frontier joins (Catalyst has no recursion); each
    level persists + materializes, superseded levels unpersist (bounded
    executor memory over long traversals).  ``getFurthest``/``findPath``
    are wrappers over these distances.
    """
    from netbase_spark.operators.canonicalize import _pin, _unpin

    visited = _pin(
        sources.select(
            F.col("node"), F.col("node").alias("root"), F.lit(0).alias("depth")
        )
    )
    frontier = visited
    for d in range(1, max_depth + 1):
        nxt = _pin(
            frontier.join(edges, frontier["node"] == edges["src"])
            .select(F.col("dst").alias("node"), "root", F.lit(d).alias("depth"))
            .join(visited.select("node", "root"), ["node", "root"], "left_anti")
            .dropDuplicates(["node", "root"])
        )
        if nxt.isEmpty():
            _unpin(nxt)
            break
        new_visited = _pin(visited.unionByName(nxt))
        if frontier is not visited:
            _unpin(frontier)
        _unpin(visited)
        visited = new_visited
        frontier = nxt
    return visited


def shortest_path_length(
    edges: DataFrame, src: str, dst: str, max_depth: int = 10
) -> int | None:
    """``findPath`` hop count between two nodes, None if unreachable."""
    spark = edges.sparkSession
    sources = spark.createDataFrame([(src,)], "node string")
    hit = (
        bfs_distances(edges, sources, max_depth)
        .where(F.col("node") == dst)
        .agg(F.min("depth"))
        .collect()[0][0]
    )
    return None if hit is None else int(hit)


def topic_of(
    nodes: DataFrame,
    edges: DataFrame,
    stop: tuple[str, ...] = (),
    drop: tuple[str, ...] = (),
    max_depth: int = 10,
) -> DataFrame:
    """``getTopic``/``getFurthest`` with hub guards (src/query.cpp:
    2171-2179, 1511-1564): BFS upward to the furthest ancestor, never
    entering DROP-listed hub classes (``filterWikiType``) and halting at
    STOP-listed good classes (``stopAtGoodWiki``).  Returns
    (node, topic).  The guard lists are exactly the reference's manual
    answer to hub-entity skew — broadcast into the join filters here.
    """
    from netbase_spark.operators.canonicalize import _pin, _unpin

    e = edges.select(F.col("src"), F.col("dst"))
    if drop:
        e = e.where(~F.col("dst").isin(list(drop)))
    cur = _pin(
        nodes.select(
            F.col("node").alias("start"), F.col("node").alias("cur"),
            F.lit(0).alias("depth"),
        )
    )
    seen = cur
    frontier = cur
    for d in range(1, max_depth + 1):
        probe = frontier
        if stop:
            probe = probe.where(~F.col("cur").isin(list(stop)))
        nxt = _pin(
            probe.join(e, probe["cur"] == e["src"])
            .select("start", F.col("dst").alias("cur"), F.lit(d).alias("depth"))
            .dropDuplicates(["start", "cur"])
        )
        if nxt.isEmpty():
            _unpin(nxt)
            break
        new_seen = _pin(seen.unionByName(nxt))
        if frontier is not seen:
            _unpin(frontier)
        _unpin(seen)
        seen = new_seen
        frontier = nxt
    from pyspark.sql import Window

    w = Window.partitionBy("start").orderBy(F.col("depth").desc(), F.col("cur").asc())
    return (
        seen.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(F.col("start").alias("node"), F.col("cur").alias("topic"))
    )


def merge_vectors(a: DataFrame, b: DataFrame) -> DataFrame:
    """Dedup union (``mergeVectors``)."""
    return a.unionByName(b).distinct()


def intersect_nodes(a: DataFrame, b: DataFrame) -> DataFrame:
    return a.intersect(b)


def exclude_nodes(a: DataFrame, b: DataFrame) -> DataFrame:
    """NOT filter (``exclude``) — anti-join, preserving duplicates on the
    left like the reference's vector filtering."""
    return a.join(b, list(b.columns), "left_anti")


def page(df: DataFrame, order_cols: list, start: int, hits_per_page: int) -> DataFrame:
    """Deterministic paging: global sort + offset/limit
    (``q.start/hitsPerPage``).  Spark 3.4+ offset is a real operator —
    the sort is the only shuffle."""
    return df.orderBy(*order_cols).offset(start).limit(hits_per_page)
