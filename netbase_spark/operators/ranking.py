"""Batched prior x context-similarity ranking for entity-link candidates.

The reference resolves an ambiguous surface form with ``getThe`` alone —
prior / first-Instance order (src/netbase.cpp:2276-2341).  At corpus
scale that prior is composed with DOCUMENT-CONTEXT coherence: a
candidate entity that is graph-adjacent to the other entities mentioned
in the same document outranks a higher-prior but unrelated candidate
(the north-star "score entity-link candidates with batched
prior x context-similarity ranking").

score(doc, alias, entity) = prior * (1 + coherence), where coherence is
the number of DISTINCT context entities (the rank-1 ``getThe`` link of
every OTHER alias detected in the same document) adjacent to the
candidate in the relatedness graph.  Winner per (doc, alias): score
desc, entity key asc — so with a degenerate graph the ranking collapses
exactly to ``getThe``.

Spark-first shape, sized for the 10^12-doc corpus:
- gazetteer (full candidate table, rank-1 context map) and relatedness
  graph are dimension-bounded -> broadcast; the candidate and neighbor
  expansions are map-side only.
- the corpus side pays one doc_id-keyed shuffle (the context join) and
  two map-side-combinable hash aggregations (countDistinct per
  candidate, min_by per mention); no corpus-sized window, no driver
  collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# default per-entity neighbor cap for the candidate x neighbor
# expansion: one Q5-class hub with 10^6+ neighbors would otherwise
# multiply every mention of every hub-adjacent candidate by the hub's
# degree.  The reference's own answer to hub noise is a drop-list
# (filterWikiType, src/query.cpp:1632-1734); trimming to a
# deterministic top-k keeps bounded coherence signal instead of
# dropping it entirely.
DEFAULT_MAX_NEIGHBOR_DEGREE = 10_000


def relatedness_neighbors(edges: DataFrame) -> DataFrame:
    """Undirected (entity, nbr) pairs from an edge list (src, dst)."""
    fwd = edges.select(F.col("src").alias("entity"), F.col("dst").alias("nbr"))
    rev = edges.select(F.col("dst").alias("entity"), F.col("src").alias("nbr"))
    return fwd.unionByName(rev).dropDuplicates(["entity", "nbr"])


def cap_neighbor_degree(nbrs: DataFrame, k: int) -> DataFrame:
    """Keep at most ``k`` neighbors per entity — the DETERMINISTIC
    first-k by neighbor key (layout-independent), so hub entities
    contribute bounded, reproducible coherence instead of a
    degree-proportional row explosion.  One dimension-side shuffle
    (entity-keyed window); the graph side is never corpus-sized."""
    from pyspark.sql import Window

    w = Window.partitionBy("entity").orderBy("nbr")
    return (
        nbrs.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def rank_link_candidates(
    mentions: DataFrame,
    aliases: DataFrame,
    edges: DataFrame,
    max_neighbor_degree: int | None = DEFAULT_MAX_NEIGHBOR_DEGREE,
    cap_bytes: int | None = None,
) -> DataFrame:
    """Rank every candidate entity of every mention by
    prior x (1 + context coherence); return the winner per mention.

    mentions: (doc_id, alias_key), distinct per doc (the scan's
        ``distinct_per_doc`` output).
    aliases:  full alias table (name_norm, key, prior) — ALL candidates
        per surface form, not the rank-1 row.
    edges:    (src, dst) entity-relatedness edges (graph side).

    Returns (doc_id, alias_key, entity, prior, coh, score); score is
    exact integer arithmetic (BIGINT) so engine/oracle hashes agree.

    ``max_neighbor_degree`` trims each entity's relatedness neighbors
    to a deterministic first-k (:func:`cap_neighbor_degree`) before the
    candidate x neighbor expansion — the hub-skew guard (None
    disables).  ``cap_bytes`` feeds the broadcast size gate: every
    dimension side here (candidates, rank-1 context map, trimmed
    graph) broadcasts only under the cap and otherwise shuffle-joins
    (plans/broadcast_gate; AQE re-promotes runtime-small sides).
    """
    from netbase_spark.plans.broadcast_gate import gated_broadcast
    # ONE persisted projection of the gazetteer feeds both broadcasts:
    # each broadcast exchange runs as its own job, and without the cache
    # each job re-executed the full alias-table lineage (build + prior
    # window) — event-log audit showed the alias build running 3-4x per
    # invocation, ~2/3 of the operator's wall time.  Dimension-bounded
    # (it IS the broadcast side), so the cache is safe at scale.
    cand = aliases.select(
        F.col("name_norm").alias("alias_key"),
        F.col("key").alias("entity"),
        F.col("prior").cast("long").alias("prior"),
    ).persist()
    cand_side = gated_broadcast(cand, cap_bytes)
    # rank-1 context map derived from the SAME cached projection:
    # min_by over (prior desc, key asc) == best_entity_per_alias's
    # window rank-1 (operators/gazetteer.py:92), without re-running
    # the alias lineage through a second Exchange + Window.
    ctx_map = gated_broadcast(
        cand.groupBy(F.col("alias_key").alias("ctx_alias")).agg(
            F.min_by(
                "entity",
                F.struct(
                    (-F.col("prior")).alias("neg_prior"),
                    F.col("entity").alias("ent"),
                ),
            ).alias("ctx_entity")
        ),
        cap_bytes,
    )
    nbr_rows = relatedness_neighbors(edges)
    if max_neighbor_degree is not None:
        nbr_rows = cap_neighbor_degree(nbr_rows, max_neighbor_degree)
    nbrs = gated_broadcast(nbr_rows, cap_bytes)

    # persist: the mention table feeds TWO legs (candidate expansion and
    # document context), and upstream it is usually the mention-scan UDF —
    # without a cache the scan recomputes once per leg.  Mention-sized
    # (bounded by matches, not the corpus), so safe to cache at scale.
    m = mentions.select("doc_id", "alias_key").persist()
    # context = rank-1 entity of every alias in the doc (map-side join)
    ctx = m.select(F.col("doc_id").alias("c_doc"), F.col("alias_key").alias("ctx_alias")).join(
        ctx_map, "ctx_alias"
    )
    # candidate x neighbor expansion, both map-side (degree-bounded fanout)
    expanded = (
        m.join(cand_side, "alias_key")
        .join(nbrs, "entity", "left")
    )
    # one corpus shuffle: match candidate neighbors against same-doc
    # context entities contributed by OTHER aliases
    hits = expanded.join(
        ctx,
        (expanded["doc_id"] == ctx["c_doc"])
        & (expanded["nbr"] == ctx["ctx_entity"])
        & (ctx["ctx_alias"] != expanded["alias_key"]),
        "left",
    )
    scored = (
        hits.groupBy("doc_id", "alias_key", "entity", "prior")
        .agg(F.countDistinct("ctx_entity").alias("coh"))
        .withColumn("score", F.col("prior") * (F.lit(1).cast("long") + F.col("coh")))
    )
    # argmax with deterministic tie-break (score desc, entity asc) as a
    # partial-aggregable min_by over an orderable struct — no window
    winner = scored.groupBy("doc_id", "alias_key").agg(
        F.min_by(
            F.struct("entity", "prior", "coh", "score"),
            F.struct((-F.col("score")).alias("neg_score"), F.col("entity").alias("ent")),
        ).alias("w")
    )
    return winner.select(
        "doc_id",
        "alias_key",
        F.col("w.entity").alias("entity"),
        F.col("w.prior").alias("prior"),
        F.col("w.coh").alias("coh"),
        F.col("w.score").alias("score"),
    )
