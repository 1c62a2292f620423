"""Triple-set evaluation and incremental maintenance.

The north rule grades the emitted triple set at P/R >= 0.95 against the
reference and requires checkpoint-resumable construction; a deployment
needs both as OPERATORS, not offline scripts:

- :func:`triple_set_pr` — distributed precision/recall/F1 between two
  triple tables (the grading comparison itself, runnable at 100-TB
  scale where driver-side set comparison is impossible).  The
  reference's analog is its test harness comparing statement sets
  (src/tests.cpp batteries); ours is a first-class DataFrame op.
- :func:`merge_triples` — incremental upsert of a delta triple batch
  into the canonical table: new (subj, rel, obj) keys append, existing
  keys keep their first-writer provenance (the reference's
  dedup-at-insert, src/netbase.hpp:253-276, applied table-to-table).
- :func:`construct_incremental` — the batch loop: construct a new doc
  batch against prebuilt dimension artifacts and merge into the
  existing table.  Construction is per-doc independent, so incremental
  == full rebuild on the doc union (property-tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TRIPLE_KEYS = ("subj", "rel", "obj")


def triple_set_pr(
    got: DataFrame,
    expected: DataFrame,
    keys: tuple[str, ...] = TRIPLE_KEYS,
    by: tuple[str, ...] = (),
) -> DataFrame:
    """(tp, got_n, expected_n, precision, recall, f1) between two triple
    tables, distinct on ``keys`` — one global row, or one row per
    ``by`` group (``by`` must be a subset of ``keys``; e.g.
    ``by=("rel",)`` grades each predicate separately, the diagnostic a
    P/R regression hunt actually needs).

    ONE wide shuffle total: tag each side, union, groupBy the key
    (map-side partial agg collapses per-side duplicates before the
    exchange), then a singleton (or by-keyed) agg.  The key
    (subj, rel, obj) is near-unique, so no hub skew; compare with the
    naive plan (2 distincts + a join = 3 shuffles).  Ratios are rounded
    to 1e-6 so the number is engine-portable (IEEE double division of
    exact longs, then a decimal round both engines implement
    identically)."""
    if not set(by) <= set(keys):
        raise ValueError(f"by columns {by!r} must be a subset of keys {keys!r}")
    kcols = list(keys)
    g = got.select(*kcols).withColumn("g", F.lit(1)).withColumn("e", F.lit(0))
    e = expected.select(*kcols).withColumn("g", F.lit(0)).withColumn("e", F.lit(1))
    per_key = (
        g.unionByName(e)
        .groupBy(*kcols)
        .agg(F.max("g").alias("g"), F.max("e").alias("e"))
    )
    measures = [
        F.sum(F.col("g") * F.col("e")).alias("tp"),
        F.sum("g").alias("got_n"),
        F.sum("e").alias("expected_n"),
    ]
    agg = per_key.groupBy(*by).agg(*measures) if by else per_key.agg(*measures)
    # a by-group can be empty on one side; define the 0-denominator
    # ratios as 0.0 instead of NaN/null
    p = F.when(F.col("got_n") > 0, F.col("tp") / F.col("got_n")).otherwise(F.lit(0.0))
    r = F.when(F.col("expected_n") > 0, F.col("tp") / F.col("expected_n")).otherwise(
        F.lit(0.0)
    )
    return agg.select(
        *by,
        F.col("tp").cast("long").alias("tp"),
        F.col("got_n").cast("long").alias("got_n"),
        F.col("expected_n").cast("long").alias("expected_n"),
        F.round(p, 6).alias("precision"),
        F.round(r, 6).alias("recall"),
        # tp=0 makes p+r zero; define f1=0.0 instead of NaN
        F.when(p + r > 0, F.round(2 * p * r / (p + r), 6))
        .otherwise(F.lit(0.0))
        .alias("f1"),
    )


def fresh_triples(
    existing: DataFrame,
    delta: DataFrame,
    keys: tuple[str, ...] = TRIPLE_KEYS,
    cap_bytes: int | None = None,
) -> DataFrame:
    """The delta rows whose key is NOT already in ``existing``, deduped
    within the delta by the deterministic min of the non-key columns —
    the append half of :func:`merge_triples`, exposed separately so an
    append-only sink (streaming/construct.py) can write just these.

    Shuffle shape is sized for "existing is the 100-TB table, delta is
    a batch": the delta's distinct keys ride a size-gated broadcast
    (plans/broadcast_gate) into a SEMI join against existing — existing
    is scanned, never shuffled — producing the (small, <= delta-sized)
    dup-key set, which then anti-joins the delta map-side.  Above the
    cap both joins degrade to shuffle joins via the gate."""
    from netbase_spark.plans.broadcast_gate import gated_broadcast

    kcols = list(keys)
    rest = [c for c in delta.columns if c not in keys]
    # deterministic within-delta dedup: min over the remaining columns
    if rest:
        d = (
            delta.groupBy(*kcols)
            .agg(F.min(F.struct(*rest)).alias("_r"))
            .select(*kcols, *[F.col(f"_r.{c}").alias(c) for c in rest])
        )
    else:
        d = delta.dropDuplicates(kcols)
    dkeys = gated_broadcast(d.select(*kcols).distinct(), cap_bytes)
    dup_keys = existing.select(*kcols).join(dkeys, kcols, "left_semi")
    return d.join(gated_broadcast(dup_keys, cap_bytes), kcols, "left_anti")


def merge_triples(
    existing: DataFrame,
    delta: DataFrame,
    keys: tuple[str, ...] = TRIPLE_KEYS,
    cap_bytes: int | None = None,
) -> DataFrame:
    """Upsert ``delta`` into ``existing``: keys already present keep the
    EXISTING row (first-writer provenance — the reference's
    dedup-at-insert keeps the stored statement, src/netbase.hpp:253);
    fresh keys append, deduped within the delta by the deterministic
    min of the non-key columns.  See :func:`fresh_triples` for the
    join shape; the output union is partition-layout-preserving on the
    existing side, so a table bucketed/partitioned by key can append
    the delta without rewriting history."""
    fresh = fresh_triples(existing, delta, keys, cap_bytes)
    return existing.unionByName(fresh.select(*existing.columns))


def merge_counts(
    existing: DataFrame,
    delta: DataFrame,
    keys: tuple[str, ...],
    count_col: str,
    cap_bytes: int | None = None,
) -> DataFrame:
    """Incremental additive-aggregate maintenance: ``existing`` is a
    materialized count table (key -> count), ``delta`` is raw rows to
    count in; returns the updated table without re-aggregating history.

    The reference keeps ``statementCount`` live per node as statements
    insert (src/util.cpp:918-929, src/netbase.hpp:145); the distributed
    analog must not re-scan the 100-TB fact table per batch.  Shape:
    aggregate the delta (small), LEFT-join it onto existing via a
    size-gated broadcast — existing is scanned, never shuffled — adding
    counts where keys match; the delta's genuinely-new keys are found
    with the same broadcast semi/anti trick as :func:`fresh_triples`
    and appended.  Degree maintenance for the adjacency pipeline is
    ``merge_counts(degrees, fresh_adjacency, ("node",), "degree")``."""
    from netbase_spark.plans.broadcast_gate import gated_broadcast

    kcols = list(keys)
    dc = delta.groupBy(*kcols).agg(F.count(F.lit(1)).alias("_d"))
    updated = (
        existing.join(gated_broadcast(dc, cap_bytes), kcols, "left")
        .select(
            *kcols,
            (F.col(count_col) + F.coalesce(F.col("_d"), F.lit(0))).alias(count_col),
        )
    )
    dup_keys = existing.select(*kcols).join(
        gated_broadcast(dc.select(*kcols), cap_bytes), kcols, "left_semi"
    )
    new_rows = dc.join(gated_broadcast(dup_keys, cap_bytes), kcols, "left_anti")
    return updated.unionByName(
        new_rows.select(*kcols, F.col("_d").alias(count_col))
    )


def apply_count_delta(
    existing: DataFrame,
    removed: DataFrame,
    added: DataFrame,
    keys: tuple[str, ...],
    count_col: str,
    cap_bytes: int | None = None,
) -> DataFrame:
    """Maintain a materialized count table through a REMOVE+ADD delta —
    the companion of :func:`merge_counts` (append-only) for operations
    that MOVE rows between keys, e.g. a canonical-map merge rewriting
    touched triples (``recanonicalize_delta``): the merged-away node's
    counts must transfer to its representative without re-aggregating
    the 100-TB fact table.

    ``removed``/``added`` are the raw rows leaving/entering the fact
    table (delta-sized).  Shape: aggregate both deltas small, FULL-join
    them into one net delta per key, LEFT-join it onto ``existing`` via
    a size-gated broadcast — existing is scanned, never shuffled — and
    append the genuinely-new keys.  Keys whose count reaches zero drop
    out (the reference frees merged nodes, src/netbase.cpp:2610-2638).
    Oracle: a full recount over (all - removed + added) — the
    ``count_delta`` contract query."""
    from netbase_spark.plans.broadcast_gate import gated_broadcast

    kcols = list(keys)
    rem = removed.groupBy(*kcols).agg((-F.count(F.lit(1))).alias("_d"))
    add = added.groupBy(*kcols).agg(F.count(F.lit(1)).alias("_d"))
    # materialize the net delta ONCE: it feeds three joins below, and
    # re-running the union+groupBy (plus a broadcast size probe each
    # time) would triple the delta aggregation
    net = (
        rem.unionByName(add)
        .groupBy(*kcols)
        .agg(F.sum("_d").alias("_d"))
        .where(F.col("_d") != 0)
        .localCheckpoint()
    )
    net_b = gated_broadcast(net, cap_bytes)
    updated = (
        existing.join(net_b, kcols, "left")
        .select(
            *kcols,
            (F.col(count_col) + F.coalesce(F.col("_d"), F.lit(0))).alias(count_col),
        )
        .where(F.col(count_col) > 0)
    )
    dup_keys = existing.select(*kcols).join(net_b.select(*kcols), kcols, "left_semi")
    new_rows = (
        net.join(gated_broadcast(dup_keys, cap_bytes), kcols, "left_anti")
        .where(F.col("_d") > 0)
    )
    return updated.unionByName(
        new_rows.select(*kcols, F.col("_d").alias(count_col))
    )


def construct_incremental(
    spark,
    existing: DataFrame,
    new_docs: DataFrame,
    artifacts=None,
) -> DataFrame:
    """One incremental step of the construction batch loop: scan a new
    doc batch against the prebuilt dimension artifacts
    (plans/synth_pipeline.build_artifacts) and merge the resulting
    canonical triples into the existing table.  Per-doc independence of
    the scan makes this EXACTLY equal to a full rebuild over the doc
    union (tests/test_incremental.py); mention keys can't collide
    across batches (obj = doc_id), so the merge work is label-side +
    cross-batch dedup only."""
    from netbase_spark.plans.synth_pipeline import construct_from

    batch = construct_from(spark, new_docs, artifacts)
    return merge_triples(existing, batch)
