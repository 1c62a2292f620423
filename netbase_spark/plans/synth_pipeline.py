"""In-memory KG construction over the synthetic interleaved corpus —
used by the entry contract (rows-only query), the P/R tests, and the
bench throughput job (triples/sec at two parallelism levels)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def materialize_corpus(
    spark: SparkSession, n_docs: int, seed: int = 42,
    partitions: int | None = None, path: str | None = None,
) -> str:
    """Write the synthetic corpus to parquet once (idempotent per
    (n_docs, seed)) and return the path.  The input contract is an
    Iceberg-style TABLE of documents — corpus synthesis is test
    scaffolding, not a construction stage, so benchmarks read from here
    instead of regenerating docs through Arrow on every run."""
    import os

    from netbase_spark.data.synth import docs_df

    # file count is part of the cache key: the fixed layout must not
    # silently come from whichever partitioning wrote the table first
    path = path or f"/tmp/netbase_corpus/docs_{n_docs}_{seed}_{partitions or 'auto'}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        docs_df(spark, n_docs, seed=seed, partitions=partitions).write.mode(
            "overwrite"
        ).parquet(path)
    return path


def construct(spark: SparkSession, n_docs: int, seed: int = 42,
              partitions: int | None = None) -> DataFrame:
    """Synthesize docs in-flight and run the full construction (tests);
    benchmarks use materialize_corpus + construct_from instead."""
    from netbase_spark.data.synth import docs_df

    return construct_from(
        spark, docs_df(spark, n_docs, seed=seed, partitions=partitions)
    )


def construct_from(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Run the full construction over a docs DataFrame (the input_hint
    table shape); returns the canonical triple DataFrame (no writes —
    callers persist/count)."""
    from netbase_spark.data.fixtures import (
        blacklist_fixture,
        labels_spark_df,
        synonym_spark_df,
    )
    from netbase_spark.operators.canonicalize import (
        connected_components,
        rewrite_triples,
        sameas_edges,
    )
    from netbase_spark.operators.extraction import (
        alias_instance_edges,
        dissect_triples,
    )
    from netbase_spark.operators.gazetteer import build_alias_table
    from netbase_spark.operators.mentions import scan_mention_triples_gated

    labels_df = labels_spark_df(spark)
    aliases = build_alias_table(labels_df, with_seo=False)
    # sameAs-class merge edges come from the LABEL side only (dissect
    # rules + synonym fixtures); the doc side emits MENTIONED_IN edges
    # exclusively.  So candidate selection AND canonicalization both
    # resolve before any document is read: compose alias -> rank-1
    # entity -> canonical rep into one broadcast map and run the
    # 10^12-doc side through a single fused mapInPandas — no join, no
    # shuffle, no corpus-sized materialization anywhere on the doc side.
    # localCheckpoint, not persist: label_side is dimension-sized and
    # read by three consumers (CC edges, alias map, rewrite); checkpoint
    # blocks are freed by the context cleaner when the result is
    # dropped, while a bare persist() stays registered in the SQL cache
    # manager for the session lifetime (repeated construct_from calls
    # would stack orphaned caches)
    label_side = (
        dissect_triples(labels_df)
        .unionByName(alias_instance_edges(labels_df))
        .unionByName(synonym_spark_df(spark))
        .localCheckpoint()
    )
    mapping = connected_components(sameas_edges(label_side))
    # size-gated (plans/broadcast_gate): broadcast-dict fast path under
    # the cap, probe-key shuffle join above it
    mention_triples = scan_mention_triples_gated(
        docs, aliases, mapping, blacklist_fixture()
    )
    return mention_triples.unionByName(rewrite_triples(label_side, mapping))
