"""In-memory KG construction over the synthetic interleaved corpus —
used by the entry contract (rows-only query), the P/R tests, and the
bench throughput job (triples/sec at two parallelism levels)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def construct(spark: SparkSession, n_docs: int, seed: int = 42,
              partitions: int | None = None) -> DataFrame:
    """Synthesize docs and run the full construction; returns the
    canonical triple DataFrame (no writes — callers persist/count)."""
    from netbase_spark.data.fixtures import (
        blacklist_fixture,
        labels_fixture,
        raw_synonym_edges,
    )
    from netbase_spark.data.synth import docs_df
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
    from netbase_spark.operators.linking import link_mentions
    from netbase_spark.operators.mentions import detect_mentions
    from netbase_spark.schemas import LABELS_SCHEMA

    labels = labels_fixture()
    labels_df = spark.createDataFrame(
        [(r["key"], r["label"], r["label_type"], r["lang"]) for r in labels],
        LABELS_SCHEMA,
    )
    docs = docs_df(spark, n_docs, seed=seed, partitions=partitions)
    # aliases is read twice (name collect + the link join) — persist, or
    # the window/groupBy chain re-executes inside the raw-union plan
    aliases = build_alias_table(labels_df, with_seo=False).persist()
    alias_names = [
        r["name_norm"] for r in aliases.select("name_norm").distinct().collect()
    ]
    mentions = detect_mentions(docs, alias_names, blacklist_fixture())
    raw = (
        link_mentions(mentions, aliases)
        .unionByName(dissect_triples(labels_df))
        .unionByName(alias_instance_edges(labels_df))
        .unionByName(
            spark.createDataFrame(
                [(s, r, o, "raw", None) for s, r, o in raw_synonym_edges()],
                "subj string, rel int, obj string, rule string, doc_id string",
            )
        )
    )
    # raw is consumed by sameas_edges/CC AND the final rewrite — persist
    # eagerly (a lazy persist under CC's limit() probe only caches the
    # partitions the probe touches; the rest would re-run the scan chain)
    raw = raw.persist()
    raw.count()
    mapping = connected_components(sameas_edges(raw))
    return rewrite_triples(raw, mapping)
